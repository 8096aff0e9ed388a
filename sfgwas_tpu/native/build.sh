#!/bin/sh
# Build the native libraries (invoked automatically on first use by
# parallel/native_transport.py and ops/native_ring.py).
cd "$(dirname "$0")"
[ transport.cpp -nt libsfgtransport.so ] 2>/dev/null || [ ! -f libsfgtransport.so ] && \
  g++ -O2 -fPIC -shared -o libsfgtransport.so transport.cpp
[ ring.cpp -nt libsfgring.so ] 2>/dev/null || [ ! -f libsfgring.so ] && \
  g++ -O3 -fPIC -shared -fopenmp -o libsfgring.so ring.cpp
exit 0

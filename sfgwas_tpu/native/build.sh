#!/bin/sh
# Build the native transport library (invoked automatically by
# parallel/native_transport.py on first use).
cd "$(dirname "$0")"
g++ -O2 -fPIC -shared -o libsfgtransport.so transport.cpp

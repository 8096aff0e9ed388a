// Native TCP transport primitives for the party mesh.
//
// The reference's runtime networking is native (Go's runtime sockets,
// mpc/netconnect.go); the Python layer here delegates blocking socket IO to
// this small C++ library via ctypes so sends/receives run without the GIL
// and large ciphertext/share buffers move with single syscalls.
//
// API (C linkage, used by parallel/transport.py):
//   int  sfg_listen(int port, const char* bind_ip)        -> listen fd
//   int  sfg_accept(int listen_fd)                        -> conn fd
//   int  sfg_connect(const char* host, int port, int retries, int delay_ms)
//   int  sfg_send_frame(int fd, const uint8_t* buf, int64_t len)
//   int64_t sfg_recv_frame_len(int fd)                    -> next frame size
//   int  sfg_recv_frame_body(int fd, uint8_t* buf, int64_t len)
//   void sfg_close(int fd)

#include <arpa/inet.h>
#include <cerrno>
#include <cstdint>
#include <cstring>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <unistd.h>

namespace {

bool send_all(int fd, const uint8_t* buf, int64_t len) {
  while (len > 0) {
    ssize_t n = ::send(fd, buf, static_cast<size_t>(len), MSG_NOSIGNAL);
    if (n <= 0) {
      if (n < 0 && (errno == EINTR)) continue;
      return false;
    }
    buf += n;
    len -= n;
  }
  return true;
}

bool recv_all(int fd, uint8_t* buf, int64_t len) {
  while (len > 0) {
    ssize_t n = ::recv(fd, buf, static_cast<size_t>(len), 0);
    if (n <= 0) {
      if (n < 0 && (errno == EINTR)) continue;
      return false;
    }
    buf += n;
    len -= n;
  }
  return true;
}

}  // namespace

extern "C" {

int sfg_listen(int port, const char* bind_ip) {
  int fd = ::socket(AF_INET, SOCK_STREAM, 0);
  if (fd < 0) return -1;
  int one = 1;
  ::setsockopt(fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons(static_cast<uint16_t>(port));
  addr.sin_addr.s_addr =
      (bind_ip && bind_ip[0]) ? inet_addr(bind_ip) : INADDR_ANY;
  if (::bind(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0 ||
      ::listen(fd, 4) != 0) {
    ::close(fd);
    return -1;
  }
  return fd;
}

int sfg_accept(int listen_fd) {
  int fd = ::accept(listen_fd, nullptr, nullptr);
  if (fd >= 0) {
    int one = 1;
    ::setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
  }
  return fd;
}

int sfg_connect(const char* host, int port, int retries, int delay_ms) {
  for (int attempt = 0; attempt < retries; ++attempt) {
    int fd = ::socket(AF_INET, SOCK_STREAM, 0);
    if (fd < 0) return -1;
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_port = htons(static_cast<uint16_t>(port));
    addr.sin_addr.s_addr = inet_addr(host);
    if (::connect(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) == 0) {
      int one = 1;
      ::setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
      return fd;
    }
    ::close(fd);
    ::usleep(static_cast<useconds_t>(delay_ms) * 1000);
  }
  return -1;
}

int sfg_send_frame(int fd, const uint8_t* buf, int64_t len) {
  uint8_t hdr[8];
  std::memcpy(hdr, &len, 8);  // little-endian hosts
  if (!send_all(fd, hdr, 8)) return -1;
  return send_all(fd, buf, len) ? 0 : -1;
}

int64_t sfg_recv_frame_len(int fd) {
  uint8_t hdr[8];
  if (!recv_all(fd, hdr, 8)) return -1;
  int64_t len;
  std::memcpy(&len, hdr, 8);
  return len;
}

int sfg_recv_frame_body(int fd, uint8_t* buf, int64_t len) {
  return recv_all(fd, buf, len) ? 0 : -1;
}

void sfg_close(int fd) { ::close(fd); }

}  // extern "C"

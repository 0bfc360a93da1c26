// Minimal HTTP/1.1 helpers for the router (no external deps).
//
// C++ re-implementation of the role actix-web plays in the reference's Rust
// router (reference: sgl-router/src/server.rs). Thread-per-connection with
// blocking sockets: at router request rates (thousands/s) this is far below
// saturation, and it keeps bidirectional SSE streaming trivially correct.
#pragma once

#include <arpa/inet.h>
#include <netdb.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cstring>
#include <map>
#include <optional>
#include <sstream>
#include <string>

namespace router {

struct HttpRequest {
  std::string method;
  std::string path;
  std::map<std::string, std::string> headers;  // lower-cased keys
  std::string body;
};

// Reads one full HTTP request (headers + content-length body).
inline bool read_request(int fd, HttpRequest* out) {
  std::string buf;
  char tmp[8192];
  size_t header_end = std::string::npos;
  while (true) {
    ssize_t n = ::recv(fd, tmp, sizeof(tmp), 0);
    if (n <= 0) return false;
    buf.append(tmp, n);
    header_end = buf.find("\r\n\r\n");
    if (header_end != std::string::npos) break;
    if (buf.size() > (16u << 20)) return false;
  }
  std::istringstream hs(buf.substr(0, header_end));
  std::string line;
  if (!std::getline(hs, line)) return false;
  {
    std::istringstream rl(line);
    rl >> out->method >> out->path;
  }
  while (std::getline(hs, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    auto colon = line.find(':');
    if (colon == std::string::npos) continue;
    std::string k = line.substr(0, colon);
    for (auto& c : k) c = std::tolower(c);
    size_t v0 = line.find_first_not_of(" ", colon + 1);
    out->headers[k] = v0 == std::string::npos ? "" : line.substr(v0);
  }
  size_t content_len = 0;
  auto it = out->headers.find("content-length");
  if (it != out->headers.end()) content_len = std::stoul(it->second);
  out->body = buf.substr(header_end + 4);
  while (out->body.size() < content_len) {
    ssize_t n = ::recv(fd, tmp, sizeof(tmp), 0);
    if (n <= 0) return false;
    out->body.append(tmp, n);
  }
  out->body.resize(content_len);
  return true;
}

inline bool send_all(int fd, const char* data, size_t len) {
  size_t off = 0;
  while (off < len) {
    ssize_t n = ::send(fd, data + off, len - off, MSG_NOSIGNAL);
    if (n <= 0) return false;
    off += n;
  }
  return true;
}

inline bool send_all(int fd, const std::string& s) {
  return send_all(fd, s.data(), s.size());
}

inline void send_response(int fd, int status, const std::string& body,
                          const std::string& content_type = "application/json") {
  const char* reason = status == 200 ? "OK" : (status == 404 ? "Not Found" : "Error");
  std::ostringstream os;
  os << "HTTP/1.1 " << status << " " << reason << "\r\n"
     << "Content-Type: " << content_type << "\r\n"
     << "Content-Length: " << body.size() << "\r\n"
     << "Connection: close\r\n\r\n"
     << body;
  send_all(fd, os.str());
}

// Connects to host:port; returns fd or -1.
inline int connect_to(const std::string& host, int port) {
  struct addrinfo hints {};
  hints.ai_family = AF_UNSPEC;
  hints.ai_socktype = SOCK_STREAM;
  struct addrinfo* res = nullptr;
  std::string port_s = std::to_string(port);
  if (getaddrinfo(host.c_str(), port_s.c_str(), &hints, &res) != 0) return -1;
  int fd = -1;
  for (auto* p = res; p; p = p->ai_next) {
    fd = ::socket(p->ai_family, p->ai_socktype, p->ai_protocol);
    if (fd < 0) continue;
    if (::connect(fd, p->ai_addr, p->ai_addrlen) == 0) break;
    ::close(fd);
    fd = -1;
  }
  freeaddrinfo(res);
  if (fd >= 0) {
    int one = 1;
    setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
  }
  return fd;
}

// Parse "host:port" from a worker URL like "http://127.0.0.1:30000".
inline bool parse_url(const std::string& url, std::string* host, int* port) {
  std::string rest = url;
  auto scheme = rest.find("://");
  if (scheme != std::string::npos) rest = rest.substr(scheme + 3);
  auto slash = rest.find('/');
  if (slash != std::string::npos) rest = rest.substr(0, slash);
  auto colon = rest.rfind(':');
  if (colon == std::string::npos) {
    *host = rest;
    *port = 80;
  } else {
    *host = rest.substr(0, colon);
    *port = std::stoi(rest.substr(colon + 1));
  }
  return !host->empty();
}

}  // namespace router

// fludownloader — threaded download session with task pipelining (C++).
//
// Rebuild of the reference's libcurl downloader
// (libs/flu/downloader/lib/fludownloader.c) as a native component with no
// dependencies beyond system zlib: http:// via POSIX sockets (HTTP/1.1,
// chunked and content-length bodies, redirect following with a 5-hop cap,
// transparent gzip/deflate decode) and file:// via stdio. Semantics kept:
//   - one worker thread per session owning all I/O (:490-532)
//   - task queue with LOOK-AHEAD PIPELINING: the next task's request is
//     issued once the current transfer passes 75% of its content length
//     (:443-484), hiding connection setup behind the tail of the current
//     download
//   - outcome taxonomy incl. connect/resolve/HTTP/timeout errors (:18-82)
//   - pause/resume via a fluc Barrier with a 32 KiB bandwidth-discard
//     window after resume (:343-355, 786-805)
//   - connect/receive idle timeouts enforced in the receive loop (:300-312)
//   - every payload chunk feeds the global fluc bwmeter (:350)
//   - fault-injection hook: task outcome override (:912-918)
//
// C ABI for ctypes; callbacks are invoked from the worker thread (ctypes
// handles GIL acquisition on the Python side).

#include <arpa/inet.h>
#include <fcntl.h>
#include <netdb.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <poll.h>
#include <sys/socket.h>
#include <sys/stat.h>
#include <unistd.h>
#include <zlib.h>

#include <atomic>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include "../fluc/fluc_threads.hpp"
#include "flutls.hpp"

extern "C" void flu_bwmeter_data(uint64_t bytes);

namespace {

enum Outcome {
  TASK_OK = 0,
  TASK_PENDING,
  TASK_ABORTED,
  TASK_ERROR,
  TASK_COULD_NOT_CONNECT,
  TASK_CONNECTION_REFUSED,
  TASK_HTTP_ERROR,
  TASK_SEND_ERROR,
  TASK_RECV_ERROR,
  TASK_TIMEOUT,
  TASK_FILE_NOT_FOUND,
  TASK_COULD_NOT_RESOLVE_HOST,
  TASK_SSL_ERROR,
  TASK_NO_TASK,
  TASK_TOO_MANY_REDIRECTS,
  TASK_DECODE_ERROR,
};

const char* kOutcomeNames[] = {
    "OK", "PENDING", "ABORTED", "ERROR", "COULD_NOT_CONNECT",
    "CONNECTION_REFUSED", "HTTP_ERROR", "SEND_ERROR", "RECV_ERROR",
    "TIMEOUT", "FILE_NOT_FOUND", "COULD_NOT_RESOLVE_HOST", "SSL_ERROR",
    "NO_TASK", "TOO_MANY_REDIRECTS", "DECODE_ERROR"};

typedef int (*DataCb)(const void* buf, size_t size, void* user, void* task);
typedef void (*DoneCb)(int outcome, int http_status, size_t size, void* user,
                       void* task, int* cancel_remaining);

struct Session;

struct Task {
  Session* session = nullptr;
  std::string url;
  std::string range;  // "" = full, "HEAD" = head request
  void* user_data = nullptr;
  std::atomic<int> outcome{TASK_PENDING};
  std::atomic<bool> abort_requested{false};
  std::atomic<bool> outcome_forced{false};
  int http_status = 0;
  size_t downloaded = 0;
  size_t content_length = 0;
  std::string date_header;
  std::string raw_headers;

  // pipelined connection state (prepared ahead of execution)
  int sock = -1;
  bool request_sent = false;
  flutls::Conn* tls = nullptr;   // non-null for https transfers
  int ssl_status = 0;            // flutls::SslStatus (fludownloader.h:50-82)

  // transparent Content-Encoding decode (gzip/deflate) — the reference
  // advertises and decodes all encodings via CURLOPT_ACCEPT_ENCODING ""
  // (fludownloader.c:748); callers always receive identity bytes.
  z_stream zs;
  bool z_inited = false;        // inflate stream live
  bool z_first = true;          // raw-deflate retry still possible
  bool z_deflate = false;       // header said "deflate" (not gzip)
  bool z_done = false;          // Z_STREAM_END seen; drop trailing bytes

  void end_decoder() {
    if (z_inited) inflateEnd(&zs);
    z_inited = false;
  }

  bool start_decoder(bool is_deflate) {
    end_decoder();
    memset(&zs, 0, sizeof(zs));
    // 15+32: zlib auto-detects gzip vs zlib wrappers. Raw deflate (some
    // servers send it for "deflate", as curl also tolerates) is retried
    // with -15 on the first data error.
    if (inflateInit2(&zs, 15 + 32) != Z_OK) return false;
    z_inited = true;
    z_first = true;
    z_deflate = is_deflate;
    z_done = false;
    return true;
  }

  void close_transport() {
    delete tls;
    tls = nullptr;
    if (sock >= 0) close(sock);
    sock = -1;
    end_decoder();
  }
};

struct Session {
  DataCb data_cb;
  DoneCb done_cb;
  std::mutex lock;
  std::deque<Task*> queue;   // queue[0] = current
  std::thread worker;
  std::atomic<bool> running{true};
  fluc::Barrier pause_barrier{true};
  std::atomic<long> polling_period_us{0};
  std::atomic<long> connect_timeout_ms{10000};
  std::atomic<long> idle_timeout_ms{10000};
  std::string user_agent = "flutpu-downloader/1.0";
  std::string cookies;
  std::string proxy;
  std::atomic<bool> ssl_verify{true};
  std::string ca_file;  // optional CA bundle override (tests, pinning)
  fluc::Monitor wakeup;
  std::atomic<uint64_t> discard_window{0};  // post-resume bw-stat discard

  void notify() {
    wakeup.lock();
    wakeup.signal();
    wakeup.unlock();
  }
};

// ---------------------------------------------------------------------------
// transport helpers
// ---------------------------------------------------------------------------

bool parse_url(const std::string& url, std::string* scheme, std::string* host,
               int* port, std::string* path) {
  size_t p = url.find("://");
  if (p == std::string::npos) return false;
  *scheme = url.substr(0, p);
  std::string rest = url.substr(p + 3);
  if (*scheme == "file") {
    *path = rest;
    return true;
  }
  size_t slash = rest.find('/');
  std::string hostport = slash == std::string::npos ? rest
                                                    : rest.substr(0, slash);
  *path = slash == std::string::npos ? "/" : rest.substr(slash);
  size_t colon = hostport.rfind(':');
  if (colon != std::string::npos) {
    *host = hostport.substr(0, colon);
    *port = atoi(hostport.c_str() + colon + 1);
  } else {
    *host = hostport;
    *port = 80;
  }
  return true;
}

int connect_host(const std::string& host, int port, long timeout_ms,
                 int* outcome) {
  struct addrinfo hints = {};
  hints.ai_family = AF_UNSPEC;
  hints.ai_socktype = SOCK_STREAM;
  struct addrinfo* res = nullptr;
  char portstr[16];
  snprintf(portstr, sizeof(portstr), "%d", port);
  if (getaddrinfo(host.c_str(), portstr, &hints, &res) != 0 || !res) {
    *outcome = TASK_COULD_NOT_RESOLVE_HOST;
    return -1;
  }
  int fd = socket(res->ai_family, SOCK_STREAM | SOCK_NONBLOCK, 0);
  if (fd < 0) {
    freeaddrinfo(res);
    *outcome = TASK_COULD_NOT_CONNECT;
    return -1;
  }
  int rc = connect(fd, res->ai_addr, res->ai_addrlen);
  if (rc != 0 && errno == EINPROGRESS) {
    struct pollfd pfd = {fd, POLLOUT, 0};
    rc = poll(&pfd, 1, (int)timeout_ms);
    if (rc <= 0) {
      close(fd);
      freeaddrinfo(res);
      *outcome = rc == 0 ? TASK_TIMEOUT : TASK_COULD_NOT_CONNECT;
      return -1;
    }
    int err = 0;
    socklen_t len = sizeof(err);
    getsockopt(fd, SOL_SOCKET, SO_ERROR, &err, &len);
    if (err != 0) {
      close(fd);
      freeaddrinfo(res);
      *outcome = err == ECONNREFUSED ? TASK_CONNECTION_REFUSED
                                     : TASK_COULD_NOT_CONNECT;
      return -1;
    }
  } else if (rc != 0) {
    close(fd);
    freeaddrinfo(res);
    *outcome = errno == ECONNREFUSED ? TASK_CONNECTION_REFUSED
                                     : TASK_COULD_NOT_CONNECT;
    return -1;
  }
  freeaddrinfo(res);
  return fd;
}

bool send_all(int fd, const std::string& data, long timeout_ms) {
  size_t off = 0;
  while (off < data.size()) {
    struct pollfd pfd = {fd, POLLOUT, 0};
    if (poll(&pfd, 1, (int)timeout_ms) <= 0) return false;
    ssize_t n = send(fd, data.data() + off, data.size() - off, MSG_NOSIGNAL);
    if (n <= 0) return false;
    off += (size_t)n;
  }
  return true;
}

// "host:port", with optional http:// prefix (curl-style proxy string).
bool parse_proxy(const std::string& proxy, std::string* host, int* port) {
  std::string p = proxy;
  size_t scheme = p.find("://");
  if (scheme != std::string::npos) p = p.substr(scheme + 3);
  while (!p.empty() && p.back() == '/') p.pop_back();
  size_t colon = p.rfind(':');
  if (colon == std::string::npos) {
    *host = p;
    *port = 8080;
  } else {
    *host = p.substr(0, colon);
    *port = atoi(p.c_str() + colon + 1);
  }
  return !host->empty() && *port > 0;
}

// Read the proxy's reply to a CONNECT until the blank line; require 200.
bool read_connect_reply(int fd, long timeout_ms, long idle_ms) {
  std::string reply;
  long waited = 0;
  while (reply.find("\r\n\r\n") == std::string::npos) {
    struct pollfd pfd = {fd, POLLIN, 0};
    int rc = poll(&pfd, 1, (int)timeout_ms);
    if (rc == 0) {
      waited += timeout_ms;
      if (waited >= idle_ms) return false;
      continue;
    }
    if (rc < 0) return false;
    char buf[4096];
    ssize_t n = recv(fd, buf, sizeof(buf), 0);
    if (n <= 0) return false;
    reply.append(buf, (size_t)n);
    if (reply.size() > 64 * 1024) return false;
  }
  int status = 0;
  sscanf(reply.c_str(), "HTTP/%*s %d", &status);
  return status == 200;
}

// RFC 3986 5.2.4 remove_dot_segments, for absolute paths.
std::string remove_dot_segments(std::string in) {
  std::string out;
  while (!in.empty()) {
    if (in.rfind("../", 0) == 0) {
      in.erase(0, 3);
    } else if (in.rfind("./", 0) == 0) {
      in.erase(0, 2);
    } else if (in.rfind("/./", 0) == 0) {
      in.replace(0, 3, "/");
    } else if (in == "/.") {
      in = "/";
    } else if (in.rfind("/../", 0) == 0) {
      in.replace(0, 4, "/");
      size_t k = out.find_last_of('/');
      out.erase(k == std::string::npos ? 0 : k);
    } else if (in == "/..") {
      in = "/";
      size_t k = out.find_last_of('/');
      out.erase(k == std::string::npos ? 0 : k);
    } else if (in == "." || in == "..") {
      in.clear();
    } else {
      size_t k = in.find('/', 1);
      size_t n = (k == std::string::npos) ? in.size() : k;
      out += in.substr(0, n);
      in.erase(0, n);
    }
  }
  return out;
}

// Resolve a Location header value against the URL that produced it
// (RFC 3986 relative references: absolute, scheme-relative, absolute-path,
// relative-path and query-only forms, with dot-segment normalization).
// Reference behavior: CURLOPT_FOLLOWLOCATION
// (libs/flu/downloader/lib/fludownloader.c:733-734).
std::string resolve_redirect(const std::string& base, std::string loc) {
  while (!loc.empty() && (loc.front() == ' ' || loc.front() == '\t'))
    loc.erase(loc.begin());
  while (!loc.empty() && (loc.back() == ' ' || loc.back() == '\t' ||
                          loc.back() == '\r' || loc.back() == '\n'))
    loc.pop_back();
  if (loc.rfind("http://", 0) == 0 || loc.rfind("https://", 0) == 0)
    return loc;
  std::string scheme, host, path;
  int port = 80;
  if (!parse_url(base, &scheme, &host, &port, &path)) return loc;
  if (loc.rfind("//", 0) == 0) return scheme + ":" + loc;
  std::string origin = scheme + "://" + host;
  bool default_port = (scheme == "http" && port == 80) ||
                      (scheme == "https" && (port == 443 || port == 80));
  if (!default_port) origin += ":" + std::to_string(port);
  // base path without its query; the suffix of loc past the first '?'/'#'
  // is carried verbatim (dot-segment removal applies to paths only)
  std::string bpath = path.substr(0, path.find('?'));
  if (bpath.empty()) bpath = "/";
  if (!loc.empty() && (loc.front() == '?' || loc.front() == '#'))
    return origin + bpath + loc;  // query-only keeps the WHOLE base path
  size_t q = loc.find_first_of("?#");
  std::string lpath = loc.substr(0, q);
  std::string suffix = (q == std::string::npos) ? "" : loc.substr(q);
  if (!lpath.empty() && lpath.front() == '/')
    return origin + remove_dot_segments(lpath) + suffix;
  std::string dir = bpath.substr(0, bpath.find_last_of('/') + 1);
  if (dir.empty()) dir = "/";
  return origin + remove_dot_segments(dir + lpath) + suffix;
}

bool prepare_http(Session* s, Task* t, int* outcome) {
  std::string scheme, host, path;
  int port = 80;
  if (!parse_url(t->url, &scheme, &host, &port, &path)) {
    *outcome = TASK_ERROR;
    return false;
  }
  bool https = scheme == "https";
  if (https) {
    if (port == 80) port = 443;
    if (!flutls::available()) {
      t->ssl_status = flutls::SSL_STATUS_ENGINE_NOT_FOUND;
      *outcome = TASK_SSL_ERROR;
      return false;
    }
  }
  long cto = s->connect_timeout_ms.load();
  bool via_proxy = !s->proxy.empty();
  int fd;
  if (via_proxy) {
    std::string phost;
    int pport;
    if (!parse_proxy(s->proxy, &phost, &pport)) {
      *outcome = TASK_ERROR;
      return false;
    }
    fd = connect_host(phost, pport, cto, outcome);
    if (fd < 0) return false;
    if (https) {
      // tunnel: CONNECT host:port, then TLS over the tunnel
      // (reference: curl CONNECT via CURLOPT_PROXY, fludownloader.c:710-748)
      char portstr[16];
      snprintf(portstr, sizeof(portstr), "%d", port);
      std::string connect_req = "CONNECT " + host + ":" + portstr +
                                " HTTP/1.1\r\nHost: " + host + ":" + portstr +
                                "\r\nUser-Agent: " + s->user_agent +
                                "\r\n\r\n";
      if (!send_all(fd, connect_req, cto)) {
        close(fd);
        *outcome = TASK_SEND_ERROR;
        return false;
      }
      if (!read_connect_reply(fd, cto, s->idle_timeout_ms.load())) {
        close(fd);
        *outcome = TASK_COULD_NOT_CONNECT;
        return false;
      }
    }
  } else {
    fd = connect_host(host, port, cto, outcome);
    if (fd < 0) return false;
  }
  if (https) {
    bool timed_out = false;
    t->tls = flutls::Conn::handshake(fd, host, s->ssl_verify.load(),
                                     s->ca_file, cto, &t->ssl_status,
                                     &timed_out);
    if (t->tls == nullptr) {
      close(fd);
      *outcome = timed_out ? TASK_TIMEOUT : TASK_SSL_ERROR;
      return false;
    }
  }
  bool head = t->range == "HEAD";
  // plain-http proxy requests use the absolute URI form
  std::string target = (via_proxy && !https) ? t->url : path;
  // Host must carry the port when it isn't the scheme default (RFC 9112
  // §3.2) — servers build absolute redirect targets from it
  std::string host_hdr = host;
  if ((https && port != 443) || (!https && port != 80))
    host_hdr += ":" + std::to_string(port);
  std::string req = std::string(head ? "HEAD " : "GET ") + target +
                    " HTTP/1.1\r\nHost: " + host_hdr +
                    "\r\nUser-Agent: " + s->user_agent +
                    "\r\nAccept-Encoding: gzip, deflate\r\n"
                    "Connection: close\r\n";
  if (!t->range.empty() && !head)
    req += "Range: bytes=" + t->range + "\r\n";
  if (!s->cookies.empty()) req += "Cookie: " + s->cookies + "\r\n";
  req += "\r\n";
  bool sent = t->tls != nullptr
                  ? t->tls->write_all(req.data(), (int)req.size(), fd, cto)
                  : send_all(fd, req, cto);
  if (!sent) {
    delete t->tls;
    t->tls = nullptr;
    close(fd);
    *outcome = TASK_SEND_ERROR;
    return false;
  }
  t->sock = fd;
  t->request_sent = true;
  return true;
}

// Called when the current task crosses 75%: issue the next queued task's
// request so its response is in flight behind the current one.
void maybe_pipeline_next(Session* s, Task* current) {
  Task* next = nullptr;
  {
    std::lock_guard<std::mutex> lk(s->lock);
    for (size_t i = 0; i < s->queue.size(); i++) {
      if (s->queue[i] == current && i + 1 < s->queue.size()) {
        next = s->queue[i + 1];
        break;
      }
    }
  }
  if (next == nullptr || next->request_sent || next->abort_requested.load())
    return;
  if (next->url.rfind("http://", 0) != 0 &&
      next->url.rfind("https://", 0) != 0)
    return;  // only http(s) pipelines
  int outcome = TASK_ERROR;
  prepare_http(s, next, &outcome);  // best-effort; retried at execution
}

bool emit(Session* s, Task* t, const char* buf, size_t n) {
  if (s->data_cb != nullptr) {
    if (!s->data_cb(buf, n, t->user_data, t)) return false;
  }
  return true;
}

bool deliver(Session* s, Task* t, const char* buf, size_t n) {
  // wire-level accounting: downloaded/bwmeter/pipelining thresholds all
  // track transfer bytes (what the link carried), like curl's progress
  t->downloaded += n;
  uint64_t discard = s->discard_window.load();
  if (discard > 0) {
    uint64_t d = std::min<uint64_t>(discard, n);
    s->discard_window.fetch_sub(d);
    if (n > d) flu_bwmeter_data(n - d);
  } else {
    flu_bwmeter_data(n);
  }
  if (!t->z_inited) return emit(s, t, buf, n);
  if (t->z_done) return true;  // bytes after the compressed stream end
  t->zs.next_in = (Bytef*)buf;
  t->zs.avail_in = (uInt)n;
  bool first_call = t->z_first;
  t->z_first = false;
  char out[64 * 1024];
  for (;;) {
    t->zs.next_out = (Bytef*)out;
    t->zs.avail_out = sizeof(out);
    int rc = inflate(&t->zs, Z_NO_FLUSH);
    if (rc == Z_DATA_ERROR && first_call && t->z_deflate &&
        t->zs.total_out == 0) {
      // some servers send RAW deflate for "deflate" (no zlib wrapper);
      // curl tolerates it — retry this first buffer with windowBits -15
      first_call = false;
      inflateEnd(&t->zs);
      memset(&t->zs, 0, sizeof(t->zs));
      if (inflateInit2(&t->zs, -15) != Z_OK) {
        t->z_inited = false;
        t->outcome = TASK_DECODE_ERROR;
        return false;
      }
      t->zs.next_in = (Bytef*)buf;
      t->zs.avail_in = (uInt)n;
      continue;
    }
    if (rc != Z_OK && rc != Z_STREAM_END && rc != Z_BUF_ERROR) {
      t->outcome = TASK_DECODE_ERROR;
      return false;
    }
    size_t got = sizeof(out) - t->zs.avail_out;
    if (got > 0 && !emit(s, t, out, got)) return false;
    if (rc == Z_STREAM_END) {
      t->z_done = true;
      return true;
    }
    if (got == 0) break;  // need more input (Z_BUF_ERROR or drained)
    if (t->zs.avail_in == 0 && got < sizeof(out)) break;
  }
  return true;
}

void run_file_task(Session* s, Task* t) {
  std::string scheme, host, path;
  int port;
  parse_url(t->url, &scheme, &host, &port, &path);
  struct stat st;
  if (stat(path.c_str(), &st) != 0) {
    t->outcome = TASK_FILE_NOT_FOUND;
    return;
  }
  t->content_length = (size_t)st.st_size;  // file size via stat (:691-708)
  if (t->range == "HEAD") {
    t->outcome = TASK_OK;
    return;
  }
  FILE* f = fopen(path.c_str(), "rb");
  if (f == nullptr) {
    t->outcome = TASK_FILE_NOT_FOUND;
    return;
  }
  long start = 0, end = -1;
  if (!t->range.empty()) {
    sscanf(t->range.c_str(), "%ld-%ld", &start, &end);
    fseek(f, start, SEEK_SET);
  }
  std::vector<char> buf(64 * 1024);
  long remaining = end >= 0 ? end - start + 1 : -1;
  bool crossed75 = false;
  size_t total = remaining >= 0 ? (size_t)remaining : t->content_length;
  while (!t->abort_requested.load() && s->running.load()) {
    if (!s->pause_barrier.trypass_for_ms(4000)) continue;
    size_t want = buf.size();
    if (remaining >= 0) want = std::min(want, (size_t)remaining);
    if (want == 0) break;
    size_t n = fread(buf.data(), 1, want, f);
    if (n == 0) break;
    if (!deliver(s, t, buf.data(), n)) {
      t->outcome = TASK_ABORTED;
      break;
    }
    if (remaining >= 0) remaining -= (long)n;
    if (!crossed75 && total > 0 && t->downloaded * 4 >= total * 3) {
      crossed75 = true;
      maybe_pipeline_next(s, t);
    }
  }
  fclose(f);
  if (t->outcome.load() == TASK_PENDING)
    t->outcome = t->abort_requested.load() ? TASK_ABORTED : TASK_OK;
}

// One HTTP request/response exchange. On a 301/302/303/307/308 response
// carrying a Location header, *redirect receives the resolved target URL,
// the transport is closed, nothing is delivered to the data callback and
// the task outcome stays PENDING — the caller loops. Otherwise behaves as
// a complete transfer (sets t->outcome).
void run_http_transfer(Session* s, Task* t, std::string* redirect) {
  int outcome = TASK_ERROR;
  if (!t->request_sent && !prepare_http(s, t, &outcome)) {
    t->outcome = outcome;
    return;
  }
  std::string headers;
  std::string body_carry;
  std::string cbuf;              // chunked-transfer reassembly buffer
  char buf[64 * 1024];
  bool in_headers = true;
  bool chunked = false;
  long remaining = -1;           // content-length remaining
  // chunked state machine: >0 = payload bytes remaining in current chunk;
  // 0 = at a size line; -1 = awaiting the 2-byte CRLF chunk terminator
  // (which may arrive split across recv() boundaries); -2 = done.
  long chunk_remaining = 0;
  bool crossed75 = false;
  int idle_ms = 0;
  const int kPoll = 100;

  auto finish = [&](int oc) {
    // a compressed body that ended without its stream terminator is a
    // truncated/corrupt payload, not a success (zero-byte bodies pass)
    if (oc == TASK_OK && t->z_inited && !t->z_done && t->zs.total_in > 0)
      oc = TASK_DECODE_ERROR;
    t->close_transport();
    if (t->outcome.load() == TASK_PENDING) t->outcome = oc;
  };

  while (!t->abort_requested.load() && s->running.load()) {
    if (!s->pause_barrier.trypass_for_ms(4000)) continue;
    long pp = s->polling_period_us.load();
    if (pp > 0) usleep((useconds_t)pp);
    // decrypted bytes may already be buffered inside OpenSSL, in which
    // case the socket never becomes readable again — skip the poll
    bool tls_buffered = t->tls != nullptr && t->tls->pending() > 0;
    if (!tls_buffered) {
      struct pollfd pfd = {t->sock, POLLIN, 0};
      int rc = poll(&pfd, 1, kPoll);
      if (rc == 0) {
        idle_ms += kPoll;
        if (idle_ms >= s->idle_timeout_ms.load()) return finish(TASK_TIMEOUT);
        continue;
      }
      if (rc < 0) return finish(TASK_RECV_ERROR);
    }
    idle_ms = 0;
    ssize_t n;
    if (t->tls != nullptr) {
      int rn = t->tls->read(buf, (int)sizeof(buf));
      if (rn == -2) continue;  // record incomplete; poll for more bytes
      if (rn < 0) return finish(TASK_RECV_ERROR);
      n = rn;
    } else {
      n = recv(t->sock, buf, sizeof(buf), 0);
      if (n < 0) return finish(TASK_RECV_ERROR);
    }
    if (n == 0) {  // connection closed
      if (in_headers) return finish(TASK_RECV_ERROR);
      if (remaining > 0 || (chunked && chunk_remaining != -2))
        return finish(TASK_RECV_ERROR);
      return finish(TASK_OK);
    }
    const char* data = buf;
    size_t len = (size_t)n;
    if (in_headers) {
      headers.append(data, len);
      size_t hdr_end = headers.find("\r\n\r\n");
      if (hdr_end == std::string::npos) continue;
      in_headers = false;
      t->raw_headers = headers.substr(0, hdr_end + 4);
      sscanf(headers.c_str(), "HTTP/%*s %d", &t->http_status);
      // header fields
      auto find_hdr = [&](const char* name) -> std::string {
        std::string low;
        low.reserve(t->raw_headers.size());
        for (char c : t->raw_headers) low.push_back((char)tolower(c));
        std::string key = std::string(name) + ":";
        size_t p = low.find(key);
        if (p == std::string::npos) return "";
        size_t e = t->raw_headers.find("\r\n", p);
        std::string v = t->raw_headers.substr(p + key.size(),
                                              e - p - key.size());
        while (!v.empty() && v.front() == ' ') v.erase(v.begin());
        return v;
      };
      std::string cl = find_hdr("content-length");
      if (!cl.empty()) {
        remaining = atol(cl.c_str());
        t->content_length = (size_t)remaining;
      }
      t->date_header = find_hdr("date");
      chunked = find_hdr("transfer-encoding").find("chunked")
                != std::string::npos;
      int st = t->http_status;
      if (st == 301 || st == 302 || st == 303 || st == 307 || st == 308) {
        std::string loc = find_hdr("location");
        if (!loc.empty()) {
          // redirect: hand the resolved target to the caller; the stub
          // body is never delivered (Connection: close lets us just drop
          // the socket instead of draining it)
          *redirect = resolve_redirect(t->url, loc);
          t->close_transport();
          t->request_sent = false;
          return;
        }
      }
      if (t->http_status >= 400) return finish(TASK_HTTP_ERROR);
      if (t->range == "HEAD") return finish(TASK_OK);
      // transparent decode of compressed bodies (we advertise
      // Accept-Encoding like CURLOPT_ACCEPT_ENCODING "" — reference
      // fludownloader.c:748; callers always see identity bytes)
      std::string ce = find_hdr("content-encoding");
      for (char& c : ce) c = (char)tolower(c);
      if (ce.find("gzip") != std::string::npos ||
          ce.find("deflate") != std::string::npos) {
        if (!t->start_decoder(ce.find("gzip") == std::string::npos))
          return finish(TASK_DECODE_ERROR);
      }
      // leftover bytes after the header block are body
      body_carry = headers.substr(hdr_end + 4);
      data = body_carry.data();
      len = body_carry.size();
      if (len == 0) {
        if (remaining == 0) return finish(TASK_OK);
        continue;
      }
    }
    // body bytes in [data, len)
    if (chunked) {
      cbuf.append(data, len);
      for (;;) {
        if (chunk_remaining > 0) {
          size_t take = std::min((size_t)chunk_remaining, cbuf.size());
          if (take == 0) break;
          if (!deliver(s, t, cbuf.data(), take)) return finish(TASK_ABORTED);
          cbuf.erase(0, take);
          chunk_remaining -= (long)take;
          if (chunk_remaining == 0) chunk_remaining = -1;
          continue;
        }
        if (chunk_remaining == -1) {  // consume exactly the CRLF terminator
          if (cbuf.size() < 2) break;
          if (cbuf[0] != '\r' || cbuf[1] != '\n')
            return finish(TASK_RECV_ERROR);
          cbuf.erase(0, 2);
          chunk_remaining = 0;
          continue;
        }
        size_t eol = cbuf.find("\r\n");
        if (eol == std::string::npos) break;
        char* endp = nullptr;
        long sz = strtol(cbuf.c_str(), &endp, 16);
        if (endp == cbuf.c_str() || sz < 0)  // malformed size line
          return finish(TASK_RECV_ERROR);
        cbuf.erase(0, eol + 2);
        if (sz == 0) {
          chunk_remaining = -2;  // done marker
          return finish(TASK_OK);
        }
        chunk_remaining = sz;
      }
    } else {
      size_t take = remaining >= 0 ? std::min(len, (size_t)remaining) : len;
      if (take > 0 && !deliver(s, t, data, take)) return finish(TASK_ABORTED);
      if (remaining >= 0) {
        remaining -= (long)take;
        if (!crossed75 && t->content_length > 0 &&
            t->downloaded * 4 >= t->content_length * 3) {
          crossed75 = true;
          maybe_pipeline_next(s, t);  // issue next GET at >=75% (:443-484)
        }
        if (remaining == 0) return finish(TASK_OK);
      }
    }
    body_carry.clear();
  }
  finish(t->abort_requested.load() ? TASK_ABORTED : TASK_ERROR);
}

void run_http_task(Session* s, Task* t) {
  // Follow 301/302/303/307/308 with a hop cap, matching the reference's
  // CURLOPT_FOLLOWLOCATION (fludownloader.c:733-734). Range and cookies
  // are reapplied on each hop (prepare_http reads them fresh). Method
  // semantics: this client only issues GET and HEAD, both of which are
  // preserved across every redirect class (303's POST→GET rewrite never
  // applies).
  const int kMaxRedirects = 5;
  for (int hop = 0;; ++hop) {
    std::string redirect;
    run_http_transfer(s, t, &redirect);
    if (redirect.empty()) return;
    if (t->abort_requested.load() || !s->running.load()) {
      // abort between hops: don't chase further Locations
      if (t->outcome.load() == TASK_PENDING) t->outcome = TASK_ABORTED;
      return;
    }
    if (hop >= kMaxRedirects) {
      t->outcome = TASK_TOO_MANY_REDIRECTS;
      return;
    }
    t->url = redirect;  // effective URL, as curl reports after following
    t->content_length = 0;
    t->raw_headers.clear();
    t->date_header.clear();
    t->http_status = 0;
  }
}

void worker_loop(Session* s) {
  while (s->running.load()) {
    Task* t = nullptr;
    {
      std::lock_guard<std::mutex> lk(s->lock);
      if (!s->queue.empty()) t = s->queue.front();
    }
    if (t == nullptr) {
      s->wakeup.lock();
      s->wakeup.wait_for_ms(50);
      s->wakeup.unlock();
      continue;
    }
    if (!t->outcome_forced.load() && !t->abort_requested.load()) {
      if (t->url.rfind("file://", 0) == 0) {
        run_file_task(s, t);
      } else if (t->url.rfind("http://", 0) == 0 ||
                 t->url.rfind("https://", 0) == 0) {
        run_http_task(s, t);
      } else {
        t->outcome = TASK_ERROR;
      }
    } else if (t->abort_requested.load() &&
               t->outcome.load() == TASK_PENDING) {
      t->outcome = TASK_ABORTED;
    }
    int cancel_remaining = 0;
    if (s->done_cb != nullptr) {
      s->done_cb(t->outcome.load(), t->http_status, t->downloaded,
                 t->user_data, t, &cancel_remaining);
    }
    {
      std::lock_guard<std::mutex> lk(s->lock);
      if (!s->queue.empty() && s->queue.front() == t) s->queue.pop_front();
      if (cancel_remaining) {
        for (Task* q : s->queue) q->abort_requested = true;
      }
    }
    t->close_transport();
    delete t;
  }
  // drain: abort queued tasks
  std::lock_guard<std::mutex> lk(s->lock);
  for (Task* q : s->queue) delete q;
  s->queue.clear();
}

}  // namespace

extern "C" {

void* flu_dl_new(DataCb data_cb, DoneCb done_cb) {
  Session* s = new Session();
  s->data_cb = data_cb;
  s->done_cb = done_cb;
  s->worker = std::thread(worker_loop, s);
  return s;
}

void flu_dl_destroy(void* ctx) {
  Session* s = static_cast<Session*>(ctx);
  s->running = false;
  s->pause_barrier.set_open(true);
  s->notify();
  if (s->worker.joinable()) s->worker.join();
  delete s;
}

void* flu_dl_new_task(void* ctx, const char* url, const char* range,
                      void* user_data) {
  Session* s = static_cast<Session*>(ctx);
  Task* t = new Task();
  t->session = s;
  t->url = url ? url : "";
  t->range = range ? range : "";
  t->user_data = user_data;
  {
    std::lock_guard<std::mutex> lk(s->lock);
    s->queue.push_back(t);
  }
  s->notify();
  return t;
}

void flu_dl_abort_task(void* task) {
  static_cast<Task*>(task)->abort_requested = true;
}

void flu_dl_abort_all(void* ctx, int including_current) {
  Session* s = static_cast<Session*>(ctx);
  std::lock_guard<std::mutex> lk(s->lock);
  for (size_t i = 0; i < s->queue.size(); i++) {
    if (i == 0 && !including_current) continue;
    s->queue[i]->abort_requested = true;
  }
}

void flu_dl_pause(void* ctx) {
  static_cast<Session*>(ctx)->pause_barrier.set_open(false);
}

void flu_dl_resume(void* ctx) {
  Session* s = static_cast<Session*>(ctx);
  // stale kernel-buffered data right after resume must not pollute the
  // bandwidth stats (:343-355): discard the first 32 KiB from accounting
  s->discard_window = 32 * 1024;
  s->pause_barrier.set_open(true);
}

const char* flu_dl_task_get_url(void* task) {
  return static_cast<Task*>(task)->url.c_str();
}

size_t flu_dl_task_get_length(void* task) {
  return static_cast<Task*>(task)->content_length;
}

int flu_dl_task_get_http_status(void* task) {
  return static_cast<Task*>(task)->http_status;
}

const char* flu_dl_task_get_date(void* task) {
  Task* t = static_cast<Task*>(task);
  return t->date_header.empty() ? nullptr : t->date_header.c_str();
}

const char* flu_dl_task_get_header(void* task) {
  return static_cast<Task*>(task)->raw_headers.c_str();
}

int flu_dl_task_get_outcome(void* task) {
  return static_cast<Task*>(task)->outcome.load();
}

void flu_dl_task_set_outcome(void* task, int outcome) {
  // fault injection for testing (:912-918)
  Task* t = static_cast<Task*>(task);
  t->outcome = outcome;
  t->outcome_forced = true;
}

const char* flu_dl_outcome_string(int outcome) {
  if (outcome < 0 || outcome > TASK_TOO_MANY_REDIRECTS) return "UNKNOWN";
  return kOutcomeNames[outcome];
}

void flu_dl_set_polling_period(void* ctx, long period_us) {
  static_cast<Session*>(ctx)->polling_period_us = period_us;
}

long flu_dl_get_polling_period(void* ctx) {
  return static_cast<Session*>(ctx)->polling_period_us.load();
}

void flu_dl_set_timeouts(void* ctx, long connect_ms, long idle_ms) {
  Session* s = static_cast<Session*>(ctx);
  s->connect_timeout_ms = connect_ms;
  s->idle_timeout_ms = idle_ms;
}

void flu_dl_set_user_agent(void* ctx, const char* ua) {
  static_cast<Session*>(ctx)->user_agent = ua ? ua : "";
}

void flu_dl_set_cookies(void* ctx, const char* cookies) {
  static_cast<Session*>(ctx)->cookies = cookies ? cookies : "";
}

void flu_dl_set_proxy(void* ctx, const char* proxy) {
  static_cast<Session*>(ctx)->proxy = proxy ? proxy : "";
}

void flu_dl_set_ssl(void* ctx, int verify, const char* ca_file) {
  Session* s = static_cast<Session*>(ctx);
  s->ssl_verify = verify != 0;
  s->ca_file = ca_file ? ca_file : "";
}

int flu_dl_ssl_available(void) { return flutls::available() ? 1 : 0; }

int flu_dl_task_get_ssl_status(void* task) {
  return static_cast<Task*>(task)->ssl_status;
}

int flu_dl_get_tasks_count(void* ctx) {
  Session* s = static_cast<Session*>(ctx);
  std::lock_guard<std::mutex> lk(s->lock);
  return (int)s->queue.size();
}

// --- reference-parity surface (fludownloader.h:94-185) ---------------------

void flu_dl_global_init(void) {
  // curl_global_init analog (fludownloader.h:94): the sockets rewrite has
  // no process-global state to initialize; kept for API parity.
}

void flu_dl_global_shutdown(void) {}

void flu_dl_lock(void* ctx) {
  // session lock exposed so callbacks can synchronize against task
  // mutation (fludownloader.h:125-128)
  static_cast<Session*>(ctx)->lock.lock();
}

void flu_dl_unlock(void* ctx) {
  static_cast<Session*>(ctx)->lock.unlock();
}

int flu_dl_task_get_abort(void* task) {
  return static_cast<Task*>(task)->abort_requested.load() ? 1 : 0;
}

const char* kSslStatusNames[] = {
    "OK", "CONNECT_ERROR", "ENGINE_NOT_FOUND", "ENGINE_SET_FAILED",
    "CERTPROBLEM", "CIPHER", "CACERT", "ENGINE_INIT_FAILED",
    "CACERT_BADFILE", "SHUTDOWN_FAILED", "CRL_BADFILE", "ISSUER_ERROR",
    "PINNEDPUBKEYNOTMATCH", "INVALIDCERTSTATUS", "NO_TASK"};

const char* flu_dl_ssl_status_string(int status) {
  if (status < 0 || status > 14) return "UNKNOWN";
  return kSslStatusNames[status];
}

long long flu_dl_getdate(const char* date) {
  // RFC 7231 HTTP-date (+ the obsolete RFC 850 / asctime forms) → epoch
  // seconds; -1 on parse failure (fludownloader.h:185 getdate role)
  if (date == nullptr) return -1;
  struct tm tm = {};
  const char* fmts[] = {"%a, %d %b %Y %H:%M:%S",   // IMF-fixdate
                        "%A, %d-%b-%y %H:%M:%S",   // RFC 850
                        "%a %b %d %H:%M:%S %Y"};   // asctime
  for (const char* f : fmts) {
    struct tm t2 = {};
    if (strptime(date, f, &t2) != nullptr) {
      tm = t2;
      time_t out = timegm(&tm);
      return out == (time_t)-1 ? -1 : (long long)out;
    }
  }
  return -1;
}

}  // extern "C"

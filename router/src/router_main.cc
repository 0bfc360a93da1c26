// sglang_custom_tpu router: HTTP proxy with pluggable load-balancing
// policies.
//
// C++ re-implementation of the reference's Rust router
// (reference: sgl-router/src/server.rs:107-302 routes, routers/router.rs
// proxying, policies/, metrics.rs Prometheus, request_tracker.rs). One
// binary, no external dependencies: POSIX sockets, thread per connection.
//
// Usage:
//   router --port 8000 --policy cache_aware \
//          --worker http://127.0.0.1:30000 --worker http://127.0.0.1:30001 \
//          [--probs 0.6,0.4] [--trace-capacity 1000]

#include <atomic>
#include <csignal>
#include <cstdio>
#include <deque>
#include <map>
#include <memory>
#include <mutex>
#include <sstream>
#include <thread>
#include <vector>

#include "http.hpp"
#include "policies.hpp"

namespace router {

struct Trace {
  std::string rid;
  std::string worker;
  double start, end;
  bool ok;
};

class Router {
 public:
  Router(std::unique_ptr<Policy> policy, size_t trace_capacity)
      : policy_(std::move(policy)), trace_capacity_(trace_capacity) {}

  ~Router() {
    if (csv_) fclose(csv_);
  }

  // Per-request CSV metrics recorder (reference: sgl-router
  // src/policies/marginal_utility_recorder.rs — the fork's experiment
  // tooling writes router_test_*.csv traces consumed by
  // gradient_optimizer.py / the 实验 analysis scripts).
  void open_csv(const std::string& path) {
    std::lock_guard<std::mutex> lk(mu_);
    csv_ = fopen(path.c_str(), "a");
    if (csv_ && ftell(csv_) == 0) {
      fprintf(csv_,
              "timestamp,rid,worker,latency_s,ok,outstanding,total,"
              "policy\n");
      fflush(csv_);
    }
  }

  void add_worker(const std::string& url) {
    std::lock_guard<std::mutex> lk(mu_);
    for (auto& w : workers_)
      if (w->url == url) return;
    auto w = std::make_unique<WorkerState>();
    w->url = url;
    workers_.push_back(std::move(w));
  }

  bool remove_worker(const std::string& url) {
    std::lock_guard<std::mutex> lk(mu_);
    for (size_t i = 0; i < workers_.size(); i++)
      if (workers_[i]->url == url) {
        workers_.erase(workers_.begin() + i);
        return true;
      }
    return false;
  }

  std::string list_workers() {
    std::lock_guard<std::mutex> lk(mu_);
    std::ostringstream os;
    os << "{\"urls\": [";
    for (size_t i = 0; i < workers_.size(); i++) {
      if (i) os << ", ";
      os << '"' << workers_[i]->url << '"';
    }
    os << "]}";
    return os.str();
  }

  std::string get_loads() {
    std::lock_guard<std::mutex> lk(mu_);
    std::ostringstream os;
    os << "{\"loads\": [";
    for (size_t i = 0; i < workers_.size(); i++) {
      if (i) os << ", ";
      os << "{\"url\": \"" << workers_[i]->url
         << "\", \"outstanding\": " << workers_[i]->outstanding
         << ", \"total\": " << workers_[i]->total
         << ", \"failures\": " << workers_[i]->failures
         << ", \"healthy\": " << (workers_[i]->healthy ? "true" : "false")
         << "}";
    }
    os << "]}";
    return os.str();
  }

  // Active health checking (reference: sgl-router
  // src/core/worker.rs health-checker loop — periodic GET /health with a
  // consecutive-failure threshold; a single success restores the worker).
  std::vector<std::string> worker_urls() {
    std::lock_guard<std::mutex> lk(mu_);
    std::vector<std::string> urls;
    for (auto& w : workers_) urls.push_back(w->url);
    return urls;
  }

  void record_probe(const std::string& url, bool ok, size_t fail_threshold) {
    std::lock_guard<std::mutex> lk(mu_);
    for (auto& w : workers_)
      if (w->url == url) {
        if (ok) {
          w->consec_probe_failures = 0;
          w->healthy = true;
        } else if (++w->consec_probe_failures >= fail_threshold) {
          w->healthy = false;
        }
        return;
      }
  }

  std::string metrics() {
    std::lock_guard<std::mutex> lk(mu_);
    std::ostringstream os;
    os << "# TYPE router_requests_total counter\n";
    for (auto& w : workers_)
      os << "router_requests_total{worker=\"" << w->url << "\"} " << w->total
         << "\n";
    os << "# TYPE router_outstanding_requests gauge\n";
    for (auto& w : workers_)
      os << "router_outstanding_requests{worker=\"" << w->url << "\"} "
         << w->outstanding << "\n";
    os << "# TYPE router_request_failures_total counter\n";
    for (auto& w : workers_)
      os << "router_request_failures_total{worker=\"" << w->url << "\"} "
         << w->failures << "\n";
    os << "# TYPE router_policy_info gauge\nrouter_policy_info{policy=\""
       << policy_->name() << "\"} 1\n";
    return os.str();
  }

  std::string traces() {
    std::lock_guard<std::mutex> lk(mu_);
    std::ostringstream os;
    os << "{\"traces\": [";
    bool first = true;
    for (auto& t : traces_) {
      if (!first) os << ", ";
      first = false;
      os << "{\"rid\": \"" << t.rid << "\", \"worker\": \"" << t.worker
         << "\", \"latency\": " << (t.end - t.start)
         << ", \"ok\": " << (t.ok ? "true" : "false") << "}";
    }
    os << "]}";
    return os.str();
  }

  // Select a worker and mark a request in flight. Returns url or "".
  std::string begin_request(const std::string& body) {
    std::lock_guard<std::mutex> lk(mu_);
    std::vector<WorkerState*> healthy;
    for (auto& w : workers_)
      if (w->healthy) healthy.push_back(w.get());
    if (healthy.empty()) return "";
    size_t i = policy_->select(healthy, body);
    healthy[i]->outstanding++;
    healthy[i]->total++;
    return healthy[i]->url;
  }

  void end_request(const std::string& url, const RequestMetrics& m,
                   const std::string& rid) {
    std::lock_guard<std::mutex> lk(mu_);
    for (auto& w : workers_)
      if (w->url == url) {
        if (w->outstanding > 0) w->outstanding--;
        if (!m.ok) w->failures++;
        policy_->on_complete(w.get(), m);
        break;
      }
    traces_.push_back({rid, url, m.start_time, m.end_time, m.ok});
    while (traces_.size() > trace_capacity_) traces_.pop_front();
    if (csv_) {
      size_t outstanding = 0, total = 0;
      for (auto& w : workers_)
        if (w->url == url) {
          outstanding = w->outstanding;
          total = w->total;
          break;
        }
      fprintf(csv_, "%.6f,%s,%s,%.6f,%d,%zu,%zu,%s\n", m.end_time,
              rid.c_str(), url.c_str(), m.latency(), m.ok ? 1 : 0,
              outstanding, total, policy_->name());
      fflush(csv_);
    }
  }

 private:
  std::mutex mu_;
  std::unique_ptr<Policy> policy_;
  std::vector<std::unique_ptr<WorkerState>> workers_;
  std::deque<Trace> traces_;
  size_t trace_capacity_;
  FILE* csv_ = nullptr;
};

// Forward req to worker `url`, streaming the response back to client_fd.
// Returns (ok, bytes_streamed).
static bool proxy_request(const std::string& url, const HttpRequest& req,
                          int client_fd) {
  std::string host;
  int port;
  if (!parse_url(url, &host, &port)) return false;
  int up = connect_to(host, port);
  if (up < 0) return false;
  std::ostringstream os;
  os << req.method << " " << req.path << " HTTP/1.1\r\n"
     << "Host: " << host << "\r\n"
     << "Content-Type: application/json\r\n"
     << "Content-Length: " << req.body.size() << "\r\n"
     << "Connection: close\r\n\r\n"
     << req.body;
  if (!send_all(up, os.str())) {
    ::close(up);
    return false;
  }
  // Stream everything back verbatim (works for JSON and SSE).
  char buf[16384];
  bool ok = true;
  bool wrote = false;
  while (true) {
    ssize_t n = ::recv(up, buf, sizeof(buf), 0);
    if (n < 0) {
      ok = false;
      break;
    }
    if (n == 0) break;
    wrote = true;
    if (!send_all(client_fd, buf, size_t(n))) {
      ok = false;
      break;
    }
  }
  ::close(up);
  return ok && wrote;
}

// One active /health probe: TCP connect + GET, true iff an HTTP 200 comes
// back. Short socket timeouts so a hung worker can't stall the checker.
static bool probe_health(const std::string& url) {
  std::string host;
  int port;
  if (!parse_url(url, &host, &port)) return false;
  int fd = connect_to(host, port);
  if (fd < 0) return false;
  timeval tv{1, 0};
  setsockopt(fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
  setsockopt(fd, SOL_SOCKET, SO_SNDTIMEO, &tv, sizeof(tv));
  std::ostringstream os;
  os << "GET /health HTTP/1.1\r\nHost: " << host
     << "\r\nConnection: close\r\n\r\n";
  bool ok = false;
  if (send_all(fd, os.str())) {
    char buf[256];
    ssize_t n = ::recv(fd, buf, sizeof(buf) - 1, 0);
    if (n > 0) {
      // Parse ONLY the status line ("HTTP/1.x 200 ..."): matching " 200"
      // anywhere in the response let a 503 with a Content-Length/body
      // containing "200" pass the probe (round-3 advisor finding).
      std::string resp(buf, size_t(n));
      auto eol = resp.find("\r\n");
      std::string status = resp.substr(0, eol == std::string::npos ? n : eol);
      auto sp = status.find(' ');
      if (status.compare(0, 5, "HTTP/") == 0 && sp != std::string::npos) {
        auto end = status.find(' ', sp + 1);
        ok = status.substr(sp + 1, end == std::string::npos
                                       ? std::string::npos
                                       : end - sp - 1) == "200";
      }
    }
  }
  ::close(fd);
  return ok;
}

// Full (non-streamed) HTTP exchange with a worker: returns false on
// connect/send failure; *status / *resp_body hold the parsed response.
static bool request_full(const std::string& url, const std::string& method,
                         const std::string& path, const std::string& body,
                         int* status, std::string* resp_body) {
  std::string host;
  int port;
  if (!parse_url(url, &host, &port)) return false;
  int fd = connect_to(host, port);
  if (fd < 0) return false;
  std::ostringstream os;
  os << method << " " << path << " HTTP/1.1\r\nHost: " << host
     << "\r\nContent-Type: application/json\r\nContent-Length: "
     << body.size() << "\r\nConnection: close\r\n\r\n"
     << body;
  if (!send_all(fd, os.str())) {
    ::close(fd);
    return false;
  }
  std::string raw;
  char buf[16384];
  while (true) {
    ssize_t n = ::recv(fd, buf, sizeof(buf), 0);
    if (n <= 0) break;
    raw.append(buf, size_t(n));
  }
  ::close(fd);
  auto hdr_end = raw.find("\r\n\r\n");
  if (hdr_end == std::string::npos) return false;
  auto sp = raw.find(' ');
  *status = (sp != std::string::npos) ? std::atoi(raw.c_str() + sp + 1) : 0;
  *resp_body = raw.substr(hdr_end + 4);
  return true;
}

static std::string json_field(const std::string& body, const std::string& key) {
  // naive "key": "value" extraction (control endpoints only)
  auto k = body.find("\"" + key + "\"");
  if (k == std::string::npos) return "";
  auto colon = body.find(':', k);
  if (colon == std::string::npos) return "";
  auto q0 = body.find('"', colon);
  if (q0 == std::string::npos) return "";
  auto q1 = body.find('"', q0 + 1);
  if (q1 == std::string::npos) return "";
  return body.substr(q0 + 1, q1 - q0 - 1);
}

static std::string json_num_field(const std::string& body,
                                  const std::string& key) {
  auto k = body.find("\"" + key + "\"");
  if (k == std::string::npos) return "";
  auto colon = body.find(':', k);
  if (colon == std::string::npos) return "";
  size_t i = colon + 1;
  while (i < body.size() && (body[i] == ' ' || body[i] == '\t')) i++;
  size_t j = i;
  while (j < body.size() && (isdigit(body[j]) || body[j] == '-')) j++;
  return body.substr(i, j - i);
}

static Router* g_router = nullptr;
static std::atomic<uint64_t> g_rid{0};

// File-based service discovery (reference: sgl-router
// src/service_discovery.rs:21,86 — a K8s pod watcher that add/removes
// workers as endpoints come and go; here the environment-honest analog
// watches a JSON file {"workers": ["http://...", ...]} that an external
// orchestrator rewrites).
static std::vector<std::string> parse_worker_list(const std::string& body) {
  std::vector<std::string> urls;
  auto k = body.find("\"workers\"");
  if (k == std::string::npos) return urls;
  auto lb = body.find('[', k);
  auto rb = body.find(']', lb);
  if (lb == std::string::npos || rb == std::string::npos) return urls;
  size_t i = lb;
  while (true) {
    auto q0 = body.find('"', i);
    if (q0 == std::string::npos || q0 > rb) break;
    auto q1 = body.find('"', q0 + 1);
    if (q1 == std::string::npos || q1 > rb) break;
    urls.push_back(body.substr(q0 + 1, q1 - q0 - 1));
    i = q1 + 1;
  }
  return urls;
}

static void discovery_tick(const std::string& path) {
  FILE* f = fopen(path.c_str(), "r");
  if (!f) return;
  std::string body;
  char buf[4096];
  size_t n;
  while ((n = fread(buf, 1, sizeof(buf), f)) > 0) body.append(buf, n);
  fclose(f);
  auto want = parse_worker_list(body);
  if (want.empty() && body.find("\"workers\"") == std::string::npos) return;
  auto have = g_router->worker_urls();
  for (auto& u : want) {
    bool known = false;
    for (auto& h : have)
      if (h == u) known = true;
    if (!known) {
      fprintf(stderr, "discovery: add %s\n", u.c_str());
      g_router->add_worker(u);
    }
  }
  for (auto& h : have) {
    bool wanted = false;
    for (auto& u : want)
      if (h == u) wanted = true;
    if (!wanted) {
      fprintf(stderr, "discovery: remove %s\n", h.c_str());
      g_router->remove_worker(h);
    }
  }
}

// ---------------------------------------------------- PD disaggregation
// C++ port of the pairing router (reference: sgl-router/src/routers/
// pd_router.rs select_worker_pair + bootstrap-room injection; the Python
// prototype is disaggregation/mini_lb.py). Prefill and decode worker
// fleets get independent Routers (policy + health + metrics each); a
// /generate request picks one worker per side, injects a bootstrap room
// and the decode side's KV rendezvous address into the prefill call,
// then returns the decode side's response.
static Router* g_pd_prefill = nullptr;
static Router* g_pd_decode = nullptr;
static std::mutex g_kv_mu;
static std::map<std::string, std::pair<std::string, int>> g_kv_addr;

static bool discover_kv(const std::string& decode_url, std::string* host,
                        int* port) {
  {
    std::lock_guard<std::mutex> lk(g_kv_mu);
    auto it = g_kv_addr.find(decode_url);
    if (it != g_kv_addr.end()) {
      *host = it->second.first;
      *port = it->second.second;
      return true;
    }
  }
  int status = 0;
  std::string body;
  if (!request_full(decode_url, "GET", "/get_server_info", "", &status,
                    &body) ||
      status != 200)
    return false;
  *host = json_field(body, "kv_host");
  std::string p = json_num_field(body, "kv_port");
  if (host->empty() || p.empty()) return false;
  *port = std::atoi(p.c_str());
  std::lock_guard<std::mutex> lk(g_kv_mu);
  g_kv_addr[decode_url] = {*host, *port};
  return true;
}

static void handle_pd_generate(int fd, const HttpRequest& req) {
  std::string p_url = g_pd_prefill->begin_request(req.body);
  std::string d_url = g_pd_decode->begin_request(req.body);
  auto fail = [&](int code, const std::string& msg, bool p_open,
                  bool d_open) {
    RequestMetrics m;
    m.start_time = m.end_time = now_s();
    m.ok = false;
    if (p_open) g_pd_prefill->end_request(p_url, m, "");
    if (d_open) g_pd_decode->end_request(d_url, m, "");
    send_response(fd, code, "{\"error\": \"" + msg + "\"}");
  };
  if (p_url.empty() || d_url.empty())
    return fail(503, "no healthy PD worker pair", !p_url.empty(),
                !d_url.empty());
  std::string kv_host;
  int kv_port = 0;
  if (!discover_kv(d_url, &kv_host, &kv_port))
    return fail(502, "decode worker kv discovery failed", true, true);

  std::string room = "pd-" + std::to_string(g_rid++);
  // splice room + kv rendezvous into the client's JSON object body
  auto brace = req.body.find('{');
  if (brace == std::string::npos)
    return fail(400, "body must be a JSON object", true, true);
  std::string pbody = "{\"room\": \"" + room + "\", \"kv_host\": \"" +
                      kv_host + "\", \"kv_port\": " +
                      std::to_string(kv_port) + ", " +
                      req.body.substr(brace + 1);

  RequestMetrics pm;
  pm.start_time = now_s();
  int status = 0;
  std::string resp;
  bool ok = request_full(p_url, "POST", "/pd_prefill", pbody, &status,
                         &resp) &&
            status == 200;
  pm.end_time = now_s();
  pm.ok = ok;
  g_pd_prefill->end_request(p_url, pm, room);
  if (!ok) return fail(502, "prefill worker error", false, true);

  RequestMetrics dm;
  dm.start_time = now_s();
  HttpRequest dreq;
  dreq.method = "POST";
  dreq.path = "/pd_generate";
  dreq.body = "{\"room\": \"" + room + "\"}";
  ok = proxy_request(d_url, dreq, fd);  // stream decode response back
  dm.end_time = now_s();
  dm.ok = ok;
  g_pd_decode->end_request(d_url, dm, room);
  if (!ok) send_response(fd, 502, "{\"error\": \"decode worker error\"}");
}

static void handle_conn(int fd) {
  HttpRequest req;
  if (!read_request(fd, &req)) {
    ::close(fd);
    return;
  }
  // control endpoints (reference: server.rs worker add/remove, /get_loads,
  // request-trace endpoints)
  if (req.path == "/health") {
    send_response(fd, 200, "{\"status\": \"ok\"}");
  } else if (req.path == "/list_workers") {
    send_response(fd, 200, g_router->list_workers());
  } else if (req.path == "/add_worker") {
    std::string url = json_field(req.body, "url");
    if (url.empty()) {
      send_response(fd, 400, "{\"error\": \"url required\"}");
    } else {
      g_router->add_worker(url);
      send_response(fd, 200, "{\"status\": \"ok\"}");
    }
  } else if (req.path == "/remove_worker") {
    std::string url = json_field(req.body, "url");
    send_response(fd, g_router->remove_worker(url) ? 200 : 404,
                  "{\"status\": \"done\"}");
  } else if (req.path == "/get_loads") {
    if (g_pd_prefill) {
      send_response(fd, 200,
                    "{\"prefill\": " + g_pd_prefill->get_loads() +
                        ", \"decode\": " + g_pd_decode->get_loads() + "}");
    } else {
      send_response(fd, 200, g_router->get_loads());
    }
  } else if (req.path == "/metrics") {
    std::string m = g_router ? g_router->metrics() : "";
    if (g_pd_prefill) m += g_pd_prefill->metrics() + g_pd_decode->metrics();
    send_response(fd, 200, m, "text/plain");
  } else if (req.path == "/request_traces") {
    send_response(fd, 200,
                  g_pd_decode ? g_pd_decode->traces() : g_router->traces());
  } else if (g_pd_prefill != nullptr) {
    // PD mode: every inference request runs the pair flow
    handle_pd_generate(fd, req);
  } else {
    // proxy everything else to a worker chosen by the policy
    std::string url = g_router->begin_request(req.body);
    if (url.empty()) {
      send_response(fd, 503, "{\"error\": \"no healthy workers\"}");
    } else {
      RequestMetrics m;
      m.start_time = now_s();
      bool ok = proxy_request(url, req, fd);
      m.end_time = now_s();
      m.ok = ok;
      std::string rid = json_field(req.body, "rid");
      if (rid.empty()) rid = "req-" + std::to_string(g_rid++);
      g_router->end_request(url, m, rid);
      if (!ok) send_response(fd, 502, "{\"error\": \"worker error\"}");
    }
  }
  ::shutdown(fd, SHUT_WR);
  ::close(fd);
}

}  // namespace router

int main(int argc, char** argv) {
  using namespace router;
  int port = 8000;
  std::string policy_name = "round_robin";
  std::vector<std::string> workers, prefill_workers, decode_workers;
  std::string metrics_csv;
  std::string discovery_file;
  int discovery_ms = 2000;
  std::vector<double> probs;
  size_t trace_cap = 1000;
  int health_ms = 5000;  // 0 disables active health checks
  size_t health_threshold = 3;
  for (int i = 1; i < argc; i++) {
    std::string a = argv[i];
    auto next = [&]() -> std::string {
      return i + 1 < argc ? argv[++i] : "";
    };
    if (a == "--port") port = std::stoi(next());
    else if (a == "--policy") policy_name = next();
    else if (a == "--worker") workers.push_back(next());
    else if (a == "--prefill-worker") prefill_workers.push_back(next());
    else if (a == "--decode-worker") decode_workers.push_back(next());
    else if (a == "--metrics-csv") metrics_csv = next();
    else if (a == "--discovery-file") discovery_file = next();
    else if (a == "--discovery-interval-ms")
      discovery_ms = std::stoi(next());
    else if (a == "--trace-capacity") trace_cap = std::stoul(next());
    else if (a == "--health-interval-ms") health_ms = std::stoi(next());
    else if (a == "--health-fail-threshold")
      health_threshold = std::stoul(next());
    else if (a == "--probs") {
      std::istringstream ps(next());
      std::string tok;
      while (std::getline(ps, tok, ',')) probs.push_back(std::stod(tok));
    }
  }
  bool pd_mode = !prefill_workers.empty() || !decode_workers.empty();
  if (pd_mode && (prefill_workers.empty() || decode_workers.empty())) {
    fprintf(stderr, "PD mode needs BOTH --prefill-worker and --decode-worker\n");
    return 1;
  }
  auto policy = make_policy(policy_name, probs);
  if (!policy) {
    fprintf(stderr, "unknown policy %s\n", policy_name.c_str());
    return 1;
  }
  Router router_obj(std::move(policy), trace_cap);
  g_router = &router_obj;
  for (auto& w : workers) router_obj.add_worker(w);
  if (!metrics_csv.empty()) router_obj.open_csv(metrics_csv);

  // PD pairing mode (reference: pd_router.rs) — each side gets its own
  // least-outstanding selector, independent of --policy.
  std::unique_ptr<Router> pd_p, pd_d;
  if (pd_mode) {
    pd_p = std::make_unique<Router>(make_policy("shortest_queue", probs),
                                    trace_cap);
    pd_d = std::make_unique<Router>(make_policy("shortest_queue", probs),
                                    trace_cap);
    for (auto& w : prefill_workers) pd_p->add_worker(w);
    for (auto& w : decode_workers) pd_d->add_worker(w);
    g_pd_prefill = pd_p.get();
    g_pd_decode = pd_d.get();
  }

  if (!discovery_file.empty()) {
    discovery_tick(discovery_file);  // initial sync before serving
    std::thread([discovery_file, discovery_ms]() {
      while (true) {
        std::this_thread::sleep_for(
            std::chrono::milliseconds(discovery_ms));
        discovery_tick(discovery_file);
      }
    }).detach();
  }

  if (health_ms > 0) {
    std::thread([health_ms, health_threshold]() {
      while (true) {
        for (auto& url : g_router->worker_urls())
          g_router->record_probe(url, probe_health(url), health_threshold);
        if (g_pd_prefill) {
          for (auto& url : g_pd_prefill->worker_urls())
            g_pd_prefill->record_probe(url, probe_health(url),
                                       health_threshold);
          for (auto& url : g_pd_decode->worker_urls())
            g_pd_decode->record_probe(url, probe_health(url),
                                      health_threshold);
        }
        std::this_thread::sleep_for(std::chrono::milliseconds(health_ms));
      }
    }).detach();
  }

  signal(SIGPIPE, SIG_IGN);
  int srv = ::socket(AF_INET, SOCK_STREAM, 0);
  int one = 1;
  setsockopt(srv, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  addr.sin_port = htons(port);
  if (bind(srv, (sockaddr*)&addr, sizeof(addr)) != 0) {
    perror("bind");
    return 1;
  }
  listen(srv, 512);
  fprintf(stderr, "router listening on 127.0.0.1:%d policy=%s workers=%zu\n",
          port, policy_name.c_str(), workers.size());
  while (true) {
    int fd = ::accept(srv, nullptr, nullptr);
    if (fd < 0) continue;
    std::thread(handle_conn, fd).detach();
  }
}

// Load-balancing policies.
//
// C++ re-implementation of the reference's Rust policy trait + the fork's
// custom policies (reference: sgl-router/src/policies/mod.rs:35
// LoadBalancingPolicy; random.rs, round_robin.rs, power_of_two.rs,
// shortest_queue.rs, fixed_probability.rs, cache_aware.rs:98,
// marginal_utility.rs:58 with calculate_gradient_score :107-149).
#pragma once

#include <algorithm>
#include <chrono>
#include <cmath>
#include <deque>
#include <map>
#include <memory>
#include <mutex>
#include <random>
#include <string>
#include <vector>

namespace router {

inline double now_s() {
  return std::chrono::duration<double>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

// Per-request metrics fed back to V2 policies
// (reference: sgl-router/src/policies/metrics.rs:7-27 RequestMetrics).
struct RequestMetrics {
  double start_time = 0;
  double end_time = 0;
  size_t prompt_tokens = 0;
  size_t completion_tokens = 0;
  bool ok = true;
  double latency() const { return end_time - start_time; }
};

struct WorkerState {
  std::string url;
  size_t outstanding = 0;   // in-flight requests
  size_t total = 0;         // lifetime requests
  size_t failures = 0;
  bool healthy = true;
  size_t consec_probe_failures = 0;  // active health-check state
  std::deque<RequestMetrics> window;  // sliding window for V2 policies
};

class Policy {
 public:
  virtual ~Policy() = default;
  virtual const char* name() const = 0;
  // workers: healthy subset, never empty. request_text: body (for
  // cache-aware). Returns index into workers.
  virtual size_t select(const std::vector<WorkerState*>& workers,
                        const std::string& request_text) = 0;
  virtual void on_complete(WorkerState* w, const RequestMetrics& m) {}
};

class RandomPolicy : public Policy {
 public:
  const char* name() const override { return "random"; }
  size_t select(const std::vector<WorkerState*>& ws,
                const std::string&) override {
    std::lock_guard<std::mutex> lk(mu_);
    return rng_() % ws.size();
  }

 private:
  std::mutex mu_;
  std::mt19937 rng_{std::random_device{}()};
};

class RoundRobinPolicy : public Policy {
 public:
  const char* name() const override { return "round_robin"; }
  size_t select(const std::vector<WorkerState*>& ws,
                const std::string&) override {
    return next_++ % ws.size();
  }

 private:
  std::atomic<size_t> next_{0};
};

// Two random choices, pick the less loaded (reference: power_of_two.rs).
class PowerOfTwoPolicy : public Policy {
 public:
  const char* name() const override { return "power_of_two"; }
  size_t select(const std::vector<WorkerState*>& ws,
                const std::string&) override {
    std::lock_guard<std::mutex> lk(mu_);
    size_t a = rng_() % ws.size(), b = rng_() % ws.size();
    return ws[a]->outstanding <= ws[b]->outstanding ? a : b;
  }

 private:
  std::mutex mu_;
  std::mt19937 rng_{std::random_device{}()};
};

// Fork-added (reference: shortest_queue.rs): global min outstanding.
class ShortestQueuePolicy : public Policy {
 public:
  const char* name() const override { return "shortest_queue"; }
  size_t select(const std::vector<WorkerState*>& ws,
                const std::string&) override {
    size_t best = 0;
    for (size_t i = 1; i < ws.size(); i++)
      if (ws[i]->outstanding < ws[best]->outstanding) best = i;
    return best;
  }
};

// Fork-added (reference: fixed_probability.rs): weighted random over a
// probability simplex — the knob the gradient optimizer turns.
class FixedProbabilityPolicy : public Policy {
 public:
  explicit FixedProbabilityPolicy(std::vector<double> probs)
      : probs_(std::move(probs)) {}
  const char* name() const override { return "fixed_probability"; }
  size_t select(const std::vector<WorkerState*>& ws,
                const std::string&) override {
    std::lock_guard<std::mutex> lk(mu_);
    std::uniform_real_distribution<double> u(0, 1);
    double r = u(rng_), acc = 0;
    size_t n = std::min(ws.size(), probs_.size());
    for (size_t i = 0; i < n; i++) {
      acc += probs_[i];
      if (r <= acc) return i;
    }
    return ws.size() - 1;
  }
  void set_probs(std::vector<double> p) {
    std::lock_guard<std::mutex> lk(mu_);
    probs_ = std::move(p);
  }

 private:
  std::mutex mu_;
  std::mt19937 rng_{std::random_device{}()};
  std::vector<double> probs_;
};

// Fork-added marginal-utility routing (reference: marginal_utility.rs:58):
// per-worker sliding window of RequestMetrics; split the window in half,
// estimate d(throughput)/dt and d(latency)/dt, score =
// 0.6*grad_tput - 0.4*grad_lat (calculate_gradient_score :107-149);
// fall back to least-outstanding while windows warm up.
class MarginalUtilityPolicy : public Policy {
 public:
  explicit MarginalUtilityPolicy(size_t window = 32) : window_(window) {}
  const char* name() const override { return "marginal_utility"; }

  size_t select(const std::vector<WorkerState*>& ws,
                const std::string&) override {
    size_t best = 0;
    double best_score = -1e300;
    bool any_window = false;
    for (size_t i = 0; i < ws.size(); i++) {
      if (ws[i]->window.size() >= 8) any_window = true;
    }
    if (!any_window) {
      for (size_t i = 1; i < ws.size(); i++)
        if (ws[i]->outstanding < ws[best]->outstanding) best = i;
      return best;
    }
    for (size_t i = 0; i < ws.size(); i++) {
      double s = score(*ws[i]);
      if (s > best_score) {
        best_score = s;
        best = i;
      }
    }
    return best;
  }

  void on_complete(WorkerState* w, const RequestMetrics& m) override {
    w->window.push_back(m);
    while (w->window.size() > window_) w->window.pop_front();
  }

  static double half_throughput(const std::deque<RequestMetrics>& w,
                                size_t lo, size_t hi) {
    if (hi <= lo) return 0;
    double t0 = w[lo].end_time, t1 = w[hi - 1].end_time;
    double tokens = 0;
    for (size_t i = lo; i < hi; i++) tokens += w[i].completion_tokens;
    double dt = std::max(t1 - t0, 1e-6);
    return tokens / dt;
  }

  static double half_latency(const std::deque<RequestMetrics>& w, size_t lo,
                             size_t hi) {
    if (hi <= lo) return 0;
    double s = 0;
    for (size_t i = lo; i < hi; i++) s += w[i].latency();
    return s / (hi - lo);
  }

  double score(const WorkerState& w) const {
    const auto& win = w.window;
    if (win.size() < 8) return -1e9 - double(w.outstanding);
    size_t mid = win.size() / 2;
    double tput_a = half_throughput(win, 0, mid);
    double tput_b = half_throughput(win, mid, win.size());
    double lat_a = half_latency(win, 0, mid);
    double lat_b = half_latency(win, mid, win.size());
    double dt = std::max(win.back().end_time - win.front().end_time, 1e-6);
    double grad_tput = (tput_b - tput_a) / dt;
    double grad_lat = (lat_b - lat_a) / dt;
    return 0.6 * grad_tput - 0.4 * grad_lat;
  }

 private:
  size_t window_;
};

// Cache-aware routing over an approximate (character-level) radix tree
// (reference: cache_aware.rs:98 + tree.rs:26 — multi-tenant prefix tree,
// balance-threshold fallback to shortest queue, per-tenant LRU eviction).
class ApproxRadixTree {
 public:
  struct Node {
    std::map<char, std::unique_ptr<Node>> children;
    std::string edge;
    std::map<std::string, double> tenant_access;  // worker url -> last access
  };

  // Returns (matched_len, best tenant at the deepest match).
  std::pair<size_t, std::string> prefix_match(const std::string& text) {
    std::lock_guard<std::mutex> lk(mu_);
    Node* node = &root_;
    size_t pos = 0;
    std::string best;
    while (pos < text.size()) {
      auto it = node->children.find(text[pos]);
      if (it == node->children.end()) break;
      Node* child = it->second.get();
      size_t k = 0;
      while (k < child->edge.size() && pos + k < text.size() &&
             child->edge[k] == text[pos + k])
        k++;
      if (k == 0) break;
      pos += k;
      if (k < child->edge.size()) {
        if (!child->tenant_access.empty())
          best = child->tenant_access.rbegin()->first;
        break;
      }
      node = child;
      if (!node->tenant_access.empty())
        best = newest_tenant(node);
      }
    return {pos, best};
  }

  void insert(const std::string& text, const std::string& tenant) {
    std::lock_guard<std::mutex> lk(mu_);
    Node* node = &root_;
    size_t pos = 0;
    double t = now_s();
    size_t limit = std::min(text.size(), size_t(4096));
    while (pos < limit) {
      auto it = node->children.find(text[pos]);
      if (it == node->children.end()) {
        auto child = std::make_unique<Node>();
        child->edge = text.substr(pos, limit - pos);
        child->tenant_access[tenant] = t;
        node->children[text[pos]] = std::move(child);
        size_ += limit - pos;
        return;
      }
      Node* child = it->second.get();
      size_t k = 0;
      while (k < child->edge.size() && pos + k < limit &&
             child->edge[k] == text[pos + k])
        k++;
      if (k < child->edge.size()) {
        // split edge at k
        auto lower = std::make_unique<Node>();
        lower->edge = child->edge.substr(k);
        lower->children = std::move(child->children);
        lower->tenant_access = child->tenant_access;
        child->edge = child->edge.substr(0, k);
        child->children.clear();
        child->children[lower->edge[0]] = std::move(lower);
      }
      child->tenant_access[tenant] = t;
      pos += k;
      node = child;
    }
  }

  // Evict a tenant's stalest entries (reference: tree.rs:408
  // evict_tenant_by_size). Simplified: drop tenant marks older than cutoff.
  void evict_tenant_older_than(const std::string& tenant, double cutoff) {
    std::lock_guard<std::mutex> lk(mu_);
    evict_rec(&root_, tenant, cutoff);
  }

  size_t size() const { return size_; }

 private:
  static std::string newest_tenant(Node* n) {
    std::string best;
    double bt = -1;
    for (auto& [tenant, t] : n->tenant_access)
      if (t > bt) {
        bt = t;
        best = tenant;
      }
    return best;
  }

  void evict_rec(Node* n, const std::string& tenant, double cutoff) {
    auto it = n->tenant_access.find(tenant);
    if (it != n->tenant_access.end() && it->second < cutoff)
      n->tenant_access.erase(it);
    for (auto& [c, child] : n->children) evict_rec(child.get(), tenant, cutoff);
  }

  std::mutex mu_;
  Node root_;
  size_t size_ = 0;
};

class CacheAwarePolicy : public Policy {
 public:
  // balance_abs/rel thresholds (reference: cache_aware.rs — when load is
  // imbalanced, fall back to shortest queue instead of cache affinity).
  CacheAwarePolicy(double threshold = 0.5, size_t balance_abs = 8,
                   double balance_rel = 1.5)
      : threshold_(threshold), balance_abs_(balance_abs),
        balance_rel_(balance_rel) {}
  const char* name() const override { return "cache_aware"; }

  size_t select(const std::vector<WorkerState*>& ws,
                const std::string& text) override {
    size_t mn = SIZE_MAX, mx = 0;
    for (auto* w : ws) {
      mn = std::min(mn, w->outstanding);
      mx = std::max(mx, w->outstanding);
    }
    bool imbalanced =
        mx > mn + balance_abs_ && double(mx) > balance_rel_ * double(mn + 1);
    size_t chosen;
    if (imbalanced) {
      chosen = 0;
      for (size_t i = 1; i < ws.size(); i++)
        if (ws[i]->outstanding < ws[chosen]->outstanding) chosen = i;
    } else {
      auto [matched, tenant] = tree_.prefix_match(text);
      chosen = SIZE_MAX;
      if (!tenant.empty() &&
          double(matched) >= threshold_ * double(text.size())) {
        for (size_t i = 0; i < ws.size(); i++)
          if (ws[i]->url == tenant) chosen = i;
      }
      if (chosen == SIZE_MAX) {
        // lowest outstanding as the cold-start default
        chosen = 0;
        for (size_t i = 1; i < ws.size(); i++)
          if (ws[i]->outstanding < ws[chosen]->outstanding) chosen = i;
      }
    }
    tree_.insert(text, ws[chosen]->url);
    return chosen;
  }

 private:
  double threshold_;
  size_t balance_abs_;
  double balance_rel_;
  ApproxRadixTree tree_;
};

inline std::unique_ptr<Policy> make_policy(const std::string& name,
                                           const std::vector<double>& probs) {
  if (name == "random") return std::make_unique<RandomPolicy>();
  if (name == "round_robin") return std::make_unique<RoundRobinPolicy>();
  if (name == "power_of_two") return std::make_unique<PowerOfTwoPolicy>();
  if (name == "shortest_queue") return std::make_unique<ShortestQueuePolicy>();
  if (name == "cache_aware") return std::make_unique<CacheAwarePolicy>();
  if (name == "fixed_probability")
    return std::make_unique<FixedProbabilityPolicy>(probs);
  if (name == "marginal_utility")
    return std::make_unique<MarginalUtilityPolicy>();
  return nullptr;
}

}  // namespace router

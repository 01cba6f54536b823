// Multi-agent path finding solvers: ECBS (bounded-suboptimal), CBS (optimal),
// and prioritized SIPP. Fresh TPU-era implementations of the expert-solver
// capabilities the reference consumes as prebuilt binaries
// (/root/reference/offlineExpert/{ecbs,cbs,sipp,mapf_prioritized_sipp};
// invocation contract at offlineExpert/CasesSolver.py:517-539).
//
// I/O contract (must match the reference pipelines):
//   input  YAML: map: {dimensions: [W, H], obstacles: [[x, y], ...]}
//                agents: [{name, start: [x, y], goal: [x, y]}, ...]
//   output YAML: statistics: {cost, makespan}
//                schedule: {agentN: [{x, y, t}, ...], ...}
// (written by offlineExpert/CasesGenerator.py:267-280, parsed by
//  onlineExpert/DataTransformer_local_onlineExpert.py:115-152).
#pragma once

#include <algorithm>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <map>
#include <optional>
#include <queue>
#include <set>
#include <sstream>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace mapf {

// Outcome of a solve. The reference binaries are bounded only by the
// caller's SIGALRM; our resource caps (expansion budget / wall deadline)
// must stay distinguishable from a proven "no solution" so harvest
// pipelines don't silently bias toward easy cases (the r4 verdict's
// "gave up vs infeasible" item).
enum class Status { OK, INFEASIBLE, GAVE_UP };

struct Deadline {
  std::chrono::steady_clock::time_point end;
  bool enabled = false;
  static Deadline after(double seconds) {
    Deadline d;
    if (seconds > 0) {
      d.enabled = true;
      d.end = std::chrono::steady_clock::now() +
              std::chrono::duration_cast<std::chrono::steady_clock::duration>(
                  std::chrono::duration<double>(seconds));
    }
    return d;
  }
  bool expired() const {
    return enabled && std::chrono::steady_clock::now() >= end;
  }
};

struct Problem {
  int w = 0, h = 0;
  std::vector<uint8_t> obstacle;  // w*h, row-major [x*h + y]
  std::vector<std::pair<int, int>> starts, goals;
  std::vector<std::string> names;
  bool blocked(int x, int y) const { return obstacle[x * h + y] != 0; }
  bool inside(int x, int y) const { return x >= 0 && x < w && y >= 0 && y < h; }
};

// ---------------------------------------------------------------- YAML I/O
// Minimal parser for the fixed schema above (no external yaml dependency).

inline std::optional<std::pair<int, int>> parse_pair(const std::string& s) {
  // extracts the first two integers from a "[a, b]" fragment
  int vals[2];
  int n = 0;
  const char* p = s.c_str();
  while (*p && n < 2) {
    if (isdigit(*p) || (*p == '-' && isdigit(p[1]))) {
      vals[n++] = std::strtol(p, const_cast<char**>(&p), 10);
    } else {
      ++p;
    }
  }
  if (n != 2) return std::nullopt;
  return std::make_pair(vals[0], vals[1]);
}

inline bool load_problem(const std::string& path, Problem* out) {
  std::ifstream f(path);
  if (!f) return false;
  std::string line;
  enum { NONE, OBSTACLES, AGENTS } section = NONE;
  std::pair<int, int> start{-1, -1}, goal{-1, -1};
  std::string name;
  auto flush_agent = [&]() {
    if (!name.empty() && start.first >= 0 && goal.first >= 0) {
      out->names.push_back(name);
      out->starts.push_back(start);
      out->goals.push_back(goal);
    }
    name.clear();
    start = goal = {-1, -1};
  };
  while (std::getline(f, line)) {
    if (line.find("dimensions:") != std::string::npos) {
      auto p = parse_pair(line.substr(line.find("dimensions:")));
      if (!p) return false;
      out->w = p->first;
      out->h = p->second;
      out->obstacle.assign((size_t)out->w * out->h, 0);
      continue;
    }
    if (line.find("obstacles:") != std::string::npos) { section = OBSTACLES; continue; }
    if (line.find("agents:") != std::string::npos) { section = AGENTS; continue; }
    if (section == OBSTACLES) {
      auto t = line.find("- ");
      if (t != std::string::npos) {
        auto p = parse_pair(line.substr(t));
        if (p && p->first >= 0 && p->first < out->w && p->second >= 0 &&
            p->second < out->h) {
          out->obstacle[p->first * out->h + p->second] = 1;
        }
        continue;
      }
      if (!line.empty() && line.find_first_not_of(" \t\r") != std::string::npos)
        section = NONE;  // left the obstacles block (e.g. "agents:")
      if (line.find("agents:") != std::string::npos) section = AGENTS;
      continue;
    }
    if (section == AGENTS) {
      if (line.find("name:") != std::string::npos) {
        flush_agent();
        auto pos = line.find("name:") + 5;
        std::string v = line.substr(pos);
        v.erase(0, v.find_first_not_of(" \t"));
        v.erase(v.find_last_not_of(" \t\r") + 1);
        name = v;
      } else if (line.find("start:") != std::string::npos) {
        if (auto p = parse_pair(line.substr(line.find("start:")))) start = *p;
      } else if (line.find("goal:") != std::string::npos) {
        if (auto p = parse_pair(line.substr(line.find("goal:")))) goal = *p;
      }
    }
  }
  flush_agent();
  return out->w > 0 && !out->starts.empty();
}

using Path = std::vector<std::pair<int, int>>;  // index = timestep

inline void write_solution(const std::string& path, const Problem& prob,
                           const std::vector<Path>& paths) {
  long cost = 0, makespan = 0;
  for (const auto& p : paths) {
    cost += (long)p.size() - 1;
    makespan = std::max(makespan, (long)p.size() - 1);
  }
  std::ofstream f(path);
  f << "statistics:\n  cost: " << cost << "\n  makespan: " << makespan
    << "\nschedule:\n";
  for (size_t i = 0; i < paths.size(); ++i) {
    f << "  " << prob.names[i] << ":\n";
    for (size_t t = 0; t < paths[i].size(); ++t) {
      f << "    - x: " << paths[i][t].first << "\n      y: "
        << paths[i][t].second << "\n      t: " << t << "\n";
    }
  }
}

// ---------------------------------------------------------- constraints
struct Constraints {
  // vertex: (t, x, y); edge: (t, x1,y1,x2,y2) move executed between t and t+1
  std::unordered_set<uint64_t> vertex, edge;
  static uint64_t vkey(int t, int x, int y) {
    return ((uint64_t)t << 32) | ((uint64_t)(uint16_t)x << 16) | (uint16_t)y;
  }
  static uint64_t ekey(int t, int x1, int y1, int x2, int y2) {
    return ((uint64_t)t << 40) | ((uint64_t)(uint8_t)x1 << 32) |
           ((uint64_t)(uint8_t)y1 << 24) | ((uint64_t)(uint8_t)x2 << 16) |
           ((uint64_t)(uint8_t)y2 << 8) | 1;
  }
};

static const int DX[5] = {-1, 0, 1, 0, 0};
static const int DY[5] = {0, -1, 0, 1, 0};

// Positions of an agent at arbitrary time (stays at final cell).
inline std::pair<int, int> at_time(const Path& p, int t) {
  if (p.empty()) return {-1, -1};
  return t < (int)p.size() ? p[t] : p.back();
}

// ------------------------------------------------- low level: focal A*
// Bounded-suboptimal single-agent search under vertex/edge constraints.
// OPEN is an ordered set by f; FOCAL is a heap over {f <= w * fmin} ordered
// by conflict count with the other agents' committed paths. w = 1 gives
// plain A* (used by CBS).
struct LowLevelResult {
  Path path;
  int fmin = 0;  // lower bound on this agent's cost (for ECBS high-level LB)
  bool ok = false;
};

class LowLevel {
 public:
  LowLevel(const Problem& prob, int agent, const Constraints& cons,
           const std::vector<Path>* others, double w)
      : prob_(prob), agent_(agent), cons_(cons), others_(others), w_(w) {
    goal_ = prob.goals[agent];
    // Latest constraint time involving the goal cell: the agent may not
    // settle before then.
    for (uint64_t k : cons_.vertex) {
      int t = (int)(k >> 32);
      int x = (int)((k >> 16) & 0xffff), y = (int)(k & 0xffff);
      if (x == goal_.first && y == goal_.second)
        last_goal_constraint_ = std::max(last_goal_constraint_, t);
    }
    t_max_ = prob.w * prob.h + last_goal_constraint_ + 1;
  }

  LowLevelResult run() {
    LowLevelResult res;
    auto [sx, sy] = prob_.starts[agent_];
    Node root{sx, sy, 0, 0, heur(sx, sy), 0, -1};
    nodes_.push_back(root);
    open_.insert({root.f(), -root.g, 0});
    pending_.insert({root.f(), 0});
    best_.emplace(key(sx, sy, 0), 0);

    while (!open_.empty()) {
      int fmin = std::get<0>(*open_.begin());
      double bound = w_ * fmin;
      // Admit pending nodes (ordered by f) whose f fits under the bound.
      // fmin is nondecreasing in A*, so admission is one-way.
      while (!pending_.empty() && (double)pending_.begin()->first <= bound) {
        int id = pending_.begin()->second;
        pending_.erase(pending_.begin());
        if (!nodes_[id].closed)
          focal_.push({nodes_[id].conflicts, nodes_[id].f(), -nodes_[id].g, id});
      }
      // Pop the best live focal entry; fall back to the open head (plain A*)
      // if focal is empty — only possible transiently, still admissible.
      int cur = -1;
      while (!focal_.empty()) {
        auto [d, fv, ng, id] = focal_.top();
        if (nodes_[id].closed) { focal_.pop(); continue; }
        cur = id;
        focal_.pop();
        break;
      }
      if (cur < 0) {
        cur = std::get<2>(*open_.begin());
      }
      Node n = nodes_[cur];
      nodes_[cur].closed = true;
      open_.erase({n.f(), -n.g, cur});

      if (n.x == goal_.first && n.y == goal_.second &&
          n.t >= last_goal_constraint_) {
        res.ok = true;
        // fmin at this iteration's start is a valid lower bound on the
        // optimal cost for this agent (standard focal-search invariant).
        res.fmin = fmin;
        Path rev;
        for (int id = cur; id >= 0; id = nodes_[id].parent)
          rev.push_back({nodes_[id].x, nodes_[id].y});
        std::reverse(rev.begin(), rev.end());
        res.path = std::move(rev);
        return res;
      }
      if (n.t >= t_max_) continue;
      for (int a = 0; a < 5; ++a) {
        int nx = n.x + DX[a], ny = n.y + DY[a], nt = n.t + 1;
        if (!prob_.inside(nx, ny) || prob_.blocked(nx, ny)) continue;
        if (cons_.vertex.count(Constraints::vkey(nt, nx, ny))) continue;
        if (cons_.edge.count(Constraints::ekey(n.t, n.x, n.y, nx, ny))) continue;
        uint64_t k = key(nx, ny, nt);
        int ng = n.g + 1;
        auto it = best_.find(k);
        if (it != best_.end()) {
          int old = it->second;
          if (nodes_[old].g <= ng) continue;
          // Supersede the dominated duplicate.
          if (!nodes_[old].closed) {
            open_.erase({nodes_[old].f(), -nodes_[old].g, old});
            nodes_[old].closed = true;
          }
        }
        Node nn{nx, ny, nt, ng, heur(nx, ny),
                n.conflicts + conflict_cost(n.x, n.y, nx, ny, nt), (int)cur};
        int id = (int)nodes_.size();
        nodes_.push_back(nn);
        best_[k] = id;
        open_.insert({nn.f(), -nn.g, id});
        pending_.insert({nn.f(), id});
      }
    }
    return res;
  }

 private:
  struct Node {
    int x, y, t, g, h, conflicts, parent;
    bool closed = false;
    int f() const { return g + h; }
  };

  int heur(int x, int y) const {
    return std::abs(x - goal_.first) + std::abs(y - goal_.second);
  }
  uint64_t key(int x, int y, int t) const {
    return ((uint64_t)t * prob_.w + x) * prob_.h + y;
  }
  int conflict_cost(int x, int y, int nx, int ny, int nt) const {
    if (!others_) return 0;
    int c = 0;
    for (size_t i = 0; i < others_->size(); ++i) {
      if ((int)i == agent_ || (*others_)[i].empty()) continue;
      auto other_next = at_time((*others_)[i], nt);
      if (other_next.first == nx && other_next.second == ny) ++c;
      auto other_prev = at_time((*others_)[i], nt - 1);
      if (other_prev.first == nx && other_prev.second == ny &&
          other_next.first == x && other_next.second == y)
        ++c;  // swap
    }
    return c;
  }

  const Problem& prob_;
  int agent_;
  const Constraints& cons_;
  const std::vector<Path>* others_;
  double w_;
  std::pair<int, int> goal_;
  int last_goal_constraint_ = 0;
  int t_max_ = 0;
  std::vector<Node> nodes_;
  std::set<std::tuple<int, int, int>> open_;  // (f, -g, id)
  // focal: (conflicts, f, -g, id) min-heap over {f <= w * fmin}
  using FE = std::tuple<int, int, int, int>;
  std::priority_queue<FE, std::vector<FE>, std::greater<FE>> focal_;
  std::set<std::pair<int, int>> pending_;     // (f, id) awaiting admission
  std::unordered_map<uint64_t, int> best_;    // state key -> node id
};

// ------------------------------------------------- conflicts (high level)
struct Conflict {
  enum Type { VERTEX, EDGE } type;
  int t, a1, a2, x1, y1, x2, y2;
};

inline int count_conflicts(const std::vector<Path>& paths,
                           Conflict* first = nullptr) {
  int makespan = 0, count = 0;
  for (const auto& p : paths) makespan = std::max(makespan, (int)p.size());
  for (int t = 0; t < makespan; ++t) {
    for (size_t i = 0; i < paths.size(); ++i) {
      auto pi = at_time(paths[i], t);
      for (size_t j = i + 1; j < paths.size(); ++j) {
        auto pj = at_time(paths[j], t);
        if (pi == pj) {
          if (first && count == 0)
            *first = {Conflict::VERTEX, t, (int)i, (int)j, pi.first, pi.second, 0, 0};
          ++count;
        }
        if (t + 1 < makespan) {
          auto ni = at_time(paths[i], t + 1), nj = at_time(paths[j], t + 1);
          if (pi == nj && pj == ni && pi != pj) {
            if (first && count == 0)
              *first = {Conflict::EDGE, t, (int)i, (int)j,
                        pi.first, pi.second, pj.first, pj.second};
            ++count;
          }
        }
      }
    }
  }
  return count;
}

// ------------------------------------------------- high level: (E)CBS
struct HighLevelNode {
  std::vector<Constraints> constraints;  // per agent
  std::vector<Path> paths;
  std::vector<int> fmins;
  long cost = 0, lb = 0;
  int conflicts = 0;
  int id = 0;
};

// Solves with ECBS(w); w = 1.0 is CBS. Returns empty on failure; `status`
// (optional) distinguishes a proven INFEASIBLE (open list exhausted) from
// GAVE_UP (expansion budget or wall deadline hit). max_expansions <= 0
// means unbounded (deadline-only, like the reference binaries under the
// caller's SIGALRM).
inline std::vector<Path> solve_cbs(const Problem& prob, double w,
                                   long max_expansions = 200000,
                                   Status* status = nullptr,
                                   Deadline deadline = {}) {
  auto set_status = [&](Status s) { if (status) *status = s; };
  set_status(Status::INFEASIBLE);
  size_t n = prob.starts.size();
  HighLevelNode root;
  root.constraints.resize(n);
  root.paths.resize(n);
  root.fmins.resize(n);
  for (size_t i = 0; i < n; ++i) {
    LowLevel ll(prob, (int)i, root.constraints[i], &root.paths, w);
    auto res = ll.run();
    if (!res.ok) return {};
    root.paths[i] = res.path;
    root.fmins[i] = res.fmin;
    root.cost += (long)res.path.size() - 1;
    root.lb += res.fmin;
  }
  root.conflicts = count_conflicts(root.paths);

  std::vector<HighLevelNode> nodes{root};
  // OPEN by (lb, id); FOCAL by (conflicts, cost, id) over cost <= w*lb_min;
  // PENDING ordered by cost awaits focal admission as the bound grows.
  std::set<std::tuple<long, int>> open{{root.lb, 0}};
  using FE = std::tuple<int, long, int>;
  std::priority_queue<FE, std::vector<FE>, std::greater<FE>> focal;
  std::set<std::pair<long, int>> pending{{root.cost, 0}};
  std::unordered_set<int> closed;

  long expansions = 0;

  while (!open.empty()) {
    if (max_expansions > 0 && expansions >= max_expansions) {
      set_status(Status::GAVE_UP);
      return {};
    }
    if ((expansions & 0x3f) == 0 && deadline.expired()) {
      set_status(Status::GAVE_UP);
      return {};
    }
    long lb_min = std::get<0>(*open.begin());
    double bound = w * (double)lb_min;
    while (!pending.empty() && (double)pending.begin()->first <= bound) {
      int id = pending.begin()->second;
      pending.erase(pending.begin());
      if (!closed.count(id))
        focal.push({nodes[id].conflicts, nodes[id].cost, id});
    }
    int cur = -1;
    while (!focal.empty()) {
      auto [c, cost, id] = focal.top();
      if (closed.count(id)) { focal.pop(); continue; }
      cur = id;
      focal.pop();
      break;
    }
    if (cur < 0) {
      // focal empty: fall back to the open head (lowest lower bound)
      cur = std::get<1>(*open.begin());
    }
    closed.insert(cur);
    open.erase({nodes[cur].lb, cur});
    ++expansions;
    if (getenv("MAPF_DEBUG") && expansions % 10000 == 0) {
      fprintf(stderr, "HL expansions=%ld lb_min=%ld best_conflicts=%d cost=%ld nodes=%zu\n",
              expansions, lb_min, nodes[cur].conflicts, nodes[cur].cost, nodes.size());
    }

    Conflict conf;
    if (count_conflicts(nodes[cur].paths, &conf) == 0) {
      set_status(Status::OK);
      return nodes[cur].paths;
    }
    for (int side = 0; side < 2; ++side) {
      int agent = side == 0 ? conf.a1 : conf.a2;
      HighLevelNode child = nodes[cur];
      child.id = (int)nodes.size();
      if (conf.type == Conflict::VERTEX) {
        child.constraints[agent].vertex.insert(
            Constraints::vkey(conf.t, conf.x1, conf.y1));
      } else {
        if (side == 0)
          child.constraints[agent].edge.insert(Constraints::ekey(
              conf.t, conf.x1, conf.y1, conf.x2, conf.y2));
        else
          child.constraints[agent].edge.insert(Constraints::ekey(
              conf.t, conf.x2, conf.y2, conf.x1, conf.y1));
      }
      child.cost -= (long)child.paths[agent].size() - 1;
      child.lb -= child.fmins[agent];
      LowLevel ll(prob, agent, child.constraints[agent], &child.paths, w);
      auto res = ll.run();
      if (!res.ok) continue;
      child.paths[agent] = res.path;
      child.fmins[agent] = res.fmin;
      child.cost += (long)res.path.size() - 1;
      child.lb += res.fmin;
      // Monotone lower bound: a child's constraints are a superset of the
      // parent's, so the parent's LB remains valid and usually tighter.
      child.lb = std::max(child.lb, nodes[cur].lb);
      child.conflicts = count_conflicts(child.paths);
      nodes.push_back(child);
      open.insert({child.lb, child.id});
      pending.insert({child.cost, child.id});
    }
  }
  return {};
}

// ------------------------------------------------- true SIPP low level
// Safe Interval Path Planning (Phillips & Likhachev, ICRA 2011) — the
// algorithm inside the reference's `sipp` / `mapf_prioritized_sipp`
// binaries (offlineExpert/CasesSolver.py:533-539). Dynamic obstacles (the
// committed paths of higher-priority agents, parking forever at their final
// cells) compress into per-cell SAFE INTERVALS; the search space is
// (cell, interval) instead of (cell, timestep), so long waits cost one
// expansion instead of one per tick — which is what keeps hard 40x40
// many-agent instances tractable.
constexpr int kInfTime = 1 << 28;

class Sipp {
 public:
  Sipp(const Problem& prob, const std::vector<Path>& committed) : prob_(prob) {
    const int cells = prob.w * prob.h;
    std::vector<std::vector<std::pair<int, int>>> occ(cells);
    for (const auto& p : committed) {
      for (int t = 0; t < (int)p.size(); ++t) {
        occ[cell(p[t])].push_back({t, t});
        if (t > 0 && p[t] != p[t - 1]) {
          // committed move p[t-1] -> p[t] during [t-1, t]: forbid the swap
          // move p[t] -> p[t-1] at the same transition
          forbidden_.insert(Constraints::ekey(t - 1, p[t].first, p[t].second,
                                              p[t - 1].first, p[t - 1].second));
        }
      }
      if (!p.empty())  // parks forever at its final cell
        occ[cell(p.back())].push_back({(int)p.size() - 1, kInfTime});
    }
    intervals_.resize(cells);
    for (int c = 0; c < cells; ++c) {
      auto& o = occ[c];
      std::sort(o.begin(), o.end());
      int t = 0;
      for (auto [lo, hi] : o) {
        if (lo > t) intervals_[c].push_back({t, lo - 1});
        t = std::max(t, hi >= kInfTime ? kInfTime : hi + 1);
        if (t >= kInfTime) break;
      }
      if (t < kInfTime) intervals_[c].push_back({t, kInfTime});
    }
  }

  // Timed path for `agent` (index = timestep, waits materialized), or empty.
  // The goal interval must extend to infinity (the agent parks there).
  Path plan(int agent, Status* status = nullptr,
            const Deadline& deadline = {}) const {
    auto set_status = [&](Status s) { if (status) *status = s; };
    set_status(Status::INFEASIBLE);
    const auto start = prob_.starts[agent];
    const auto goal = prob_.goals[agent];
    const int sc = cell(start), gc = cell(goal);
    int s_ivl = interval_at(sc, 0);
    if (s_ivl < 0) return {};

    struct Node {
      int c, ivl, t, h, parent;
      bool closed = false;
    };
    std::vector<Node> nodes;
    // best arrival time per (cell, interval) state
    std::unordered_map<uint64_t, int> best;
    auto skey = [](int c, int ivl) {
      return ((uint64_t)c << 16) | (uint32_t)ivl;
    };
    // (f, t, id) min-heap; unit costs so g == arrival time t
    using QE = std::tuple<int, int, int>;
    std::priority_queue<QE, std::vector<QE>, std::greater<QE>> open;
    nodes.push_back({sc, s_ivl, 0, manhattan(start, goal), -1});
    best[skey(sc, s_ivl)] = 0;
    open.push({nodes[0].h, 0, 0});

    long expansions = 0;
    while (!open.empty()) {
      if (((++expansions) & 0xff) == 0 && deadline.expired()) {
        set_status(Status::GAVE_UP);
        return {};
      }
      auto [f, t, id] = open.top();
      open.pop();
      (void)f; (void)t;
      if (nodes[id].closed ||
          best.at(skey(nodes[id].c, nodes[id].ivl)) != id)
        continue;  // closed or superseded by a better arrival
      nodes[id].closed = true;
      const Node n = nodes[id];
      if (n.c == gc && intervals_[gc][n.ivl].second >= kInfTime) {
        set_status(Status::OK);
        return reconstruct(nodes, id);
      }
      const int hi = intervals_[n.c][n.ivl].second;
      const int cx = n.c / prob_.h, cy = n.c % prob_.h;
      for (int a = 0; a < 4; ++a) {
        const int nx = cx + DX[a], ny = cy + DY[a];
        if (!prob_.inside(nx, ny) || prob_.blocked(nx, ny)) continue;
        const int nc = nx * prob_.h + ny;
        // departure in [n.t, hi] => arrival in [n.t + 1, hi + 1]
        const int a_lo = n.t + 1;
        const int a_hi = hi >= kInfTime ? kInfTime : hi + 1;
        for (int k = 0; k < (int)intervals_[nc].size(); ++k) {
          auto [lo_n, hi_n] = intervals_[nc][k];
          if (lo_n > a_hi || hi_n < a_lo) continue;
          int t2 = std::max(a_lo, lo_n);
          const int t2_max = std::min(a_hi, hi_n);
          // bump past sparse swap conflicts (each committed agent
          // contributes at most one per transition time)
          while (t2 <= t2_max &&
                 forbidden_.count(Constraints::ekey(t2 - 1, cx, cy, nx, ny)))
            ++t2;
          if (t2 > t2_max) continue;
          const uint64_t key = skey(nc, k);
          auto it = best.find(key);
          if (it != best.end() && nodes[it->second].t <= t2) continue;
          const int nid = (int)nodes.size();
          nodes.push_back({nc, k, t2,
                           manhattan({nx, ny}, goal), id});
          best[key] = nid;
          open.push({t2 + nodes[nid].h, t2, nid});
        }
      }
    }
    return {};
  }

 private:
  int cell(std::pair<int, int> p) const { return p.first * prob_.h + p.second; }
  static int manhattan(std::pair<int, int> a, std::pair<int, int> b) {
    return std::abs(a.first - b.first) + std::abs(a.second - b.second);
  }
  int interval_at(int c, int t) const {
    for (int k = 0; k < (int)intervals_[c].size(); ++k)
      if (intervals_[c][k].first <= t && t <= intervals_[c][k].second) return k;
    return -1;
  }
  template <typename Nodes>
  Path reconstruct(const Nodes& nodes, int id) const {
    // walk parents; materialize waits between parent arrival and departure
    std::vector<std::pair<int, int>> cells;
    std::vector<int> times;
    for (; id >= 0; id = nodes[id].parent) {
      cells.push_back({nodes[id].c / prob_.h, nodes[id].c % prob_.h});
      times.push_back(nodes[id].t);
    }
    std::reverse(cells.begin(), cells.end());
    std::reverse(times.begin(), times.end());
    Path out;
    for (size_t i = 0; i < cells.size(); ++i) {
      // wait at previous cell until one step before this arrival
      while ((int)out.size() < times[i]) out.push_back(out.back());
      out.push_back(cells[i]);
    }
    return out;
  }

  const Problem& prob_;
  std::vector<std::vector<std::pair<int, int>>> intervals_;  // per cell
  std::unordered_set<uint64_t> forbidden_;  // swap transitions
};

// ------------------------------------------------- prioritized SIPP
// Plans agents one at a time in index order; each agent runs a true SIPP
// search against the committed paths of earlier agents (capability match
// for the reference's `mapf_prioritized_sipp` binary). Incomplete by
// nature (a bad ordering can block later agents) — that is reference
// behavior, reported as INFEASIBLE.
inline std::vector<Path> solve_prioritized(const Problem& prob,
                                           Status* status = nullptr,
                                           Deadline deadline = {}) {
  size_t n = prob.starts.size();
  std::vector<Path> committed;
  std::vector<Path> result(n);
  for (size_t i = 0; i < n; ++i) {
    Sipp sipp(prob, committed);
    Status st = Status::INFEASIBLE;
    auto path = sipp.plan((int)i, &st, deadline);
    if (path.empty()) {
      if (status) *status = st;
      return {};
    }
    result[i] = path;
    committed.push_back(path);
  }
  if (status) *status = Status::OK;
  return result;
}

// ------------------------------------------------- single-agent SIPP
// Per-agent unconstrained shortest path (the reference's standalone `sipp`
// binary utility): SIPP with no dynamic obstacles degenerates to A*.
inline std::vector<Path> solve_single(const Problem& prob,
                                      Status* status = nullptr) {
  Sipp sipp(prob, {});
  std::vector<Path> result;
  for (size_t i = 0; i < prob.starts.size(); ++i) {
    auto path = sipp.plan((int)i, status);
    if (path.empty()) return {};
    result.push_back(path);
  }
  if (status) *status = Status::OK;
  return result;
}

}  // namespace mapf

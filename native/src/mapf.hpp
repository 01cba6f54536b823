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

// Solves with ECBS(w); w = 1.0 is CBS. Returns empty on failure.
inline std::vector<Path> solve_cbs(const Problem& prob, double w,
                                   long max_expansions = 200000) {
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

  while (!open.empty() && expansions < max_expansions) {
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

// ------------------------------------------------- prioritized SIPP
// Plans agents one at a time in index order; each agent avoids the committed
// paths of earlier agents (treated as moving obstacles that finally park at
// their goals forever). Uses the time-expanded A* with dynamic-obstacle
// checks (equivalent search space to SIPP on these short horizons).
inline std::vector<Path> solve_prioritized(const Problem& prob) {
  size_t n = prob.starts.size();
  std::vector<Path> committed;
  std::vector<Path> result(n);
  for (size_t i = 0; i < n; ++i) {
    // Build constraints from committed paths: occupied cells & swaps.
    int horizon = prob.w * prob.h * 2;
    for (const auto& p : committed) horizon = std::max(horizon, 2 * (int)p.size());
    Constraints cons;
    for (const auto& p : committed) {
      for (int t = 0; t <= horizon; ++t) {
        auto c = at_time(p, t);
        cons.vertex.insert(Constraints::vkey(t, c.first, c.second));
        if (t > 0) {
          auto prev = at_time(p, t - 1);
          if (prev != c)  // swap constraint: entering prev while it moves to c
            cons.edge.insert(
                Constraints::ekey(t - 1, c.first, c.second, prev.first, prev.second));
        }
      }
    }
    LowLevel ll(prob, (int)i, cons, nullptr, 1.0);
    auto res = ll.run();
    if (!res.ok) return {};
    result[i] = res.path;
    committed.push_back(res.path);
  }
  return result;
}

// ------------------------------------------------- single-agent shortest path
inline std::vector<Path> solve_single(const Problem& prob) {
  Constraints none;
  std::vector<Path> result;
  for (size_t i = 0; i < prob.starts.size(); ++i) {
    LowLevel ll(prob, (int)i, none, nullptr, 1.0);
    auto res = ll.run();
    if (!res.ok) return {};
    result.push_back(res.path);
  }
  return result;
}

}  // namespace mapf

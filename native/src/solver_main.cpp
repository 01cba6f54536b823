// Unified CLI for the MAPF expert solvers. The binary's behavior follows its
// invocation name (argv[0]) or an explicit --algo flag, so one build serves
// the four reference entry points:
//   ecbs -i in.yaml -o out.yaml -w 1.1       (bounded-suboptimal)
//   cbs  -i in.yaml -o out.yaml              (optimal)
//   mapf_prioritized_sipp -i in.yaml -o out.yaml
//   sipp -i in.yaml -o out.yaml              (single-agent / independent)
// matching offlineExpert/CasesSolver.py:517-539.
//
// Resource bounds (framework additions over the reference binaries, which
// are bounded only by the caller's SIGALRM):
//   -t / --timeout SECONDS    internal wall-clock deadline (0 = none)
//   --max-expansions N        (E)CBS high-level expansion budget
//                             (0 = unbounded; default 200000)
// Exit codes: 0 = solved, 1 = proven infeasible (search space exhausted or
// prioritized ordering blocked), 3 = GAVE UP (resource bound hit — the case
// may still be solvable), 2 = usage/parse error. The distinction keeps
// harvest pipelines from silently biasing toward easy cases.
#include "mapf.hpp"

#include <iostream>

int main(int argc, char** argv) {
  std::string input, output, algo;
  double w = 1.1;
  double timeout = 0.0;
  long max_expansions = 200000;

  std::string prog = argv[0];
  auto slash = prog.find_last_of('/');
  if (slash != std::string::npos) prog = prog.substr(slash + 1);
  if (prog.find("ecbs") != std::string::npos) algo = "ecbs";
  else if (prog.find("prioritized") != std::string::npos) algo = "prioritized";
  else if (prog.find("cbs") != std::string::npos) algo = "cbs";
  else if (prog.find("sipp") != std::string::npos) algo = "sipp";

  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> std::string { return i + 1 < argc ? argv[++i] : ""; };
    if (a == "-i" || a == "--input") input = next();
    else if (a == "-o" || a == "--output") output = next();
    else if (a == "-w" || a == "--suboptimality") w = atof(next().c_str());
    else if (a == "-t" || a == "--timeout") timeout = atof(next().c_str());
    else if (a == "--max-expansions") max_expansions = atol(next().c_str());
    else if (a == "--algo") algo = next();
  }
  if (input.empty() || output.empty() || algo.empty()) {
    std::cerr << "usage: " << argv[0]
              << " -i input.yaml -o output.yaml [-w 1.1] [-t seconds]"
                 " [--max-expansions N]"
                 " [--algo ecbs|cbs|prioritized|sipp]\n";
    return 2;
  }

  mapf::Problem prob;
  if (!mapf::load_problem(input, &prob)) {
    std::cerr << "failed to parse " << input << "\n";
    return 2;
  }

  mapf::Deadline deadline = mapf::Deadline::after(timeout);
  mapf::Status status = mapf::Status::INFEASIBLE;
  std::vector<mapf::Path> paths;
  if (algo == "ecbs")
    paths = mapf::solve_cbs(prob, w, max_expansions, &status, deadline);
  else if (algo == "cbs")
    paths = mapf::solve_cbs(prob, 1.0, max_expansions, &status, deadline);
  else if (algo == "prioritized")
    paths = mapf::solve_prioritized(prob, &status, deadline);
  else if (algo == "sipp")
    paths = mapf::solve_single(prob, &status);
  else { std::cerr << "unknown algo " << algo << "\n"; return 2; }

  if (paths.empty()) {
    if (status == mapf::Status::GAVE_UP) {
      std::cerr << "planning GAVE UP (resource bound hit)\n";
      return 3;
    }
    std::cerr << "planning NOT successful\n";
    return 1;
  }
  mapf::write_solution(output, prob, paths);
  std::cout << "planning successful\n";
  return 0;
}

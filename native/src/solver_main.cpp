// Unified CLI for the MAPF expert solvers. The binary's behavior follows its
// invocation name (argv[0]) or an explicit --algo flag, so one build serves
// the four reference entry points:
//   ecbs -i in.yaml -o out.yaml -w 1.1       (bounded-suboptimal)
//   cbs  -i in.yaml -o out.yaml              (optimal)
//   mapf_prioritized_sipp -i in.yaml -o out.yaml
//   sipp -i in.yaml -o out.yaml              (single-agent / independent)
// matching offlineExpert/CasesSolver.py:517-539.
#include "mapf.hpp"

#include <iostream>

int main(int argc, char** argv) {
  std::string input, output, algo;
  double w = 1.1;

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
    else if (a == "--algo") algo = next();
  }
  if (input.empty() || output.empty() || algo.empty()) {
    std::cerr << "usage: " << argv[0]
              << " -i input.yaml -o output.yaml [-w 1.1] [--algo ecbs|cbs|prioritized|sipp]\n";
    return 2;
  }

  mapf::Problem prob;
  if (!mapf::load_problem(input, &prob)) {
    std::cerr << "failed to parse " << input << "\n";
    return 2;
  }

  std::vector<mapf::Path> paths;
  if (algo == "ecbs") paths = mapf::solve_cbs(prob, w);
  else if (algo == "cbs") paths = mapf::solve_cbs(prob, 1.0);
  else if (algo == "prioritized") paths = mapf::solve_prioritized(prob);
  else if (algo == "sipp") paths = mapf::solve_single(prob);
  else { std::cerr << "unknown algo " << algo << "\n"; return 2; }

  if (paths.empty()) {
    std::cerr << "planning NOT successful\n";
    return 1;
  }
  mapf::write_solution(output, prob, paths);
  std::cout << "planning successful\n";
  return 0;
}

from .solvers import ExpertSolver, SolverResult, solve_case
from .mapgen import generate_map, random_start_goal_pairs
from .cases import CasePool, dataset_dir, generate_case_pool, generate_dataset, solve_and_save
from .transform import (CaseRecord, load_record, load_reference_mat,
                        record_from_solution, save_record)
from .dataset import Batch, CaseDataset, load_split

__all__ = [
    "ExpertSolver",
    "SolverResult",
    "solve_case",
    "generate_map",
    "random_start_goal_pairs",
    "CasePool",
    "dataset_dir",
    "generate_case_pool",
    "generate_dataset",
    "solve_and_save",
    "CaseRecord",
    "load_record",
    "load_reference_mat",
    "record_from_solution",
    "save_record",
    "Batch",
    "CaseDataset",
    "load_split",
]

from .graph_filter import graph_filter, graph_filter_sparse
from .gso import (
    pairwise_distances,
    adjacency_from_positions,
    is_connected,
    normalize_adjacency,
    compute_gso,
    grow_radius_until_connected,
)
from .fov import render_fov, FOV, FOV_WIDTH, WINDOW

__all__ = [
    "graph_filter",
    "graph_filter_sparse",
    "pairwise_distances",
    "adjacency_from_positions",
    "is_connected",
    "normalize_adjacency",
    "compute_gso",
    "grow_radius_until_connected",
    "render_fov",
    "FOV",
    "FOV_WIDTH",
    "WINDOW",
]

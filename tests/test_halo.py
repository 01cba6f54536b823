"""Strip-partitioned halo-exchange filter vs the dense oracle.

The halo path must be *exact* (not approximate) whenever the strip
invariant holds: any two agents within the communication radius are at
most one strip apart. These tests construct swarms that satisfy (and one
that violates) the invariant and compare against the unsharded dense
filter from ops.graph_filter + ops.gso.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gnn_pathplanning_tpu.ops import compute_gso, graph_filter
from gnn_pathplanning_tpu.parallel import (halo_graph_filter_sharded,
                                           make_mesh, strip_halo_exact,
                                           strip_partition)


@pytest.fixture(scope="module")
def mesh_agents():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8, ("agents",))


def wide_swarm(rng, n, width, height):
    """Positions spread along x so 8 equal-count strips are wide."""
    pos = np.stack([rng.uniform(0, width, n),
                    rng.uniform(0, height, n)], axis=1).astype(np.float32)
    return pos[strip_partition(pos)]


def dense_oracle(x, pos, r, w, b):
    s, _, _ = compute_gso(jnp.asarray(pos), jnp.float32(r))
    return np.asarray(graph_filter(jnp.asarray(x)[None], s[None],
                                   jnp.asarray(w), jnp.asarray(b))[0])


def test_strip_halo_exact_checker():
    # 4 agents in 2 strips of 2: ends are far apart -> exact
    pos = np.array([[0, 0], [1, 0], [10, 0], [11, 0]], np.float32)
    assert strip_halo_exact(pos, 2, radius=3.0)
    # radius large enough to couple strip 0 and strip 2 -> not exact
    # (strip 0 ends at x=1, strip 2 starts at x=4; 3.5 > 3)
    pos4 = np.array([[0, 0], [1, 0], [2, 0], [3, 0],
                     [4, 0], [5, 0], [6, 0], [7, 0]], np.float32)
    assert not strip_halo_exact(pos4, 4, radius=3.5)


def test_halo_filter_matches_dense(mesh_agents):
    rng = np.random.RandomState(0)
    n, g, f, k, r = 64, 16, 8, 3, 3.0
    pos = wide_swarm(rng, n, width=80.0, height=6.0)
    assert strip_halo_exact(pos, 8, r), "test swarm must satisfy invariant"
    x = rng.randn(n, g).astype(np.float32)
    w = rng.randn(k, g, f).astype(np.float32) * 0.1
    b = rng.randn(f).astype(np.float32)

    got = halo_graph_filter_sharded(mesh_agents, jnp.asarray(x),
                                    jnp.asarray(pos), r, jnp.asarray(w),
                                    jnp.asarray(b))
    want = dense_oracle(x, pos, r, w, b)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_halo_filter_isolated_agents(mesh_agents):
    """Zero-degree agents keep the zero-degree guard semantics."""
    rng = np.random.RandomState(1)
    n, g, f, k, r = 32, 8, 4, 2, 2.0
    # clusters far apart in x + a few isolated agents
    pos = wide_swarm(rng, n, width=200.0, height=3.0)
    assert strip_halo_exact(pos, 8, r)
    x = rng.randn(n, g).astype(np.float32)
    w = rng.randn(k, g, f).astype(np.float32)
    got = halo_graph_filter_sharded(mesh_agents, jnp.asarray(x),
                                    jnp.asarray(pos), r, jnp.asarray(w),
                                    None)
    want = dense_oracle(x, pos, r, w, np.zeros(f, np.float32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_halo_filter_no_wraparound(mesh_agents):
    """First/last strips must not exchange features with each other even
    when their agents would be 'close' under a periodic reading of x."""
    rng = np.random.RandomState(2)
    n, g, f, k, r = 16, 4, 4, 3, 1.5
    # two clusters at the extremes, each spread wide enough that every
    # strip inside a cluster spans more than r
    pos = np.zeros((n, 2), np.float32)
    pos[: n // 2, 0] = np.linspace(0, 8, n // 2) + rng.uniform(0, .2, n // 2)
    pos[n // 2:, 0] = np.linspace(92, 100, n // 2) + rng.uniform(0, .2, n // 2)
    pos[:, 1] = rng.uniform(0, 1, n)
    pos = pos[strip_partition(pos)]
    assert strip_halo_exact(pos, 8, r)
    x = rng.randn(n, g).astype(np.float32)
    w = rng.randn(k, g, f).astype(np.float32)
    got = halo_graph_filter_sharded(mesh_agents, jnp.asarray(x),
                                    jnp.asarray(pos), r, jnp.asarray(w),
                                    None)
    want = dense_oracle(x, pos, r, w, np.zeros(f, np.float32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_halo_filter_single_device():
    mesh1 = make_mesh(1, ("agents",))
    rng = np.random.RandomState(3)
    n, g, f, k, r = 16, 4, 4, 3, 3.0
    pos = wide_swarm(rng, n, width=20.0, height=5.0)
    x = rng.randn(n, g).astype(np.float32)
    w = rng.randn(k, g, f).astype(np.float32)
    got = halo_graph_filter_sharded(mesh1, jnp.asarray(x), jnp.asarray(pos),
                                    r, jnp.asarray(w), None)
    want = dense_oracle(x, pos, r, w, np.zeros(f, np.float32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_halo_filter_indivisible_agents_error(mesh_agents):
    x = jnp.zeros((12, 4))  # 12 agents on 8 devices
    pos = jnp.zeros((12, 2))
    w = jnp.zeros((2, 4, 4))
    with pytest.raises(ValueError, match="divide evenly"):
        halo_graph_filter_sharded(mesh_agents, x, pos, 2.0, w, None)


def test_halo_filter_geometric_matches_dense(mesh_agents):
    """geometric=True replaces the dense [3n, n] strip matrix with the
    fused Pallas kernels (interpret mode); must stay exact under the strip
    invariant, with and without the compacted grid (cap)."""
    rng = np.random.RandomState(3)
    n, g, f, k, r = 64, 16, 8, 3, 3.0
    pos = np.stack([rng.uniform(0, 80.0, n),
                    rng.uniform(0, 6.0, n)], axis=1).astype(np.float32)
    pos = pos[strip_partition(pos)]
    assert strip_halo_exact(pos, 8, r)
    x = rng.randn(n, g).astype(np.float32)
    w = rng.randn(k, g, f).astype(np.float32) * 0.1
    b = rng.randn(f).astype(np.float32)
    want = dense_oracle(x, pos, r, w, b)

    for cap in (None, 1):  # cap=1: exercises compact kernels + fallback
        got = halo_graph_filter_sharded(mesh_agents, jnp.asarray(x),
                                        jnp.asarray(pos), r, jnp.asarray(w),
                                        jnp.asarray(b), geometric=True,
                                        cap=cap, interpret=True)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=2e-4, atol=2e-4)

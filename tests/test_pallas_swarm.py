"""Swarm-scale fused geometric graph-conv kernels vs the dense oracle.

Runs in pallas interpret mode on CPU; the same code compiles on TPU.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gnn_pathplanning_tpu.ops import compute_gso, graph_filter
from gnn_pathplanning_tpu.ops import pallas_swarm as ps


def _swarm(rng, n, world=200):
    # unique integer positions
    cells = rng.choice(world * world, size=n, replace=False)
    return np.stack([cells // world, cells % world], -1).astype(np.float32)


def test_block_pair_mask_excludes_far_blocks(rng):
    n = 2 * ps.BLOCK
    pos = np.zeros((n, 2), np.float32)
    pos[:ps.BLOCK] = rng.randint(0, 20, (ps.BLOCK, 2))
    pos[ps.BLOCK:] = rng.randint(1000, 1020, (ps.BLOCK, 2))
    valid = np.ones(n, np.float32)
    mask = np.asarray(ps.block_pair_mask(jnp.array(pos), 6.0, jnp.array(valid)))
    assert mask[0, 0] == 1 and mask[1, 1] == 1
    assert mask[0, 1] == 0 and mask[1, 0] == 0


def test_degrees_match_dense(rng):
    n = 200
    pos = _swarm(rng, n, world=60)
    pos_p, _, valid = ps.pad_agents(jnp.array(pos))
    mask = ps.block_pair_mask(pos_p, 8.0, valid)
    deg = np.asarray(ps.geometric_degrees(pos_p, 8.0, valid, mask,
                                          interpret=True))[:n]
    d = np.sqrt(((pos[:, None] - pos[None]) ** 2).sum(-1))
    w = (d < 8.0).astype(np.float32)
    np.fill_diagonal(w, 0)
    np.testing.assert_allclose(deg, w.sum(1), atol=1e-5)


def test_spmm_matches_dense(rng):
    n, g = 300, 8
    pos = _swarm(rng, n, world=80)
    x = rng.randn(n, g).astype(np.float32)
    pos_p, x_p, valid = ps.pad_agents(jnp.array(pos), jnp.array(x))
    mask = ps.block_pair_mask(pos_p, 10.0, valid)
    z = np.asarray(ps.geometric_spmm(pos_p, x_p, 10.0, valid, mask,
                                     interpret=True))[:n]
    d = np.sqrt(((pos[:, None] - pos[None]) ** 2).sum(-1))
    w = (d < 10.0).astype(np.float32)
    np.fill_diagonal(w, 0)
    np.testing.assert_allclose(z, w.T @ x, rtol=1e-4, atol=1e-4)


def test_filter_matches_dense_pipeline(rng):
    n, g, f, k = 260, 4, 6, 3
    pos = _swarm(rng, n, world=70)
    x = rng.randn(n, g).astype(np.float32)
    w = rng.randn(k, g, f).astype(np.float32)
    b = rng.randn(f).astype(np.float32)
    radius = 9.0

    s, _, _ = compute_gso(jnp.array(pos), jnp.float32(radius), grow=False)
    want = np.asarray(graph_filter(jnp.array(x[None]), s[None],
                                   jnp.array(w), jnp.array(b)))[0]

    # spatial sort (production layout) + pad, then unsort
    perm = np.asarray(ps.spatial_sort(jnp.array(pos), cell=radius))
    pos_p, x_p, valid = ps.pad_agents(jnp.array(pos[perm]),
                                      jnp.array(x[perm]))
    got_sorted = np.asarray(ps.graph_filter_geometric(
        pos_p, x_p, radius, jnp.array(w), jnp.array(b), valid,
        interpret=True))[:n]
    got = np.empty_like(got_sorted)
    got[perm] = got_sorted
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_padding_lanes_are_inert(rng):
    n, g = 100, 4
    pos = _swarm(rng, n, world=40)
    x = rng.randn(n, g).astype(np.float32)
    w = rng.randn(2, g, 3).astype(np.float32)
    pos_p, x_p, valid = ps.pad_agents(jnp.array(pos), jnp.array(x))
    out = np.asarray(ps.graph_filter_geometric(pos_p, x_p, 6.0, jnp.array(w),
                                               None, valid, interpret=True))
    assert np.all(out[n:] == 0)


def test_compact_spmm_matches_dense_grid(rng):
    """Compacted scalar-prefetch grid == exhaustive grid (interpret)."""
    n, g, r = 500, 16, 8.0
    pos = _swarm(rng, n, world=120)
    order = np.asarray(ps.spatial_sort(jnp.asarray(pos), cell=r))
    pos = pos[order]
    pos_p, x_p, valid = ps.pad_agents(jnp.asarray(pos),
                                      jnp.asarray(rng.rand(n, g)
                                                  .astype(np.float32)))
    mask = ps.block_pair_mask(pos_p, r, valid)
    cap = int(np.asarray(mask).sum(axis=0).max())
    idx, count, overflow = ps.compact_sender_index(mask, cap)
    assert not bool(overflow)

    want = np.asarray(ps.geometric_spmm(pos_p, x_p, r, valid, mask,
                                        interpret=True))
    got = np.asarray(ps.geometric_spmm_compact(pos_p, x_p, r, valid, idx,
                                               count, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    dw = np.asarray(ps.geometric_degrees(pos_p, r, valid, mask,
                                         interpret=True))
    dg = np.asarray(ps.geometric_degrees_compact(pos_p, r, valid, idx,
                                                 count, interpret=True))
    np.testing.assert_allclose(dg, dw, rtol=1e-6, atol=1e-6)


def test_compact_filter_with_overflow_fallback(rng):
    """cap smaller than the true max sender count must flag overflow and
    graph_filter_geometric(cap=...) must still be exact via the fallback."""
    n, g, f, k, r = 300, 8, 4, 3, 10.0
    pos = _swarm(rng, n, world=50)  # dense swarm: many active pairs
    order = np.asarray(ps.spatial_sort(jnp.asarray(pos), cell=r))
    pos = pos[order]
    x = rng.rand(n, g).astype(np.float32)
    w = rng.randn(k, g, f).astype(np.float32) * 0.1
    pos_p, x_p, valid = ps.pad_agents(jnp.asarray(pos), jnp.asarray(x))
    mask = ps.block_pair_mask(pos_p, r, valid)
    true_max = int(np.asarray(mask).sum(axis=0).max())
    assert true_max >= 2, "test swarm must couple blocks"

    _, _, overflow = ps.compact_sender_index(mask, true_max - 1)
    assert bool(overflow)

    s, _, _ = compute_gso(jnp.asarray(pos), jnp.float32(r))
    want = np.asarray(graph_filter(jnp.asarray(x)[None], s[None],
                                   jnp.asarray(w))[0])
    for cap in (true_max - 1, true_max):  # overflow path and compact path
        got = np.asarray(ps.graph_filter_geometric(
            pos_p, x_p, r, jnp.asarray(w), valid=valid, interpret=True,
            cap=cap))[:n]
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("s_step", [2, 3, 4])
def test_compact_spmm_multi_sender_matches(rng, s_step):
    """Multi-sender-per-step compact grid == single-sender grid, exactly
    (same f32 adds in the same receiver-block order)."""
    n, g, r = 500, 16, 8.0
    pos = _swarm(rng, n, world=120)
    order = np.asarray(ps.spatial_sort(jnp.asarray(pos), cell=r))
    pos = pos[order]
    pos_p, x_p, valid = ps.pad_agents(jnp.asarray(pos),
                                      jnp.asarray(rng.rand(n, g)
                                                  .astype(np.float32)))
    mask = ps.block_pair_mask(pos_p, r, valid)
    cap = int(np.asarray(mask).sum(axis=0).max())
    idx, count, overflow = ps.compact_sender_index(mask, cap)
    assert not bool(overflow)

    want = np.asarray(ps.geometric_spmm_compact(pos_p, x_p, r, valid, idx,
                                                count, interpret=True))
    got = np.asarray(ps.geometric_spmm_compact(
        pos_p, x_p, r, valid, idx, count, interpret=True,
        senders_per_step=s_step))
    np.testing.assert_array_equal(got, want)


def test_compact_spmm_bf16_features(rng):
    """bf16 features: 0/1 weights are exact, accumulation is f32, so the
    only error is the bf16 rounding of x itself."""
    n, g, r = 400, 32, 8.0
    pos = _swarm(rng, n, world=110)
    order = np.asarray(ps.spatial_sort(jnp.asarray(pos), cell=r))
    pos = pos[order]
    x = rng.rand(n, g).astype(np.float32)
    pos_p, x_p, valid = ps.pad_agents(jnp.asarray(pos), jnp.asarray(x))
    mask = ps.block_pair_mask(pos_p, r, valid)
    cap = int(np.asarray(mask).sum(axis=0).max())
    idx, count, overflow = ps.compact_sender_index(mask, cap)
    assert not bool(overflow)

    want = np.asarray(ps.geometric_spmm_compact(pos_p, x_p, r, valid, idx,
                                                count, interpret=True))
    got = np.asarray(ps.geometric_spmm_compact(
        pos_p, x_p.astype(jnp.bfloat16), r, valid, idx, count,
        interpret=True, senders_per_step=2))
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)


def test_pad_idx_multi():
    idx = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    out = np.asarray(ps._pad_idx_multi(idx, 2))
    np.testing.assert_array_equal(out, [[0, 1, 2, 2], [3, 4, 5, 5]])
    np.testing.assert_array_equal(np.asarray(ps._pad_idx_multi(idx, 3)),
                                  np.asarray(idx))


def test_compact_spmm_mxu_weights_matches(rng):
    """Homogeneous-coordinate MXU weight path == VPU weight path exactly
    (interpret mode; integer grid coordinates keep every product exact)."""
    n, g, r = 500, 16, 8.0
    pos = _swarm(rng, n, world=120)
    order = np.asarray(ps.spatial_sort(jnp.asarray(pos), cell=r))
    pos = pos[order]
    pos_p, x_p, valid = ps.pad_agents(jnp.asarray(pos),
                                      jnp.asarray(rng.rand(n, g)
                                                  .astype(np.float32)))
    mask = ps.block_pair_mask(pos_p, r, valid)
    cap = int(np.asarray(mask).sum(axis=0).max())
    idx, count, overflow = ps.compact_sender_index(mask, cap)
    assert not bool(overflow)

    want = np.asarray(ps.geometric_spmm_compact(pos_p, x_p, r, valid, idx,
                                                count, interpret=True))
    got = np.asarray(ps.geometric_spmm_compact(pos_p, x_p, r, valid, idx,
                                               count, interpret=True,
                                               mxu_weights=True))
    # weights are bit-identical 0/1; the matmul runs transposed, so only
    # accumulation order differs -> ulp-level tolerance
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    dw = np.asarray(ps.geometric_degrees_compact(pos_p, r, valid, idx,
                                                 count, interpret=True))
    dg = np.asarray(ps.geometric_degrees_compact(pos_p, r, valid, idx,
                                                 count, interpret=True,
                                                 mxu_weights=True))
    np.testing.assert_array_equal(dg, dw)


def test_compact_mxu_weights_rectangular(rng):
    """MXU-weight path on the rectangular sender x receiver form (the
    sharded rollout's shape) == VPU path exactly."""
    n, g, r = 384, 8, 7.0
    pos = _swarm(rng, n, world=100)
    order = np.asarray(ps.spatial_sort(jnp.asarray(pos), cell=r))
    pos = pos[order]
    pos_p, x_p, valid = ps.pad_agents(jnp.asarray(pos),
                                      jnp.asarray(rng.rand(n, g)
                                                  .astype(np.float32)))
    recv_p, _, recv_valid = ps.pad_agents(jnp.asarray(pos[:130]))
    mask = ps.block_pair_mask(pos_p, r, valid, recv_p, recv_valid)
    cap = int(np.asarray(mask).sum(axis=0).max())
    idx, count, overflow = ps.compact_sender_index(mask, cap)
    assert not bool(overflow)

    want = np.asarray(ps.geometric_spmm_compact(
        pos_p, x_p, r, valid, idx, count, interpret=True,
        recv_pos=recv_p, recv_valid=recv_valid))
    got = np.asarray(ps.geometric_spmm_compact(
        pos_p, x_p, r, valid, idx, count, interpret=True,
        recv_pos=recv_p, recv_valid=recv_valid, mxu_weights=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    dw = np.asarray(ps.geometric_degrees_compact(
        pos_p, r, valid, idx, count, interpret=True,
        recv_pos=recv_p, recv_valid=recv_valid))
    dg = np.asarray(ps.geometric_degrees_compact(
        pos_p, r, valid, idx, count, interpret=True,
        recv_pos=recv_p, recv_valid=recv_valid, mxu_weights=True))
    np.testing.assert_array_equal(dg, dw)


def test_graph_filter_geometric_mxu_weights(rng):
    """Full K-tap filter through the MXU-weight compact grid matches the
    dense positions oracle."""
    from gnn_pathplanning_tpu.ops.graph_filter import graph_filter
    from gnn_pathplanning_tpu.ops.gso import (adjacency_from_positions,
                                              normalize_adjacency)
    n, g, f, r = 400, 8, 8, 7.0
    pos = _swarm(rng, n, world=110)
    order = np.asarray(ps.spatial_sort(jnp.asarray(pos), cell=r))
    pos = pos[order]
    x = rng.randn(n, g).astype(np.float32)
    w = rng.randn(3, g, f).astype(np.float32) * 0.3
    pos_p, x_p, valid = ps.pad_agents(jnp.asarray(pos), jnp.asarray(x))
    mask = ps.block_pair_mask(pos_p, r, valid)
    cap = int(np.asarray(mask).sum(axis=0).max())

    gso = normalize_adjacency(adjacency_from_positions(jnp.asarray(pos), r))
    want = np.asarray(graph_filter(jnp.asarray(x)[None], gso[None],
                                   jnp.asarray(w), None))[0]
    got = np.asarray(ps.graph_filter_geometric(
        pos_p, x_p, r, jnp.asarray(w), None, valid, interpret=True,
        cap=cap, mxu_weights=True))[:n]
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("s_step", [2, 4])
def test_compact_spmm_multi_sender_mxu_weights(rng, s_step):
    """Multi-sender compact grid with the homogeneous MXU weight route ==
    single-sender VPU route (ulp tolerance for the transposed matmul)."""
    n, g, r = 520, 16, 8.0
    pos = _swarm(rng, n, world=130)
    order = np.asarray(ps.spatial_sort(jnp.asarray(pos), cell=r))
    pos = pos[order]
    pos_p, x_p, valid = ps.pad_agents(jnp.asarray(pos),
                                      jnp.asarray(rng.rand(n, g)
                                                  .astype(np.float32)))
    mask = ps.block_pair_mask(pos_p, r, valid)
    cap = int(np.asarray(mask).sum(axis=0).max())
    idx, count, overflow = ps.compact_sender_index(mask, cap)
    assert not bool(overflow)

    want = np.asarray(ps.geometric_spmm_compact(pos_p, x_p, r, valid, idx,
                                                count, interpret=True))
    got = np.asarray(ps.geometric_spmm_compact(
        pos_p, x_p, r, valid, idx, count, interpret=True,
        senders_per_step=s_step, mxu_weights=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_cached_weights_spmm_matches_compact(rng):
    """weights-build + cached SpMM == recompute compact grid (interpret),
    including rectangular receivers and degree agreement."""
    n, g, r = 500, 16, 8.0
    pos = _swarm(rng, n, world=120)
    order = np.asarray(ps.spatial_sort(jnp.asarray(pos), cell=r))
    pos = pos[order]
    pos_p, x_p, valid = ps.pad_agents(jnp.asarray(pos),
                                      jnp.asarray(rng.rand(n, g)
                                                  .astype(np.float32)))
    mask = ps.block_pair_mask(pos_p, r, valid)
    cap = int(np.asarray(mask).sum(axis=0).max()) + 1  # exercise fill slots
    idx, count, overflow = ps.compact_sender_index(mask, cap)
    assert not bool(overflow)

    wblocks, deg = ps.geometric_weights_compact(pos_p, r, valid, idx,
                                                count, interpret=True)
    want_deg = np.asarray(ps.geometric_degrees_compact(
        pos_p, r, valid, idx, count, interpret=True))
    np.testing.assert_allclose(np.asarray(deg), want_deg, rtol=0, atol=0)

    want = np.asarray(ps.geometric_spmm_compact(pos_p, x_p, r, valid, idx,
                                                count, interpret=True))
    got = np.asarray(ps.geometric_spmm_cached(wblocks, x_p, idx, count,
                                              interpret=True))
    # 0/1 weights are exact in bf16, so the matmuls see identical operands
    np.testing.assert_allclose(got, want, rtol=0, atol=0)

    # rectangular receiver set (first block only)
    recv_p, _, recv_v = ps.pad_agents(jnp.asarray(pos[:ps.BLOCK]))
    mask_r = ps.block_pair_mask(pos_p, r, valid, recv_p, recv_v)
    cap_r = int(np.asarray(mask_r).sum(axis=0).max())
    idx_r, count_r, ovf_r = ps.compact_sender_index(mask_r, cap_r)
    assert not bool(ovf_r)
    wb_r, deg_r = ps.geometric_weights_compact(
        pos_p, r, valid, idx_r, count_r, interpret=True,
        recv_pos=recv_p, recv_valid=recv_v)
    want_r = np.asarray(ps.geometric_spmm_compact(
        pos_p, x_p, r, valid, idx_r, count_r, interpret=True,
        recv_pos=recv_p, recv_valid=recv_v))
    got_r = np.asarray(ps.geometric_spmm_cached(wb_r, x_p, idx_r, count_r,
                                                interpret=True))
    np.testing.assert_allclose(got_r, want_r, rtol=0, atol=0)


def test_graph_filter_geometric_cache_weights(rng):
    """Full K-tap filter with cache_weights == dense oracle, including the
    overflow fallback branch."""
    n, g, f, k, r = 300, 8, 4, 3, 10.0
    pos = _swarm(rng, n, world=50)
    order = np.asarray(ps.spatial_sort(jnp.asarray(pos), cell=r))
    pos = pos[order]
    x = rng.rand(n, g).astype(np.float32)
    w = rng.randn(k, g, f).astype(np.float32) * 0.1
    pos_p, x_p, valid = ps.pad_agents(jnp.asarray(pos), jnp.asarray(x))
    mask = ps.block_pair_mask(pos_p, r, valid)
    true_max = int(np.asarray(mask).sum(axis=0).max())

    s, _, _ = compute_gso(jnp.asarray(pos), jnp.float32(r))
    want = np.asarray(graph_filter(jnp.asarray(x)[None], s[None],
                                   jnp.asarray(w))[0])
    for cap in (true_max - 1, true_max):  # overflow fallback and cached path
        got = np.asarray(ps.graph_filter_geometric(
            pos_p, x_p, r, jnp.asarray(w), valid=valid, interpret=True,
            cap=cap, cache_weights=True))[:n]
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

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


def test_compact_spmm_split_concat_variant(rng):
    """The concat split variant (one wide MXU pass over [hi | lo]) must be
    numerically identical to the shipped two-dot form — same per-element
    accumulation order, just fewer MXU issues (pallas_roofline A/B)."""
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
    assert not ps.SPLIT_CONCAT
    ps.SPLIT_CONCAT = True
    try:
        got = np.asarray(ps.geometric_spmm_compact(
            pos_p, x_p, r, valid, idx, count, interpret=True))
    finally:
        ps.SPLIT_CONCAT = False
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_pad_idx_multi():
    idx = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    out = np.asarray(ps._pad_idx_multi(idx, 2))
    np.testing.assert_array_equal(out, [[0, 1, 2, 2], [3, 4, 5, 5]])
    np.testing.assert_array_equal(np.asarray(ps._pad_idx_multi(idx, 3)),
                                  np.asarray(idx))


def test_split_precision_dot_tracks_f32(rng):
    """The split-precision hop matmul (x = hi + lo bf16; w exact 0/1) must
    track the f32 oracle to ~1e-4 even for features whose plain-bf16
    truncation error is orders of magnitude larger — the on-chip failure
    mode that motivated it (Mosaic DEFAULT f32 dot truncates inputs to
    bf16: max_abs 3e-2 measured at N=16k; kernel_anatomy_r4 notes)."""
    n, g, r = 300, 32, 8.0
    pos = _swarm(rng, n, world=90)
    order = np.asarray(ps.spatial_sort(jnp.asarray(pos), cell=r))
    pos = pos[order]
    # large dynamic range: plain bf16 rounding error ~0.8% of magnitude
    x = (rng.randn(n, g) * np.logspace(0, 3, g)[None, :]).astype(np.float32)
    pos_p, x_p, valid = ps.pad_agents(jnp.asarray(pos), jnp.asarray(x))
    mask = ps.block_pair_mask(pos_p, r, valid)
    cap = int(np.asarray(mask).sum(axis=0).max())
    idx, count, overflow = ps.compact_sender_index(mask, cap)
    assert not bool(overflow)

    d2 = ((pos[:, None] - pos[None]) ** 2).sum(-1)
    w = ((d2 < r * r) & (d2 > 0)).astype(np.float32)
    want = w.T @ x
    got = np.asarray(ps.geometric_spmm_compact(
        pos_p, x_p, r, valid, idx, count, interpret=True))[:n]
    colmax = np.abs(want).max(axis=0) + 1e-9
    split_rel = (np.abs(got - want) / colmax[None, :]).max()
    assert split_rel < 2e-5, split_rel        # measured 3.9e-6
    # plain single-pass bf16 truncation is ~800x worse on the same data
    bf = w.T @ np.asarray(x.astype(jnp.bfloat16).astype(np.float32))
    bf_rel = (np.abs(bf - want) / colmax[None, :]).max()
    assert bf_rel > 100 * split_rel

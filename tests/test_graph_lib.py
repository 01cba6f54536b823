"""Oracle tests for the extended GNN operator library + flax layers."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gnn_pathplanning_tpu.ops import graph_lib as gl
from gnn_pathplanning_tpu.models import gnn_layers as layers
from gnn_pathplanning_tpu.utils import graph_tools as gt


def _random_graph(rng, b, n):
    w = (rng.rand(b, n, n) < 0.4).astype(np.float32)
    w = np.triu(w, 1)
    return w + w.transpose(0, 2, 1)


def test_spectral_gf_diagonalizes(rng):
    """A spectral filter with constant response c must equal c * V V^T x = c x."""
    n, g, f, b = 8, 4, 4, 2
    w = _random_graph(rng, 1, n)[0]
    _, v = gt.compute_gft(gt.normalize_adjacency(w))
    coeffs = np.zeros((n, g, f), np.float32)
    for i in range(min(g, f)):
        coeffs[:, i, i] = 2.5
    x = rng.randn(b, n, g).astype(np.float32)
    y = np.asarray(gl.spectral_gf(jnp.array(coeffs), jnp.array(v.astype(np.float32)),
                                  jnp.array(x)))
    np.testing.assert_allclose(y[..., :g], 2.5 * x, rtol=1e-3, atol=1e-4)


def test_node_variant_reduces_to_plain_filter(rng):
    """Node-variant taps that are identical across nodes == ordinary filter."""
    from gnn_pathplanning_tpu.ops import graph_filter
    b, n, g, f, k = 2, 6, 3, 5, 3
    s = (_random_graph(rng, b, n) / n).astype(np.float32)
    x = rng.randn(b, n, g).astype(np.float32)
    base = rng.randn(k, g, f).astype(np.float32)
    nv = np.tile(base[:, None], (1, n, 1, 1))
    want = np.asarray(graph_filter(jnp.array(x), jnp.array(s), jnp.array(base)))
    got = np.asarray(gl.node_variant_gf(jnp.array(nv), jnp.array(s), jnp.array(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_edge_variant_reduces_to_plain_filter(rng):
    """Phi_k == S for all taps reproduces the ordinary filter on support."""
    from gnn_pathplanning_tpu.ops import graph_filter
    b, n, g, f, k = 2, 6, 3, 4, 3
    s = (_random_graph(rng, b, n) / n).astype(np.float32)
    # shared support/weights across batch: use b=1 slice as shared S
    s0 = s[0]
    support = (s0 != 0).astype(np.float32) + np.eye(n, dtype=np.float32)
    phi = np.tile(s0[None], (k - 1, 1, 1))
    weights = rng.randn(k, g, f).astype(np.float32)
    x = rng.randn(b, n, g).astype(np.float32)
    want = np.asarray(graph_filter(jnp.array(x),
                                   jnp.array(np.tile(s0, (b, 1, 1))),
                                   jnp.array(weights)))
    got = np.asarray(gl.edge_variant_gf(jnp.array(phi),
                                        jnp.array(np.minimum(support, 1)),
                                        jnp.array(x), jnp.array(weights)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_graph_attention_rows_sum_to_one(rng):
    b, n, g, f, h = 2, 7, 4, 3, 2
    s = _random_graph(rng, b, n)
    x = rng.randn(b, n, g).astype(np.float32)
    w = rng.randn(h, g, f).astype(np.float32)
    a_s = rng.randn(h, f).astype(np.float32)
    a_d = rng.randn(h, f).astype(np.float32)
    out = np.asarray(gl.graph_attention(jnp.array(x), jnp.array(s),
                                        jnp.array(w), jnp.array(a_s), jnp.array(a_d)))
    assert out.shape == (b, n, h * f)
    assert np.isfinite(out).all()
    # isolated node (no neighbors): attention collapses to self-attention
    s_iso = np.zeros((1, 3, 3), np.float32)
    x_iso = rng.randn(1, 3, g).astype(np.float32)
    out_iso = np.asarray(gl.graph_attention(jnp.array(x_iso), jnp.array(s_iso),
                                            jnp.array(w), jnp.array(a_s), jnp.array(a_d)))
    proj = np.einsum("bng,hgf->bhnf", x_iso, w)
    want = proj.transpose(0, 2, 1, 3).reshape(1, 3, h * f)
    np.testing.assert_allclose(out_iso, want, rtol=1e-4, atol=1e-5)


def test_max_local_activation_oracle(rng):
    b, n, g = 2, 6, 3
    s = _random_graph(rng, b, n)
    x = rng.randn(b, n, g).astype(np.float32)
    got = np.asarray(gl.max_local_activation(jnp.array(x), jnp.array(s), hops=1))
    for bi in range(b):
        for i in range(n):
            nbrs = [i] + list(np.nonzero(s[bi, :, i])[0])
            want = x[bi, nbrs].max(0)
            np.testing.assert_allclose(got[bi, i], want, rtol=1e-5)


def test_median_local_activation_oracle(rng):
    b, n, g = 1, 5, 2
    s = _random_graph(rng, b, n)
    x = rng.randn(b, n, g).astype(np.float32)
    got = np.asarray(gl.median_local_activation(jnp.array(x), jnp.array(s), hops=1))
    for i in range(n):
        nbrs = [i] + list(np.nonzero(s[0, :, i])[0])
        want = np.median(x[0, nbrs], axis=0)
        np.testing.assert_allclose(got[0, i], want, rtol=1e-4, atol=1e-5)


def test_graph_filter_rnn_runs_and_depends_on_history(rng):
    t, b, n, g, h, k = 4, 2, 5, 3, 6, 2
    s_seq = (_random_graph(rng, t * b, n).reshape(t, b, n, n) / n).astype(np.float32)
    x_seq = rng.randn(t, b, n, g).astype(np.float32)
    w_in = rng.randn(k, g, h).astype(np.float32)
    w_hid = rng.randn(k, h, h).astype(np.float32)
    h0 = np.zeros((b, n, h), np.float32)
    out = np.asarray(gl.graph_filter_rnn(jnp.array(w_in), jnp.array(w_hid),
                                         jnp.array(s_seq), jnp.array(x_seq),
                                         jnp.array(h0)))
    assert out.shape == (t, b, n, h)
    # flipping the first input must change the last hidden state
    x2 = x_seq.copy()
    x2[0] += 1.0
    out2 = np.asarray(gl.graph_filter_rnn(jnp.array(w_in), jnp.array(w_hid),
                                          jnp.array(s_seq), jnp.array(x2),
                                          jnp.array(h0)))
    assert np.abs(out2[-1] - out[-1]).max() > 1e-6


@pytest.mark.parametrize("cls,extra", [
    (layers.GraphFilter, "s"),
    (layers.SpectralGraphFilter, "v"),
    (layers.NodeVariantGraphFilter, "s"),
    (layers.EdgeVariantGraphFilter, "support"),
    (layers.GraphAttention, "s"),
])
def test_flax_layers_init_and_apply(cls, extra, rng):
    b, n, g = 2, 6, 4
    x = jnp.array(rng.randn(b, n, g).astype(np.float32))
    s = jnp.array(_random_graph(rng, b, n))
    kwargs = {"features": 5}
    if cls in (layers.GraphFilter, layers.NodeVariantGraphFilter,
               layers.EdgeVariantGraphFilter):
        kwargs["num_taps"] = 2
    m = cls(**kwargs)
    if extra == "v":
        w = np.asarray(s[0])
        _, v = gt.compute_gft(gt.normalize_adjacency(w))
        arg = jnp.array(v.astype(np.float32))
    elif extra == "support":
        arg = (s[0] != 0).astype(jnp.float32)
    else:
        arg = s
    params = m.init(jax.random.PRNGKey(0), x, arg)
    out = m.apply(params, x, arg)
    assert np.isfinite(np.asarray(out)).all()


def test_graph_tools_roundtrip(rng):
    w = gt.create_graph("SBM", 12, rng, communities=3)
    lap = gt.adjacency_to_laplacian(w)
    assert np.allclose(lap.sum(1), 0)
    e, v = gt.compute_gft(gt.normalize_adjacency(w))
    assert (np.diff(e) >= -1e-9).all()
    powers = gt.matrix_powers(w, 3)
    np.testing.assert_allclose(powers[2], w @ w)
    nbr = gt.compute_neighborhood(w, 1)
    assert all(i in nbr[i] for i in range(12))
    sw = gt.create_graph("smallWorld", 10, rng, k=2, p=0.2)
    assert (sw == sw.T).all()
    geo = gt.create_graph("geometric", 15, rng, radius=0.4)
    assert np.diag(geo).sum() == 0
    graph = gt.Graph(w)
    assert graph.N == 12 and graph.S.shape == (12, 12)
    sp = gt.sparsify_graph(w, "NN", 2)
    assert (sp.sum(1) > 0).any()


# ------------------------------------------------ node orderings (:824-996)

def _perm_fixture(rng):
    w = (rng.rand(8, 8) < 0.4).astype(np.float64)
    w = np.triu(w, 1)
    w = w + w.T
    w[0] = 1.0  # give node 0 the max degree
    w[:, 0] = 1.0
    np.fill_diagonal(w, 0.0)
    return w


def test_perm_degree_orders_by_degree(rng):
    from gnn_pathplanning_tpu.utils.graph_tools import perm_degree
    w = _perm_fixture(rng)
    permed, order = perm_degree(w)
    deg = w.sum(1)
    assert order[0] == 0  # max-degree node first
    assert sorted(order) == list(range(8))
    np.testing.assert_array_equal(permed, w[np.ix_(order, order)])
    assert (np.diff(deg[order]) <= 1e-12).all()


def test_perm_identity_and_eds_are_valid_permutations(rng):
    from gnn_pathplanning_tpu.utils.graph_tools import (perm_eds,
                                                        perm_identity,
                                                        perm_spectral_proxies)
    w = _perm_fixture(rng)
    for fn in (perm_identity, perm_eds, perm_spectral_proxies):
        permed, order = fn(w)
        assert sorted(order) == list(range(8)), fn.__name__
        np.testing.assert_array_equal(permed, w[np.ix_(order, order)])


def test_edge_fail_sampling_keeps_symmetry(rng):
    from gnn_pathplanning_tpu.utils.graph_tools import edge_fail_sampling
    w = _perm_fixture(rng)
    out = edge_fail_sampling(w, 0.5, rng)
    np.testing.assert_array_equal(out, out.T)
    assert (out <= w).all()
    out0 = edge_fail_sampling(w, 0.0, rng)
    np.testing.assert_array_equal(out0, w)


def test_coarsen_binary_tree_structure(rng):
    """coarsen: cluster sizes <=2, weight conservation, stride-2 tree."""
    w = gt.create_graph("geometric", 14, rng, radius=0.45)
    graphs, order = gt.coarsen(w, levels=2, rng=rng)
    assert len(graphs) == 3
    m0 = len(order)
    # level sizes halve exactly and the finest covers all real nodes
    assert m0 % 4 == 0
    assert graphs[0].shape == (m0, m0)
    assert graphs[1].shape == (m0 // 2, m0 // 2)
    assert graphs[2].shape == (m0 // 4, m0 // 4)
    assert sorted(o for o in order if o < 14) == list(range(14))
    # symmetry preserved at every level
    for g in graphs:
        np.testing.assert_allclose(g, g.T)
    # weight conservation: contracting level-0 pairs reproduces level 1
    pool = np.zeros((m0 // 2, m0))
    pool[np.arange(m0) // 2, np.arange(m0)] = 1.0
    contracted = pool @ graphs[0] @ pool.T
    np.fill_diagonal(contracted, 0.0)
    np.testing.assert_allclose(contracted, graphs[1], atol=1e-12)


def test_coarsen_path_graph_pairs_neighbors():
    """A 4-path coarsens to a 2-node graph keeping the middle edge weight."""
    w = np.zeros((4, 4))
    for i in range(3):
        w[i, i + 1] = w[i + 1, i] = 1.0
    graphs, order = gt.coarsen(w, levels=1,
                               rng=np.random.RandomState(0))
    # 4 real nodes, perfect matching: no fakes, coarse graph has 2 nodes
    assert len(order) == 4 and sorted(order) == list(range(4))
    assert graphs[1].shape == (2, 2)
    assert graphs[1][0, 1] > 0  # the cut edge survives contraction


def test_perm_coarsening_zero_pads_fakes(rng):
    w = gt.create_graph("geometric", 9, rng, radius=0.5)
    graphs, order = gt.coarsen(w, levels=1, rng=rng)
    x = rng.randn(3, 5, 9)  # [B, F, N]
    xp = gt.perm_coarsening(x, order, node_axis=-1)
    assert xp.shape == (3, 5, len(order))
    for k, o in enumerate(order):
        if o < 9:
            np.testing.assert_allclose(xp[..., k], x[..., o])
        else:
            np.testing.assert_allclose(xp[..., k], 0.0)

import numpy as np
import jax.numpy as jnp

from gnn_pathplanning_tpu.ops import graph_filter, graph_filter_sparse


def oracle_graph_filter(x, s, w, b):
    """Naive per-element oracle: y[b,n,f] = sum_k sum_m (S^T)^k x  W_k."""
    B, N, G = x.shape
    K, _, F = w.shape
    y = np.zeros((B, N, F))
    for bi in range(B):
        z = x[bi]  # [N, G]
        zs = [z]
        for _ in range(1, K):
            z = s[bi].T @ z
            zs.append(z)
        for k in range(K):
            y[bi] += zs[k] @ w[k]
    if b is not None:
        y = y + b
    return y


def test_dense_matches_oracle(rng):
    B, N, G, F, K = 3, 10, 8, 6, 3
    x = rng.randn(B, N, G).astype(np.float32)
    # Spectrally tame S (like a normalized adjacency) so float32 powers of S
    # don't amplify accumulation-order noise.
    s = (rng.randn(B, N, N) / N).astype(np.float32)
    w = rng.randn(K, G, F).astype(np.float32)
    b = rng.randn(F).astype(np.float32)
    got = np.asarray(graph_filter(jnp.array(x), jnp.array(s), jnp.array(w), jnp.array(b)))
    want = oracle_graph_filter(x, s, w, b)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_dense_k1_is_pointwise(rng):
    """K=1 ignores the graph entirely (identity shift only)."""
    B, N, G, F = 2, 5, 4, 3
    x = rng.randn(B, N, G).astype(np.float32)
    s = rng.randn(B, N, N).astype(np.float32)
    w = rng.randn(1, G, F).astype(np.float32)
    got = np.asarray(graph_filter(jnp.array(x), jnp.array(s), jnp.array(w)))
    np.testing.assert_allclose(got, x @ w[0], rtol=1e-5, atol=1e-5)


def test_zero_padded_nodes_stay_zero(rng):
    """Reference GraphFilterBatch zero-pads absent nodes; with zero S rows/cols
    and zero signals, padded node outputs must equal the bias only."""
    B, N, G, F, K = 2, 8, 4, 4, 3
    n_real = 5
    x = rng.randn(B, N, G).astype(np.float32)
    x[:, n_real:] = 0.0
    s = rng.rand(B, N, N).astype(np.float32)
    s[:, n_real:, :] = 0.0
    s[:, :, n_real:] = 0.0
    w = rng.randn(K, G, F).astype(np.float32)
    got = np.asarray(graph_filter(jnp.array(x), jnp.array(s), jnp.array(w)))
    np.testing.assert_allclose(got[:, n_real:], 0.0, atol=1e-6)


def test_sparse_matches_dense(rng):
    N, G, F, K = 12, 8, 6, 3
    x = rng.randn(N, G).astype(np.float32)
    dense = (rng.rand(N, N) < 0.3).astype(np.float32) * rng.rand(N, N).astype(np.float32)
    np.fill_diagonal(dense, 0.0)
    senders, receivers = np.nonzero(dense)
    vals = dense[senders, receivers].astype(np.float32)
    w = rng.randn(K, G, F).astype(np.float32)
    b = rng.randn(F).astype(np.float32)

    want = np.asarray(graph_filter(jnp.array(x[None]), jnp.array(dense[None]),
                                   jnp.array(w), jnp.array(b)))[0]
    got = np.asarray(graph_filter_sparse(
        jnp.array(x), jnp.array(senders.astype(np.int32)),
        jnp.array(receivers.astype(np.int32)), jnp.array(vals),
        jnp.array(w), jnp.array(b)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sparse_padding_edges_are_noops(rng):
    N, G, F, K = 6, 4, 3, 2
    x = rng.randn(N, G).astype(np.float32)
    senders = np.array([1, 2, 0, 0], np.int32)
    receivers = np.array([0, 1, 0, 0], np.int32)
    vals = np.array([0.5, 0.25, 0.0, 0.0], np.float32)  # last two are padding
    w = rng.randn(K, G, F).astype(np.float32)
    got = np.asarray(graph_filter_sparse(jnp.array(x), jnp.array(senders),
                                         jnp.array(receivers), jnp.array(vals),
                                         jnp.array(w)))
    got_nopad = np.asarray(graph_filter_sparse(
        jnp.array(x), jnp.array(senders[:2]), jnp.array(receivers[:2]),
        jnp.array(vals[:2]), jnp.array(w)))
    np.testing.assert_allclose(got, got_nopad, rtol=1e-5, atol=1e-6)

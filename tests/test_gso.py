import numpy as np
import jax.numpy as jnp
import scipy.linalg

from gnn_pathplanning_tpu.ops import (
    adjacency_from_positions,
    compute_gso,
    is_connected,
    normalize_adjacency,
    pairwise_distances,
)


def oracle_connected(w):
    """Reference-style connectivity via Laplacian eigenvalue count (float64 —
    the reference runs numpy default float64 where the zero eigenvalues stay
    below its 1e-9 tolerance)."""
    w = 0.5 * (w + w.T).astype(np.float64)
    lap = np.diag(w.sum(1)) - w
    eig = scipy.linalg.eigvalsh(lap)
    return int(np.sum(eig < 1e-9)) == 1


def oracle_normalize(w, tol=1e-9):
    deg = w.sum(1)
    zero = np.abs(deg) < tol
    deg = np.where(zero, 1.0, deg)
    inv = np.sqrt(1.0 / deg)
    inv[zero] = 0.0
    d = np.diag(inv)
    return d @ w @ d


def test_pairwise_distances(rng):
    pos = rng.rand(7, 2).astype(np.float32) * 10
    got = np.asarray(pairwise_distances(jnp.array(pos)))
    want = np.sqrt(((pos[:, None] - pos[None]) ** 2).sum(-1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_adjacency_threshold_strict(rng):
    pos = np.array([[0, 0], [0, 3], [0, 6]], np.float32)
    w = np.asarray(adjacency_from_positions(jnp.array(pos), jnp.float32(3.0)))
    # distance exactly 3 is NOT an edge (strict <)
    assert w[0, 1] == 0.0 and w[1, 2] == 0.0
    w = np.asarray(adjacency_from_positions(jnp.array(pos), jnp.float32(3.5)))
    assert w[0, 1] == 1.0 and w[1, 2] == 1.0 and w[0, 2] == 0.0
    assert np.all(np.diag(w) == 0)


def test_connectivity_matches_eig_oracle(rng):
    # Fixed sizes to bound jit-compile count; several trials per size.
    for n in (2, 5, 10):
        for trial in range(6):
            w = (rng.rand(n, n) < 0.25).astype(np.float32)
            w = np.triu(w, 1)
            w = w + w.T
            assert bool(is_connected(jnp.array(w))) == oracle_connected(w), w


def test_connectivity_edge_cases():
    assert bool(is_connected(jnp.zeros((1, 1))))
    assert not bool(is_connected(jnp.zeros((2, 2))))
    assert bool(is_connected(jnp.array([[0.0, 1.0], [1.0, 0.0]])))


def test_normalize_matches_oracle(rng):
    n = 9
    w = (rng.rand(n, n) < 0.4).astype(np.float32)
    np.fill_diagonal(w, 0)
    w = np.maximum(w, w.T)
    w[3, :] = 0
    w[:, 3] = 0  # isolated node
    got = np.asarray(normalize_adjacency(jnp.array(w)))
    np.testing.assert_allclose(got, oracle_normalize(w), rtol=1e-5, atol=1e-6)
    assert np.all(got[3] == 0)


def test_compute_gso_growth(rng):
    # Two clusters 10 apart; initial radius 2 only connects within clusters.
    pos = np.array([[0, 0], [0, 1], [10, 0], [10, 1]], np.float32)
    s, r, connected = compute_gso(jnp.array(pos), jnp.float32(2.0), grow=True)
    assert bool(connected)
    r = float(r)
    # The grown radius must exceed the cluster gap and follow the 1.1^k ladder
    # from 2.0/1.1.
    assert r > 10.0
    ladder = 2.0 / 1.1 * 1.1 ** np.arange(40)
    assert np.min(np.abs(ladder - r)) < 1e-4
    # Row sums of symmetric normalized adjacency of connected graph <= 1 + eps
    assert np.asarray(s).max() <= 1.0 + 1e-5


def test_compute_gso_fixed_radius(rng):
    pos = rng.randint(0, 20, size=(10, 2)).astype(np.float32)
    s, r, _ = compute_gso(jnp.array(pos), jnp.float32(6.0), grow=False)
    assert float(r) == 6.0
    w = (np.sqrt(((pos[:, None] - pos[None]) ** 2).sum(-1)) < 6.0).astype(np.float32)
    np.fill_diagonal(w, 0)
    np.testing.assert_allclose(np.asarray(s), oracle_normalize(w), rtol=1e-4, atol=1e-5)

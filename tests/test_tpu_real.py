"""Opt-in real-TPU validation (``pytest -m tpu``).

The unit suite pins jax to a virtual CPU platform (conftest.py), so kernel
regressions that only appear on the real Mosaic/XLA:TPU backend are not
caught in CI. Under ``-m tpu`` the conftest instead exposes BOTH platforms
("axon,cpu") and these tests run IN-PROCESS: every kernel computes once on
the real device and once on the in-process CPU backend, and the results are
compared. (The previous child-subprocess fixture could not start on this
rig — the spawned child's axon registration conflicts with the running
session's libtpu args, ROUND4.md infra notes — which left real-TPU evidence
riding on one-off benchmark JSONs instead of a repeatable gate.)

First TPU compile over the tunnel takes minutes — run with a generous
timeout and expect contention if a training job owns the chip.
"""
from __future__ import annotations

import contextlib

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _tpu_device():
    try:
        devs = [d for d in jax.devices() if d.platform != "cpu"]
    except RuntimeError:
        return None
    return devs[0] if devs else None


def _cpu_device():
    return jax.devices("cpu")[0]


@contextlib.contextmanager
def _on(device, precision=None):
    # ``precision="highest"`` forces f32 semantics for DENSE XLA matmuls
    # (the default TPU precision truncates inputs to bf16). Do NOT apply
    # it around the Pallas kernels: they manage their own precision (the
    # split-dot issues bf16 MXU passes by design) and Mosaic rejects
    # bf16 operands under a HIGHEST override ("Bad lhs type").
    ctx = (jax.default_matmul_precision(precision) if precision
           else contextlib.nullcontext())
    with jax.default_device(device), ctx:
        yield


def _both(fn, *args, precision=None):
    """Run ``fn`` jitted on the TPU and on the in-process CPU backend;
    return (tpu_result, cpu_result) as numpy arrays."""
    dev = _tpu_device()
    if dev is None:
        pytest.skip("no non-CPU jax platform available in-process")
    outs = []
    for d in (dev, _cpu_device()):
        with _on(d, precision):
            args_d = jax.tree.map(
                lambda a: jax.device_put(a, d) if hasattr(a, "dtype") else a,
                args)
            outs.append(jax.tree.map(np.asarray, jax.jit(fn)(*args_d)))
    return outs[0], outs[1]


# ---------------------------------------------------------------- fixtures

@pytest.fixture(scope="module")
def swarm512():
    """A 512-agent multi-block swarm in spatial-sort order + its compact
    scalar-prefetch index (cap = true max per-receiver sender count, so the
    compact kernels — not the fallback — are what compiles on the chip)."""
    from gnn_pathplanning_tpu.ops.pallas_swarm import (block_pair_mask,
                                                       compact_sender_index,
                                                       pad_agents,
                                                       spatial_sort)
    if _tpu_device() is None:
        pytest.skip("no non-CPU jax platform available in-process")
    rng = np.random.RandomState(0)
    g = 8
    idx2 = rng.choice(64 * 64, size=512, replace=False)
    pos2 = np.stack([idx2 // 64, idx2 % 64], -1).astype(np.float32)
    with _on(_cpu_device()):
        pos2 = pos2[np.asarray(spatial_sort(jnp.asarray(pos2), cell=6.0))]
        x2 = rng.randn(512, g).astype(np.float32)
        pos2_p, x2_p, valid2 = pad_agents(jnp.asarray(pos2), jnp.asarray(x2))
        mask2 = block_pair_mask(pos2_p, 6.0, valid2)
        cap = int(np.asarray(mask2).sum(axis=0).max())
        cidx, ccount, overflow = compact_sender_index(mask2, cap)
        assert not bool(overflow)
    return dict(pos2=pos2, x2=x2, pos2_p=np.asarray(pos2_p),
                x2_p=np.asarray(x2_p), valid2=np.asarray(valid2),
                cap=cap, cidx=np.asarray(cidx), ccount=np.asarray(ccount))


# ------------------------------------------------------------------ tests

def test_dense_graph_filter_matches_cpu():
    from gnn_pathplanning_tpu.ops.graph_filter import graph_filter
    rng = np.random.RandomState(0)
    b, n, g, f, k = 2, 64, 8, 8, 3
    x = rng.randn(b, n, g).astype(np.float32)
    s = rng.randn(b, n, n).astype(np.float32)
    w = rng.randn(k, g, f).astype(np.float32) * 0.3
    bias = rng.randn(f).astype(np.float32) * 0.3
    got, want = _both(graph_filter, jnp.asarray(x), jnp.asarray(s),
                      jnp.asarray(w), jnp.asarray(bias),
                      precision="highest")
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_pallas_geometric_matches_cpu_dense():
    """Real-TPU Mosaic kernel vs CPU dense oracle on the valid lanes."""
    from gnn_pathplanning_tpu.ops.graph_filter import graph_filter
    from gnn_pathplanning_tpu.ops.gso import (adjacency_from_positions,
                                              normalize_adjacency)
    from gnn_pathplanning_tpu.ops.pallas_swarm import (
        graph_filter_geometric, pad_agents)
    rng = np.random.RandomState(0)
    g, f, k = 8, 8, 3
    w = rng.randn(k, g, f).astype(np.float32) * 0.3
    bias = rng.randn(f).astype(np.float32) * 0.3
    idx = rng.choice(48 * 48, size=100, replace=False)
    pos = np.stack([idx // 48, idx % 48], -1).astype(np.float32)
    xg = rng.randn(100, g).astype(np.float32)
    with _on(_cpu_device()):
        pos_p, xg_p, valid = pad_agents(jnp.asarray(pos), jnp.asarray(xg))
        gso = normalize_adjacency(adjacency_from_positions(
            jnp.asarray(pos), 6.0))
        want = np.asarray(jax.jit(graph_filter)(
            jnp.asarray(xg)[None], gso[None], jnp.asarray(w),
            jnp.asarray(bias)))[0]
    dev = _tpu_device()
    if dev is None:
        pytest.skip("no non-CPU jax platform available in-process")
    with _on(dev):
        geo = np.asarray(jax.jit(lambda p, xx, v: graph_filter_geometric(
            p, xx, 6.0, jnp.asarray(w), jnp.asarray(bias), v))(
                jax.device_put(pos_p, dev), jax.device_put(xg_p, dev),
                jax.device_put(valid, dev)))
    got = geo[np.asarray(valid).astype(bool)]
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_rectangular_spmm_matches_cpu():
    """Real-TPU rectangular (sender x receiver) fused SpMM — the form the
    agent-sharded rollout uses — vs a numpy dense contraction."""
    from gnn_pathplanning_tpu.ops.pallas_swarm import (block_pair_mask,
                                                       geometric_spmm,
                                                       pad_agents)
    rng = np.random.RandomState(0)
    g = 8
    idx = rng.choice(48 * 48, size=100, replace=False)
    pos = np.stack([idx // 48, idx % 48], -1).astype(np.float32)
    xg = rng.randn(100, g).astype(np.float32)
    d2 = ((pos[:, None] - pos[None, :50]) ** 2).sum(-1)  # [100 send, 50 recv]
    wadj = ((d2 < 36.0) & (d2 > 0)).astype(np.float32)
    want = wadj.T @ xg                                   # [50, g]

    dev = _tpu_device()
    if dev is None:
        pytest.skip("no non-CPU jax platform available in-process")
    with _on(dev):
        pos_p, xg_p, valid = pad_agents(jnp.asarray(pos), jnp.asarray(xg))
        recv_pos, _, recv_valid = pad_agents(jnp.asarray(pos[:50]))
        rect_mask = block_pair_mask(pos_p, 6.0, valid, recv_pos, recv_valid)
        rect = np.asarray(jax.jit(lambda: geometric_spmm(
            pos_p, xg_p, 6.0, valid, rect_mask, recv_pos=recv_pos,
            recv_valid=recv_valid))())
    got = rect[np.asarray(recv_valid).astype(bool)]
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_compact_geometric_filter_matches_cpu(swarm512):
    """Real-TPU compacted scalar-prefetch kernels (cap=true max) vs the CPU
    dense oracle on a 512-agent multi-block swarm."""
    from gnn_pathplanning_tpu.ops.graph_filter import graph_filter
    from gnn_pathplanning_tpu.ops.gso import (adjacency_from_positions,
                                              normalize_adjacency)
    from gnn_pathplanning_tpu.ops.pallas_swarm import graph_filter_geometric
    rng = np.random.RandomState(1)
    g, f, k = 8, 8, 3
    w = rng.randn(k, g, f).astype(np.float32) * 0.3
    bias = rng.randn(f).astype(np.float32) * 0.3
    with _on(_cpu_device()):
        gso = normalize_adjacency(adjacency_from_positions(
            jnp.asarray(swarm512["pos2"]), 6.0))
        want = np.asarray(jax.jit(graph_filter)(
            jnp.asarray(swarm512["x2"])[None], gso[None],
            jnp.asarray(w), jnp.asarray(bias)))[0]
    dev = _tpu_device()
    with _on(dev):
        compact = np.asarray(jax.jit(
            lambda p, xx, v: graph_filter_geometric(
                p, xx, 6.0, jnp.asarray(w), jnp.asarray(bias), v,
                cap=swarm512["cap"]))(
            jnp.asarray(swarm512["pos2_p"]), jnp.asarray(swarm512["x2_p"]),
            jnp.asarray(swarm512["valid2"])))
    got = compact[swarm512["valid2"].astype(bool)]
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_multi_sender_and_bf16_spmm_on_tpu(swarm512):
    """Real-TPU multi-sender compact grid == single-sender grid exactly;
    bf16 features within bf16 rounding of the f32 result; both match the
    numpy adjacency oracle."""
    from gnn_pathplanning_tpu.ops.pallas_swarm import geometric_spmm_compact
    dev = _tpu_device()
    pos2_p = jnp.asarray(swarm512["pos2_p"])
    x2_p = jnp.asarray(swarm512["x2_p"])
    valid2 = jnp.asarray(swarm512["valid2"])
    cidx = jnp.asarray(swarm512["cidx"])
    ccount = jnp.asarray(swarm512["ccount"])
    with _on(dev):
        s1 = np.asarray(jax.jit(lambda: geometric_spmm_compact(
            pos2_p, x2_p, 6.0, valid2, cidx, ccount))())
        s4 = np.asarray(jax.jit(lambda: geometric_spmm_compact(
            pos2_p, x2_p, 6.0, valid2, cidx, ccount,
            senders_per_step=4))())
        bf = np.asarray(jax.jit(lambda: geometric_spmm_compact(
            pos2_p, x2_p.astype(jnp.bfloat16), 6.0, valid2, cidx, ccount,
            senders_per_step=4))())
    np.testing.assert_array_equal(s4, s1)
    assert bf.dtype == np.float32
    np.testing.assert_allclose(bf, s1, rtol=2e-2, atol=2e-2)

    pos2, x2 = swarm512["pos2"], swarm512["x2"]
    d2 = ((pos2[:, None] - pos2[None]) ** 2).sum(-1)
    wadj = ((d2 < 36.0) & (d2 > 0)).astype(np.float32)
    want = wadj.T @ x2
    got = s1[swarm512["valid2"].astype(bool)]
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_compact_degrees_match_cpu(swarm512):
    """Real-TPU compact degree kernel (column-form output): integer
    neighbor counts must match the numpy adjacency oracle exactly."""
    from gnn_pathplanning_tpu.ops.pallas_swarm import geometric_degrees_compact
    dev = _tpu_device()
    with _on(dev):
        deg = np.asarray(jax.jit(lambda: geometric_degrees_compact(
            jnp.asarray(swarm512["pos2_p"]), 6.0,
            jnp.asarray(swarm512["valid2"]),
            jnp.asarray(swarm512["cidx"]),
            jnp.asarray(swarm512["ccount"])))())
    pos2 = swarm512["pos2"]
    d2 = ((pos2[:, None] - pos2[None]) ** 2).sum(-1)
    wadj = ((d2 < 36.0) & (d2 > 0)).astype(np.float32)
    got = deg[swarm512["valid2"].astype(bool)]
    np.testing.assert_array_equal(got, wadj.sum(axis=0))


def _canary_inputs():
    rngc = np.random.RandomState(1234)
    B, N, W = 4440, 10, 20
    grids = (rngc.rand(B, W, W) < 0.1).astype(np.float32)
    cells = np.argsort(rngc.rand(B, W * W), axis=1)[:, :2 * N]
    posc = np.stack([cells[:, :N] // W, cells[:, :N] % W], -1).astype(np.int32)
    goalc = np.stack([cells[:, N:] // W, cells[:, N:] % W],
                     -1).astype(np.int32)
    return grids, posc, goalc


def test_fov_canary_b4440_bitwise():
    """The full [4440, 10] FOV render on the chip must be BIT-IDENTICAL to
    CPU — the round-2 scatter miscompile silently zeroed the goal channel
    only above ~24k windows, so small-shape tests cannot stand in for this
    one (ops/fov.py, ROUND2.md 'B=4440 TPU FOV miscompile')."""
    from gnn_pathplanning_tpu.ops.fov import render_fov
    grids, posc, goalc = _canary_inputs()
    got, want = _both(jax.vmap(render_fov), jnp.asarray(grids),
                      jnp.asarray(posc), jnp.asarray(goalc))
    assert got.shape == (4440, 10, 3, 11, 11)
    # goal channel non-degenerate: the miscompile zeroed it in 74% of windows
    assert (got[:, :, 1].sum(axis=(-1, -2)) > 0).mean() > 0.999
    np.testing.assert_array_equal(got, want)


def test_forward_canary_b4440_argmax():
    """Full DCP forward at the eval-sweep batch shape: TPU argmax actions
    must agree with CPU >= 99.5% (residual = bf16-free HIGHEST-precision
    rounding only)."""
    from gnn_pathplanning_tpu.models.dcp import DCPConfig, DCPNet
    from gnn_pathplanning_tpu.ops.fov import render_fov
    from gnn_pathplanning_tpu.ops.gso import (adjacency_from_positions,
                                              normalize_adjacency)
    grids, posc, goalc = _canary_inputs()
    dcp = DCPNet(DCPConfig(num_taps=3))
    with _on(_cpu_device()):
        dcp_vars = dcp.init_variables(jax.random.PRNGKey(0), 10)
        obs = jax.jit(jax.vmap(render_fov))(
            jnp.asarray(grids), jnp.asarray(posc), jnp.asarray(goalc))
        adjc = jax.vmap(adjacency_from_positions, in_axes=(0, None))(
            jnp.asarray(posc, jnp.float32), jnp.float32(5.0))
        gsoc = jax.vmap(normalize_adjacency)(adjc)
    dcp_vars_np = jax.tree.map(np.asarray, dcp_vars)
    obs_np, gso_np = np.asarray(obs), np.asarray(gsoc)
    got, want = _both(
        lambda o, s: jnp.argmax(dcp.apply(dcp_vars_np, o, s, train=False),
                                -1),
        obs_np, gso_np, precision="highest")
    agreement = (got == want).mean()
    assert agreement >= 0.995, f"TPU/CPU argmax agreement {agreement:.4f}"

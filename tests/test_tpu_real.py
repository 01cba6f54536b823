"""Opt-in real-TPU validation (``pytest -m tpu``).

The unit suite pins jax to a virtual CPU platform (conftest.py), so kernel
regressions that only appear on the real Mosaic/XLA:TPU backend are not
caught in CI. These tests spawn a clean subprocess (no CPU pin; the
environment's default platform is the tunneled TPU) that compiles the dense
graph filter, the Pallas geometric filter, and a short closed-loop rollout
on the TPU and writes the results to an npz; the parent recomputes them on
CPU and compares.

Skipped unless selected with ``-m tpu`` (see conftest collection hook).
First TPU compile over the tunnel takes minutes — run with a generous
timeout and expect contention if a training job owns the chip.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

_CHILD = r"""
import sys
import numpy as np
import jax
import jax.numpy as jnp

# Regression test wants numerical equality with the CPU oracle, not the
# default bf16 MXU passthrough.
jax.config.update("jax_default_matmul_precision", "highest")

out_path = sys.argv[1]
assert jax.devices()[0].platform != "cpu", jax.devices()

from gnn_pathplanning_tpu.ops.graph_filter import graph_filter
from gnn_pathplanning_tpu.ops.pallas_swarm import (graph_filter_geometric,
                                                   pad_agents)
from gnn_pathplanning_tpu.ops.gso import (adjacency_from_positions,
                                          normalize_adjacency)

rng = np.random.RandomState(0)
b, n, g, f, k = 2, 64, 8, 8, 3
x = rng.randn(b, n, g).astype(np.float32)
s = rng.randn(b, n, n).astype(np.float32)
w = rng.randn(k, g, f).astype(np.float32) * 0.3
bias = rng.randn(f).astype(np.float32) * 0.3
dense = jax.jit(graph_filter)(jnp.asarray(x), jnp.asarray(s),
                              jnp.asarray(w), jnp.asarray(bias))

idx = rng.choice(48 * 48, size=100, replace=False)
pos = np.stack([idx // 48, idx % 48], -1).astype(np.float32)
xg = rng.randn(100, g).astype(np.float32)
pos_p, xg_p, valid = pad_agents(jnp.asarray(pos), jnp.asarray(xg))
geo = jax.jit(lambda p, xx, v: graph_filter_geometric(
    p, xx, 6.0, jnp.asarray(w), jnp.asarray(bias), v))(pos_p, xg_p, valid)

adj = adjacency_from_positions(jnp.asarray(pos), 6.0)
gso = normalize_adjacency(adj)

from gnn_pathplanning_tpu.ops.pallas_swarm import (block_pair_mask,
                                                   geometric_spmm)

# Rectangular sender x receiver SpMM (the agent-sharded rollout's form):
# senders = all 100 agents, receivers = the first 50.
recv_pos, _, recv_valid = pad_agents(jnp.asarray(pos[:50]))
rect_mask = block_pair_mask(pos_p, 6.0, valid, recv_pos, recv_valid)
rect = jax.jit(lambda: geometric_spmm(pos_p, xg_p, 6.0, valid, rect_mask,
                                      recv_pos=recv_pos,
                                      recv_valid=recv_valid))()

# Compacted scalar-prefetch grid on a multi-block swarm (cap from the true
# max per-receiver sender count, so the compact kernels — not the fallback —
# are what compiles and runs on the chip).
from gnn_pathplanning_tpu.ops.pallas_swarm import spatial_sort

idx2 = rng.choice(64 * 64, size=512, replace=False)
pos2 = np.stack([idx2 // 64, idx2 % 64], -1).astype(np.float32)
pos2 = pos2[np.asarray(spatial_sort(jnp.asarray(pos2), cell=6.0))]
x2 = rng.randn(512, g).astype(np.float32)
pos2_p, x2_p, valid2 = pad_agents(jnp.asarray(pos2), jnp.asarray(x2))
mask2 = block_pair_mask(pos2_p, 6.0, valid2)
cap = int(np.asarray(mask2).sum(axis=0).max())
compact = jax.jit(lambda p, xx, v: graph_filter_geometric(
    p, xx, 6.0, jnp.asarray(w), jnp.asarray(bias), v, cap=cap))(
        pos2_p, x2_p, valid2)

# Multi-sender-per-step compact grid + bf16 features on the real chip.
from gnn_pathplanning_tpu.ops.pallas_swarm import (compact_sender_index,
                                                   geometric_spmm_compact)

cidx, ccount, coverflow = compact_sender_index(mask2, cap)
assert not bool(coverflow)
spmm_s1 = jax.jit(lambda: geometric_spmm_compact(
    pos2_p, x2_p, 6.0, valid2, cidx, ccount))()
spmm_s4 = jax.jit(lambda: geometric_spmm_compact(
    pos2_p, x2_p, 6.0, valid2, cidx, ccount, senders_per_step=4))()
spmm_bf16 = jax.jit(lambda: geometric_spmm_compact(
    pos2_p, x2_p.astype(jnp.bfloat16), 6.0, valid2, cidx, ccount,
    senders_per_step=4))()

# Compact degree kernel on the real chip (column-form output path).
from gnn_pathplanning_tpu.ops.pallas_swarm import geometric_degrees_compact

deg_vpu = jax.jit(lambda: geometric_degrees_compact(
    pos2_p, 6.0, valid2, cidx, ccount))()

# --- B=4440 FOV + forward canary (the round-2 miscompile class: an
# XLA:TPU scatter at >=24k windows silently zeroed the goal channel and a
# full eval sweep scored 0.005 while CPU scored 0.886 — ROUND2.md). Renders
# the full test-sweep batch shape [4440, 10] on the chip; the parent
# compares the observations bit-wise to CPU and checks argmax agreement
# through the full DCP forward.
from gnn_pathplanning_tpu.ops.fov import render_fov
from gnn_pathplanning_tpu.models.dcp import DCPConfig, DCPNet

rngc = np.random.RandomState(1234)
B, N, W = 4440, 10, 20
grids = (rngc.rand(B, W, W) < 0.1).astype(np.float32)
cells = np.argsort(rngc.rand(B, W * W), axis=1)[:, :2 * N]
posc = np.stack([cells[:, :N] // W, cells[:, :N] % W], -1).astype(np.int32)
goalc = np.stack([cells[:, N:] // W, cells[:, N:] % W], -1).astype(np.int32)
obs4440 = jax.jit(jax.vmap(render_fov))(
    jnp.asarray(grids), jnp.asarray(posc), jnp.asarray(goalc))

dcp = DCPNet(DCPConfig(num_taps=3))
dcp_vars = dcp.init_variables(jax.random.PRNGKey(0), N)
adjc = jax.vmap(adjacency_from_positions, in_axes=(0, None))(
    jnp.asarray(posc, jnp.float32), jnp.float32(5.0))
gsoc = jax.vmap(normalize_adjacency)(adjc)
logits4440 = jax.jit(lambda o, s: dcp.apply(dcp_vars, o, s, train=False))(
    obs4440, gsoc)
acts4440 = np.asarray(jnp.argmax(logits4440, -1))

np.savez(out_path, dense=np.asarray(dense), geo=np.asarray(geo),
         valid=np.asarray(valid), gso=np.asarray(gso),
         rect=np.asarray(rect), recv_valid=np.asarray(recv_valid),
         pos2=pos2, x2=x2, compact=np.asarray(compact),
         valid2=np.asarray(valid2), spmm_s1=np.asarray(spmm_s1),
         spmm_s4=np.asarray(spmm_s4), spmm_bf16=np.asarray(spmm_bf16),
         deg_vpu=np.asarray(deg_vpu),
         fov4440=np.asarray(obs4440), acts4440=acts4440)
print("tpu child ok")
"""


def _canary_inputs():
    rngc = np.random.RandomState(1234)
    B, N, W = 4440, 10, 20
    grids = (rngc.rand(B, W, W) < 0.1).astype(np.float32)
    cells = np.argsort(rngc.rand(B, W * W), axis=1)[:, :2 * N]
    posc = np.stack([cells[:, :N] // W, cells[:, :N] % W], -1).astype(np.int32)
    goalc = np.stack([cells[:, N:] // W, cells[:, N:] % W],
                     -1).astype(np.int32)
    return grids, posc, goalc


@pytest.fixture(scope="module")
def tpu_results(tmp_path_factory):
    out = tmp_path_factory.mktemp("tpu") / "results.npz"
    env = dict(os.environ)
    for k in ("JAX_PLATFORMS", "XLA_FLAGS"):
        env.pop(k, None)
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, str(out)], env=env,
        capture_output=True, text=True, timeout=1800,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "tpu child ok" in proc.stdout
    return np.load(out)


def test_dense_graph_filter_matches_cpu(tpu_results):
    import jax.numpy as jnp
    from gnn_pathplanning_tpu.ops.graph_filter import graph_filter
    rng = np.random.RandomState(0)
    b, n, g, f, k = 2, 64, 8, 8, 3
    x = rng.randn(b, n, g).astype(np.float32)
    s = rng.randn(b, n, n).astype(np.float32)
    w = rng.randn(k, g, f).astype(np.float32) * 0.3
    bias = rng.randn(f).astype(np.float32) * 0.3
    want = np.asarray(graph_filter(jnp.asarray(x), jnp.asarray(s),
                                   jnp.asarray(w), jnp.asarray(bias)))
    np.testing.assert_allclose(tpu_results["dense"], want,
                               rtol=2e-4, atol=2e-4)


def test_pallas_geometric_matches_cpu_dense(tpu_results):
    """Real-TPU Mosaic kernel vs CPU dense oracle on the valid lanes."""
    import jax.numpy as jnp
    from gnn_pathplanning_tpu.ops.graph_filter import graph_filter
    rng = np.random.RandomState(0)
    b, n, g, f, k = 2, 64, 8, 8, 3
    _ = rng.randn(b, n, g), rng.randn(b, n, n)      # consume, match child
    w = rng.randn(k, g, f).astype(np.float32) * 0.3
    bias = rng.randn(f).astype(np.float32) * 0.3
    idx = rng.choice(48 * 48, size=100, replace=False)
    pos = np.stack([idx // 48, idx % 48], -1).astype(np.float32)
    xg = rng.randn(100, g).astype(np.float32)

    gso = tpu_results["gso"]
    want = np.asarray(graph_filter(jnp.asarray(xg)[None],
                                   jnp.asarray(gso)[None],
                                   jnp.asarray(w), jnp.asarray(bias)))[0]
    valid = tpu_results["valid"].astype(bool)
    got = tpu_results["geo"][valid]
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_rectangular_spmm_matches_cpu(tpu_results):
    """Real-TPU rectangular (sender x receiver) fused SpMM — the form the
    agent-sharded rollout uses — vs a CPU dense contraction."""
    rng = np.random.RandomState(0)
    b, n, g, f, k = 2, 64, 8, 8, 3
    _ = rng.randn(b, n, g), rng.randn(b, n, n)
    _ = rng.randn(k, g, f), rng.randn(f)
    idx = rng.choice(48 * 48, size=100, replace=False)
    pos = np.stack([idx // 48, idx % 48], -1).astype(np.float32)
    xg = rng.randn(100, g).astype(np.float32)

    d2 = ((pos[:, None] - pos[None, :50]) ** 2).sum(-1)  # [100 send, 50 recv]
    w = ((d2 < 36.0) & (d2 > 0)).astype(np.float32)
    want = w.T @ xg                                       # [50, g]

    recv_valid = tpu_results["recv_valid"].astype(bool)
    got = tpu_results["rect"][recv_valid]
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_compact_geometric_filter_matches_cpu(tpu_results):
    """Real-TPU compacted scalar-prefetch kernels (cap=true max) vs the CPU
    dense oracle on a 512-agent multi-block swarm."""
    import jax.numpy as jnp
    from gnn_pathplanning_tpu.ops.graph_filter import graph_filter
    from gnn_pathplanning_tpu.ops.gso import (adjacency_from_positions,
                                              normalize_adjacency)
    rng = np.random.RandomState(0)
    b, n, g, f, k = 2, 64, 8, 8, 3
    _ = rng.randn(b, n, g), rng.randn(b, n, n)
    w = rng.randn(k, g, f).astype(np.float32) * 0.3
    bias = rng.randn(f).astype(np.float32) * 0.3

    pos2 = tpu_results["pos2"]
    x2 = tpu_results["x2"]
    gso = normalize_adjacency(adjacency_from_positions(jnp.asarray(pos2),
                                                       6.0))
    want = np.asarray(graph_filter(jnp.asarray(x2)[None], gso[None],
                                   jnp.asarray(w), jnp.asarray(bias)))[0]
    got = tpu_results["compact"][tpu_results["valid2"].astype(bool)]
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_multi_sender_and_bf16_spmm_on_tpu(tpu_results):
    """Real-TPU multi-sender compact grid == single-sender grid exactly;
    bf16 features within bf16 rounding of the f32 result."""
    s1 = tpu_results["spmm_s1"]
    s4 = tpu_results["spmm_s4"]
    np.testing.assert_array_equal(s4, s1)
    bf = tpu_results["spmm_bf16"]
    assert bf.dtype == np.float32
    np.testing.assert_allclose(bf, s1, rtol=2e-2, atol=2e-2)

    # And both match the CPU adjacency oracle.
    pos2, x2 = tpu_results["pos2"], tpu_results["x2"]
    d2 = ((pos2[:, None] - pos2[None]) ** 2).sum(-1)
    w = ((d2 < 36.0) & (d2 > 0)).astype(np.float32)
    want = w.T @ x2
    got = s1[tpu_results["valid2"].astype(bool)]
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_fov_canary_b4440_bitwise(tpu_results):
    """The full [4440, 10] FOV render on the chip must be BIT-IDENTICAL to
    CPU — the round-2 scatter miscompile silently zeroed the goal channel
    only above ~24k windows, so small-shape tests cannot stand in for this
    one (ops/fov.py, ROUND2.md 'B=4440 TPU FOV miscompile')."""
    import jax
    import jax.numpy as jnp
    from gnn_pathplanning_tpu.ops.fov import render_fov
    grids, posc, goalc = _canary_inputs()
    want = np.asarray(jax.jit(jax.vmap(render_fov))(
        jnp.asarray(grids), jnp.asarray(posc), jnp.asarray(goalc)))
    got = tpu_results["fov4440"]
    assert got.shape == (4440, 10, 3, 11, 11)
    # goal channel non-degenerate: the miscompile zeroed it in 74% of windows
    assert (got[:, :, 1].sum(axis=(-1, -2)) > 0).mean() > 0.999
    np.testing.assert_array_equal(got, want)


def test_forward_canary_b4440_argmax(tpu_results):
    """Full DCP forward at the eval-sweep batch shape: TPU argmax actions
    must agree with CPU >= 99.5% (residual = bf16-free HIGHEST-precision
    rounding only)."""
    import jax
    import jax.numpy as jnp
    from gnn_pathplanning_tpu.models.dcp import DCPConfig, DCPNet
    from gnn_pathplanning_tpu.ops.gso import (adjacency_from_positions,
                                              normalize_adjacency)
    grids, posc, goalc = _canary_inputs()
    obs = tpu_results["fov4440"]  # bit-identical to CPU per the test above
    dcp = DCPNet(DCPConfig(num_taps=3))
    dcp_vars = dcp.init_variables(jax.random.PRNGKey(0), 10)
    adjc = jax.vmap(adjacency_from_positions, in_axes=(0, None))(
        jnp.asarray(posc, jnp.float32), jnp.float32(5.0))
    gsoc = jax.vmap(normalize_adjacency)(adjc)
    logits = jax.jit(lambda o, s: dcp.apply(dcp_vars, o, s, train=False))(
        jnp.asarray(obs), gsoc)
    want = np.asarray(jnp.argmax(logits, -1))
    got = tpu_results["acts4440"]
    agreement = (got == want).mean()
    assert agreement >= 0.995, f"TPU/CPU argmax agreement {agreement:.4f}"



def test_compact_degrees_match_cpu(tpu_results):
    """Real-TPU compact degree kernel (column-form output): integer
    neighbor counts must match the CPU adjacency oracle exactly."""
    pos2 = tpu_results["pos2"]
    d2 = ((pos2[:, None] - pos2[None]) ** 2).sum(-1)
    w = ((d2 < 36.0) & (d2 > 0)).astype(np.float32)
    deg = tpu_results["deg_vpu"][tpu_results["valid2"].astype(bool)]
    np.testing.assert_array_equal(deg, w.sum(axis=0))

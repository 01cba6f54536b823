"""In-process real-TPU parity record for the Pallas geometric kernels.

The `pytest -m tpu` child-process suite cannot start on this rig (the
spawned child's axon registration conflicts with the running terminal
session's libtpu args — ROUND4.md infra notes), so the same assertions run
IN-PROCESS on the chip and the result is committed as a JSON record.
Checks, against a numpy dense oracle (reference GSO semantics,
/root/reference/utils/multirobotsim_dcenlocal.py:320-365):

- geometric degrees (exhaustive grid, packed block-pair mask): integer-exact
- compact split-precision SpMM: max_abs <= 5e-4 (round-3 parity gate)
- full K-tap geometric filter vs ops.graph_filter dense: <= 5e-4

Usage: python benchmarks/tpu_parity_inproc.py [--out benchmarks/...json]
"""
from __future__ import annotations

import argparse
import json

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarks/tpu_parity_inproc_r4.json")
    ap.add_argument("--agents", type=int, default=900)
    ap.add_argument("--cap", type=int, default=3)
    args = ap.parse_args()

    from gnn_pathplanning_tpu.ops import graph_filter
    from gnn_pathplanning_tpu.ops import pallas_swarm as ps

    rng = np.random.RandomState(7)
    n, g, f, k, world, radius = args.agents, 8, 8, 3, 120, 8.0
    cells = rng.choice(world * world, size=n, replace=False)
    pos = np.stack([cells // world, cells % world], -1).astype(np.float32)
    x = rng.randn(n, g).astype(np.float32)
    w_taps = rng.randn(k, g, f).astype(np.float32) * 0.2

    # numpy dense oracle
    d = np.sqrt(((pos[:, None] - pos[None]) ** 2).sum(-1))
    adj = (d < radius).astype(np.float32)
    np.fill_diagonal(adj, 0)
    deg_want = adj.sum(1)

    pos_p, x_p, valid = ps.pad_agents(jnp.array(pos), jnp.array(x))
    order = ps.spatial_sort(pos_p, radius)
    pos_s, x_s, valid_s = pos_p[order], x_p[order], valid[order]
    inv = jnp.argsort(order)

    degrees_fn, spmm_fn = ps.make_geometric_ops(pos_s, valid_s, radius,
                                                cap=args.cap)
    deg = np.asarray(jax.jit(degrees_fn)())[inv][:n]
    spmm = np.asarray(jax.jit(spmm_fn)(x_s))[inv][:n]
    spmm_want = adj.T @ x

    filt = np.asarray(jax.jit(
        lambda: ps.graph_filter_geometric(pos_s, x_s, radius,
                                          jnp.array(w_taps), valid=valid_s,
                                          cap=args.cap))())[inv][:n]
    dinv = np.where(deg_want > 0, 1.0 / np.sqrt(np.maximum(deg_want, 1e-9)),
                    0.0)
    gso = dinv[:, None] * adj * dinv[None, :]
    # float64 numpy oracle — computing the dense filter on-device would
    # make the oracle itself bf16-truncated (default TPU matmul precision)
    # and dominate the measured "error".
    z = x.astype(np.float64)
    s64 = gso.astype(np.float64).T          # z_k[n] = sum_m S[m, n] z_{k-1}[m]
    filt_want64 = z @ w_taps[0].astype(np.float64)
    for kk in range(1, k):
        z = s64 @ z
        filt_want64 = filt_want64 + z @ w_taps[kk].astype(np.float64)
    filt_want = filt_want64.astype(np.float32)
    # the production dense path on the same device, for comparison
    filt_dense = np.asarray(graph_filter(
        jnp.array(x)[None], jnp.array(gso.astype(np.float32))[None],
        jnp.array(w_taps)))[0]

    rec = {
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "agents": n,
        "cap": args.cap,
        "degrees_max_abs": float(np.abs(deg - deg_want).max()),
        "degrees": "integer-exact" if np.array_equal(deg, deg_want)
                   else "NOT exact",
        "spmm_max_abs": float(np.abs(spmm - spmm_want).max()),
        "filter_max_abs": float(np.abs(filt - filt_want).max()),
        "dense_path_max_abs_same_device":
            float(np.abs(filt_dense - filt_want).max()),
        "tolerance": "5e-4 (round-3 parity gate)",
    }
    ok = (rec["degrees"] == "integer-exact" and rec["spmm_max_abs"] < 5e-4
          and rec["filter_max_abs"] < 5e-4)
    rec["pass"] = ok
    print(json.dumps(rec, indent=1))
    with open(args.out, "w") as fh:
        json.dump(rec, fh, indent=1)
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()

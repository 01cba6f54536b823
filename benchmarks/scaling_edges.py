"""Edges/s weak-scaling harness for the agent-sharded K-hop graph filter.

BASELINE.md target: >=80% edges/s scaling efficiency (measured at 1 chip,
1 host, N hosts). Pod hardware is not available on this rig, so the harness
runs two regimes and labels them:

- ``--platform cpu``: 1/2/4/8 *virtual* host-CPU devices
  (xla_force_host_platform_device_count) — validates the sharded program's
  communication structure and measures algorithmic weak-scaling shape
  (collective volume per chip stays constant), not ICI bandwidth.
- ``--platform tpu``: the single real chip — the absolute per-chip number.

Weak scaling: per-device agent count is fixed (``--n-per-device``); the
swarm area grows with N so the expected degree (edges per agent) stays
constant; each measurement reports directed-edge traversals per second
through the K-tap filter: edges * (K-1) hops * iters / time.

Usage:
  python benchmarks/scaling_edges.py --platform cpu --devices 1 2 4 8
  python benchmarks/scaling_edges.py --platform tpu --devices 1

Writes JSON (one object per device count + an efficiency summary) to
``--out`` (default benchmarks/scaling_edges.json) and prints it.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", choices=["cpu", "tpu"], default="cpu")
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--n-per-device", type=int, default=512)
    p.add_argument("--feats", type=int, default=128)
    p.add_argument("--taps", type=int, default=3)
    p.add_argument("--degree", type=float, default=24.0,
                   help="target mean #neighbors per agent")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--geometric", action="store_true",
                   help="route through the fused Pallas kernels "
                        "(real TPU only)")
    p.add_argument("--cap", type=int, default=None,
                   help="route geometric kernels through the compacted "
                        "scalar-prefetch grid with this sender cap")
    p.add_argument("--halo", action="store_true",
                   help="strip-partitioned neighbor-only halo exchange "
                        "(constant per-chip collective volume; requires "
                        "the strip invariant — the harness sorts agents "
                        "and verifies it)")
    p.add_argument("--out", type=str,
                   default=str(REPO / "benchmarks" / "scaling_edges.json"))
    return p.parse_args()


def make_swarm(n: int, degree: float, seed: int):
    """Positions uniform over an area sized for the target mean degree:
    E[deg] ~= density * pi * r^2 with r fixed at 6 (the reference commR)."""
    r = 6.0
    density = degree / (np.pi * r * r)
    side = np.sqrt(n / density)
    rng = np.random.RandomState(seed)
    # unique integer-ish positions are not required for the dense path;
    # jitter breaks exact ties for the geometric kernels' self-edge rule
    pos = rng.rand(n, 2).astype(np.float32) * side
    d2 = ((pos[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
    edges = int((d2 < r * r).sum() - n)  # directed, self excluded
    return pos, r, edges


def measure(n_devices: int, args) -> dict:
    import jax
    import jax.numpy as jnp
    from gnn_pathplanning_tpu.parallel import make_mesh
    from gnn_pathplanning_tpu.parallel.swarm import (graph_filter_body,
                                                     gso_cols_body)

    mesh = make_mesh(n_devices, ("agents",))
    n = args.n_per_device * n_devices
    pos, r, edges = make_swarm(n, args.degree, seed=1337)
    if args.halo:
        from gnn_pathplanning_tpu.parallel import (strip_halo_exact,
                                                   strip_partition)
        pos = pos[strip_partition(pos)]
        if not strip_halo_exact(pos, n_devices, r):
            print(f"d={n_devices}: strip invariant violated "
                  "(strips narrower than commR) — halo result approximate",
                  file=sys.stderr)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.rand(n, args.feats).astype(np.float32))
    w = jnp.asarray(rng.rand(args.taps, args.feats, args.feats)
                    .astype(np.float32) * 0.1)
    pos_j = jnp.asarray(pos)
    rr = jnp.float32(r)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    if args.halo:
        from gnn_pathplanning_tpu.parallel.halo import halo_filter_body

        def body(pos_loc, x_loc):
            return halo_filter_body(x_loc, pos_loc, rr, w, None, "agents",
                                    n_devices, geometric=args.geometric,
                                    cap=args.cap)
        check = not args.geometric
    elif args.geometric:
        from gnn_pathplanning_tpu.parallel.swarm_rollout import (
            geometric_filter_body)

        def body(pos_loc, x_loc):
            pos_full = jax.lax.all_gather(pos_loc, "agents", tiled=True)
            return geometric_filter_body(x_loc, pos_loc, pos_full, rr, w,
                                         None, "agents", cap=args.cap)
        check = False
    else:
        def body(pos_loc, x_loc):
            s_cols = gso_cols_body(pos_loc, rr, "agents")
            return graph_filter_body(x_loc, s_cols, w, None, "agents")
        check = True

    sharded = shard_map(
        body, mesh=mesh, in_specs=(P("agents", None), P("agents", None)),
        out_specs=P("agents", None), check_vma=check)

    # Chain applications inside ONE jit and take the slope between two
    # chain lengths: per-dispatch floors (this rig's tunnel adds ~25 ms,
    # and Mosaic-containing programs do not pipeline across dispatches)
    # cancel exactly. A python loop of step() calls measured the floor,
    # not the kernel, for the pallas paths.
    def timed(c, reps=3):
        @jax.jit
        def chained(p, z):
            def it(_, acc):
                out = sharded(p, acc)
                return acc * 0.999999 + out * 1e-12
            return jax.lax.fori_loop(0, c, it, z)

        jax.block_until_ready(chained(pos_j, x))  # compile + warm
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(chained(pos_j, x))
            best = min(best, time.perf_counter() - t0)
        return best

    c1, c2 = 1, max(2, args.iters)
    t1, t2 = timed(c1), timed(c2)
    dt = (t2 - t1) / (c2 - c1) * args.iters  # per-iter slope x iters

    hops = args.taps - 1
    # Slope timing can go non-positive under timer noise when the per-iter
    # cost is tiny relative to the dispatch floor (ADVICE r3): flag the row
    # instead of emitting an absurd rate, and record both raw times so
    # pathological rows stay diagnosable.
    slope_valid = dt > 0 and (t2 - t1) > 0.02 * t1
    edges_per_s = (edges * hops * args.iters / dt) if slope_valid else None
    n_loc = n // n_devices
    if args.halo:
        # Neighbor-only exchange: per hop each chip sends/receives its
        # [N/d, G] block to/from both adjacent strips; plus one [N/d, 2]
        # position and one [N/d] degree exchange per application.
        # CONSTANT in the device count — the weak-scaling property.
        gather_bytes = (hops * 2 * n_loc * args.feats
                        + 2 * n_loc * 3) * 4
        flops = hops * 2 * (3 * n_loc) * n_loc * args.feats
    else:
        # Analytic per-chip collective volume per filter application: each
        # hop all_gathers the full feature matrix ([N, G] f32) as the halo.
        gather_bytes = hops * n * args.feats * 4
        # Per-chip matmul work per application (dense column-block path):
        # GSO build [N, N/d] + hops x [N, N/d] x [N/d, G] contractions.
        flops = hops * 2 * n * n_loc * args.feats
    return {"devices": n_devices, "agents": n, "edges": edges,
            "hops": hops, "iters": args.iters, "seconds": dt,
            "edges_per_s": edges_per_s,
            "slope_valid": slope_valid,
            "raw_chain_seconds": {"c1": [c1, t1], "c2": [c2, t2]},
            "per_chip_gather_bytes_per_iter": gather_bytes,
            "per_chip_dense_flops_per_iter": flops}


def main() -> int:
    args = parse_args()
    if args.geometric and args.platform == "cpu":
        print("--geometric needs the real TPU (pallas lowering)",
              file=sys.stderr)
        return 2
    if args.platform == "cpu":
        import os
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count="
                f"{max(args.devices)}").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax
        if args.devices != [1]:
            print("only 1 real chip on this rig; use --devices 1",
                  file=sys.stderr)
            return 2

    rows = [measure(d, args) for d in args.devices]
    base = rows[0]["edges_per_s"] / rows[0]["devices"]
    # Keep the MEASURED wall-clock section and the ANALYTIC section
    # structurally separate so a virtual-mesh wall-time ratio can never be
    # read as the >=80% interconnect-scaling target (VERDICT r2 weak #6):
    # on the CPU mesh the d devices timeshare 2 physical cores, so the
    # wall-time ratio measures host compute, not scaling.
    for row in rows:
        ratio = row["edges_per_s"] / (row["devices"] * base)
        if args.platform == "cpu":
            row["host_wall_time_ratio_NOT_scaling_efficiency"] = ratio
        else:
            row["scaling_efficiency"] = ratio
    vols = [r.pop("per_chip_gather_bytes_per_iter") for r in rows]
    flops = [r.pop("per_chip_dense_flops_per_iter") for r in rows]
    analytic = {
        "what": ("per-chip collective volume per filter application, from "
                 "the program's communication structure (the quantity that "
                 "determines weak scaling on real ICI): constant in d for "
                 "the halo path, growing ~linearly for all_gather paths"),
        "devices": [r["devices"] for r in rows],
        "per_chip_gather_bytes_per_iter": vols,
        "per_chip_dense_flops_per_iter": flops,
        "constant_across_devices": len(set(vols)) == 1,
    }
    result = {
        "platform": args.platform,
        "label": ("virtual host-CPU mesh: wall-time ratios reflect 2-core "
                  "host compute only — they validate that the sharded "
                  "program compiles/executes at every d; the scaling "
                  "argument lives in the 'analytic' section"
                  if args.platform == "cpu"
                  else "single real TPU v5e chip"),
        "path": ("geometric-pallas" if args.geometric
                 else "halo-strips" if args.halo else "dense-columns"),
        "n_per_device": args.n_per_device, "feats": args.feats,
        "taps": args.taps, "target_degree": args.degree,
        "measured": rows,
        "analytic": analytic,
    }
    if args.platform == "tpu":
        # d=1 absolute anchor: useful-byte traffic of one filter application
        # vs the HBM roofline (v5e ~819 GB/s). Bytes = K-1 hops of
        # (x read + z write) + taps contraction in/out, f32.
        V5E_HBM_GBPS = 819.0
        n = rows[0]["agents"]
        hops = rows[0]["hops"]
        useful = (hops * 2 * n * args.feats
                  + n * args.taps * args.feats + n * args.feats) * 4
        dt_iter = rows[0]["seconds"] / rows[0]["iters"]
        result["roofline_anchor"] = {
            "useful_bytes_per_iter": useful,
            "achieved_useful_gbps": useful / dt_iter / 1e9,
            "hbm_roofline_pct": 100 * useful / dt_iter / 1e9 / V5E_HBM_GBPS,
            "edges_per_s_absolute": rows[0]["edges_per_s"],
        }
    Path(args.out).write_text(json.dumps(result, indent=2))
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())

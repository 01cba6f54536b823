"""Dense vs geometric (Pallas) FULL-filter crossover table (VERDICT r3 #4).

The round-3 roofline's dense-vs-fused story was self-contradictory (fused
1.32x at N=1024, 0.18-0.25x at 4096): its dense chain hoisted the GSO build
out of the fori_loop (constant positions), timing only the hop matmul,
while the fused legs rebuilt weights per application — inconsistent
hoisting across legs made the ratios meaningless. This harness measures the
FULL K-tap filter application exactly as the closed-loop rollout pays it,
for every path, with positions made iteration-dependent (pos + z[0,0]*1e-30
adds exactly 0.0 in f32) so NOTHING is hoisted in ANY leg:

- ``dense``:    adjacency_from_positions + normalize_adjacency +
                ops.graph_filter (the production small-N path; O(N^2) HBM).
- ``geometric``: graph_filter_geometric, exhaustive block grid.
- ``compact``:  graph_filter_geometric with the scalar-prefetch compact
                grid (cap = measured max active senders per receiver).

One row per N in one JSON; per-application seconds via the chained-slope
method (pallas_roofline.measure_chained: the axon tunnel's per-dispatch
premium cancels in the slope). Dense rows that exceed HBM raise and are
recorded as such — at N >= 32768 the [N, N] GSO (>= 4 GB) genuinely cannot
exist, which is the regime the Pallas stack is for.

Run on the real chip:
  python benchmarks/crossover.py --sizes 1024 2048 4096 8192 16384 32768
Writes benchmarks/crossover.json.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", type=int, nargs="+",
                   default=[1024, 2048, 4096, 8192, 16384, 32768])
    p.add_argument("--feats", type=int, default=128)
    p.add_argument("--taps", type=int, default=3)
    p.add_argument("--degree", type=float, default=24.0)
    p.add_argument("--chain", type=int, default=30)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--dense-max", type=int, default=16384,
                   help="attempt the dense path up to this N (beyond it "
                        "the [N, N] GSO is known not to fit; the row "
                        "records dense as impossible)")
    p.add_argument("--interpret", action="store_true")
    p.add_argument("--out", type=str,
                   default=str(REPO / "benchmarks" / "crossover.json"))
    return p.parse_args()


def measure_size(n: int, args) -> dict:
    import jax
    import jax.numpy as jnp

    from benchmarks.pallas_roofline import make_swarm, measure_chained
    from gnn_pathplanning_tpu.ops.graph_filter import graph_filter
    from gnn_pathplanning_tpu.ops.gso import (adjacency_from_positions,
                                              normalize_adjacency)
    from gnn_pathplanning_tpu.ops.pallas_swarm import (
        block_pair_mask, compact_sender_index, graph_filter_geometric,
        pad_agents, spatial_sort)

    g = args.feats
    pos, r = make_swarm(n, args.degree)
    pos = pos[np.asarray(spatial_sort(jnp.asarray(pos), cell=float(r)))]
    rng = np.random.RandomState(7)
    x = rng.rand(n, g).astype(np.float32)
    taps = jnp.asarray(rng.randn(args.taps, g, g).astype(np.float32) * 0.05)
    bias = jnp.zeros((g,), jnp.float32)
    posj = jnp.asarray(pos)
    x0 = jnp.asarray(x)

    pos_pad, x_pad, valid = pad_agents(posj, x0)
    mask = block_pair_mask(pos_pad, float(r), valid)
    cap = int(np.asarray(mask).sum(axis=0).max())
    row = {"agents": n, "radius": float(r), "cap": cap,
           "active_pairs": int(np.asarray(mask).sum()),
           "blocks": int(pos_pad.shape[0]) // 128}

    def dep(p, z):
        # adds exactly 0.0 in f32 but makes positions depend on the chain
        # value, so no leg can hoist its graph build out of the loop
        return p + z.reshape(-1)[0] * 1e-30

    def dense_chain(c):
        @jax.jit
        def run(z):
            def body(_, zz):
                p = dep(posj, zz)
                s = normalize_adjacency(adjacency_from_positions(p, r))
                return graph_filter(zz[None], s[None], taps, bias)[0]
            return jax.lax.fori_loop(0, c, body, z)
        return run

    def geo_chain(c):
        @jax.jit
        def run(z):
            def body(_, zz):
                p = dep(pos_pad, zz)
                return graph_filter_geometric(
                    p, zz, r, taps, bias, valid,
                    interpret=args.interpret)
            return jax.lax.fori_loop(0, c, body, z)
        return run

    def compact_chain(c):
        @jax.jit
        def run(z):
            def body(_, zz):
                p = dep(pos_pad, zz)
                return graph_filter_geometric(
                    p, zz, r, taps, bias, valid, cap=cap,
                    interpret=args.interpret)
            return jax.lax.fori_loop(0, c, body, z)
        return run

    legs = [("geometric", geo_chain, x_pad), ("compact", compact_chain, x_pad)]
    if n <= args.dense_max:
        legs.insert(0, ("dense", dense_chain, x0))
    else:
        row["dense_per_app_s"] = None
        row["dense_error"] = (f"not attempted: [N,N] GSO at N={n} is "
                              f"{4 * n * n / 2 ** 30:.1f} GiB per matrix")
    for name, mk, z0 in legs:
        try:
            t1, tc, used_c, per = measure_chained(mk, z0, args)
            row[f"{name}_per_app_s"] = per
            row[f"{name}_chain"] = used_c
            row[f"{name}_raw"] = {"t1": t1, "tc": tc}
        except Exception as e:      # OOM etc. — record honestly
            row[f"{name}_per_app_s"] = None
            row[f"{name}_error"] = repr(e)[:300]
        print(f"N={n} {name}: {row.get(f'{name}_per_app_s')}", flush=True)
    for name in ("geometric", "compact"):
        d, p = row.get("dense_per_app_s"), row.get(f"{name}_per_app_s")
        if d and p:
            row[f"{name}_speedup_vs_dense"] = d / p
    return row


def main() -> int:
    args = parse_args()
    import jax
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    rows = [measure_size(n, args) for n in args.sizes]
    result = {
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "feats": args.feats, "taps": args.taps,
        "target_degree": args.degree,
        "method": ("FULL K-tap filter application per leg (degrees + "
                   "normalization + hops + tap contraction), positions "
                   "iteration-dependent so no leg hoists its graph build; "
                   "per-app seconds from the chained slope"),
        "rows": rows}
    Path(args.out).write_text(json.dumps(result, indent=2))
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())

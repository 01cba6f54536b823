"""Per-grid-step anatomy of the compact scalar-prefetch SpMM kernel.

ROUND2 measured the compact grid at ~317 ns/grid-step (N=16k) and
attributed the gap to roofline to "per-grid-step fixed cost of a different
origin" — a conjecture. This benchmark replaces it with evidence by timing
stage-isolated kernel variants on the SAME grid/specs and differencing:

- ``bookkeeping``: grid + scalar-prefetch loop with constant index maps
  (every DMA hits the same block -> elided) and an empty body.
- ``dma_only``: real index maps, body only accumulates the x block
  (x DMA + out r/w, no matmul, no weights).
- ``matmul_only``: x DMA + one 128x128xG MXU matmul with a scalar-filled
  weight matrix (no weight computation).
- ``weights_hoisted`` / ``weights_legacy``: weight computation only —
  the round-4 receiver-hoisted [recv, send] build (relayouts paid once
  per receiver block, VMEM scratch) vs the round-3 per-step-transpose
  orientation.
- ``full_hoisted`` / ``full_legacy``: the full SpMM step in both
  orientations (hoisted also drops the matmul-side ``w.T``).

ns/step for each, with the dispatch floor cancelled by chaining dependent
calls inside one jit (same method as pallas_roofline.py).

Usage (real chip): python benchmarks/kernel_anatomy.py --agents 16384
Writes benchmarks/kernel_anatomy.json.
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
    p.add_argument("--agents", type=int, nargs="+", default=[4096, 16384])
    p.add_argument("--feats", type=int, default=128)
    p.add_argument("--degree", type=float, default=24.0)
    p.add_argument("--chain", type=int, default=30)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--interpret", action="store_true",
                   help="interpret-mode smoke run (CPU; timings are "
                        "meaningless, validates the variants execute)")
    p.add_argument("--out", type=str,
                   default=str(REPO / "benchmarks" / "kernel_anatomy.json"))
    return p.parse_args()


def build_variants(pos_pad, valid, r, idx, count, g, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gnn_pathplanning_tpu.ops.pallas_swarm import (
        BLOCK, _compact_plane_specs, _hoist_recv_planes, _pair_weights_rs,
        _planes, _recv_scratch, _unpack)

    nb_r = pos_pad.shape[0] // BLOCK
    cap = idx.shape[1]
    r2 = (jnp.asarray(r, jnp.float32) ** 2).reshape(1)
    ps_v = _planes(pos_pad, valid)
    send_v, recv_v = _compact_plane_specs()
    x_spec = pl.BlockSpec((BLOCK, g),
                          lambda j, k, idx_ref, cnt, r2: (idx_ref[j, k], 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((BLOCK, g), lambda j, k, *_: (j, 0),
                            memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec((BLOCK, g), lambda j, k, *_: (0, 0),
                              memory_space=pltpu.VMEM)

    def call(kernel, in_specs, *ops_, scratch=False):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3, grid=(nb_r, cap),
            in_specs=in_specs, out_specs=out_spec,
            scratch_shapes=_recv_scratch() if scratch else [])
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb_r * BLOCK, g), jnp.float32),
            interpret=interpret,
        )(idx, count, r2, *ops_)

    # -- bookkeeping: constant index maps (same-block DMAs elided), no body
    def k_book(idx_ref, cnt_ref, r2_ref, x_ref, out_ref):
        j, k = pl.program_id(0), pl.program_id(1)

        @pl.when((j == 0) & (k == 0))
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

    # -- dma_only: real x DMA + out accumulate
    def k_dma(idx_ref, cnt_ref, r2_ref, x_ref, out_ref):
        j, k = pl.program_id(0), pl.program_id(1)

        @pl.when(k == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        @pl.when(k < cnt_ref[j])
        def _():
            out_ref[:] += x_ref[:]

    # -- matmul_only: x DMA + MXU matmul with scalar-filled weights
    def k_mm(idx_ref, cnt_ref, r2_ref, x_ref, out_ref):
        j, k = pl.program_id(0), pl.program_id(1)

        @pl.when(k == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        @pl.when(k < cnt_ref[j])
        def _():
            w = jnp.full((BLOCK, BLOCK), r2_ref[0] * 1e-9, jnp.float32)
            out_ref[:] += jnp.dot(w, x_ref[:],
                                  preferred_element_type=jnp.float32)

    # -- weights only (+ cheap row-sum), receiver-hoisted r4 route
    def k_wonly(idx_ref, cnt_ref, r2_ref, pi_ref, pj_ref, x_ref, out_ref,
                rx_ref, ry_ref, rv_ref):
        j, k = pl.program_id(0), pl.program_id(1)

        @pl.when(k == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
            _hoist_recv_planes(pj_ref, rx_ref, ry_ref, rv_ref)

        @pl.when(k < cnt_ref[j])
        def _():
            w = _pair_weights_rs(rx_ref[:], ry_ref[:], rv_ref[:],
                                 *_unpack(pi_ref), r2_ref[0])
            out_ref[:, :1] += jnp.sum(w, axis=1, keepdims=True)

    # -- weights only, round-3 legacy orientation (per-step sender
    # transpose + matmul-side w.T) kept for the A/B record
    def _pair_weights_legacy(xi, yi, vi, xj, yj, vj, rr2):
        dx = xi[:, None] - xj[None, :]
        dy = yi[:, None] - yj[None, :]
        d2 = dx * dx + dy * dy
        w = jnp.where(d2 < rr2, 1.0, 0.0)
        w = jnp.where(d2 == 0.0, 0.0, w)
        return w * vi[:, None] * vj[None, :]

    def k_wonly_legacy(idx_ref, cnt_ref, r2_ref, pi_ref, pj_ref, x_ref,
                       out_ref):
        j, k = pl.program_id(0), pl.program_id(1)

        @pl.when(k == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        @pl.when(k < cnt_ref[j])
        def _():
            w = _pair_weights_legacy(*_unpack(pi_ref), *_unpack(pj_ref),
                                     r2_ref[0])
            out_ref[0, :] += jnp.sum(w, axis=0)[:g]

    # -- full production kernel (r4 receiver-hoisted, no matmul transpose)
    def k_full(idx_ref, cnt_ref, r2_ref, pi_ref, pj_ref, x_ref, out_ref,
               rx_ref, ry_ref, rv_ref):
        j, k = pl.program_id(0), pl.program_id(1)

        @pl.when(k == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
            _hoist_recv_planes(pj_ref, rx_ref, ry_ref, rv_ref)

        @pl.when(k < cnt_ref[j])
        def _():
            w = _pair_weights_rs(rx_ref[:], ry_ref[:], rv_ref[:],
                                 *_unpack(pi_ref), r2_ref[0])
            out_ref[:] += jnp.dot(w.astype(x_ref.dtype), x_ref[:],
                                  preferred_element_type=jnp.float32)

    # -- software-pipelined full kernel: grid (nb_r, cap+1); step k builds
    # the weights of pair (j, k) into wbuf[k%2] while the MXU consumes
    # wbuf[(k-1)%2] against pair (j, k-1)'s x block — the build and the
    # matmul of one step are INDEPENDENT, so Mosaic may schedule VPU and
    # MXU concurrently instead of serializing them (the serial sum is the
    # round-3 389 ns; the overlapped bound is max(build, matmul+dma)).
    def k_full_pipe(idx_ref, cnt_ref, r2_ref, pi_ref, pj_ref, x_ref,
                    out_ref, rx_ref, ry_ref, rv_ref, wbuf_ref):
        j, k = pl.program_id(0), pl.program_id(1)

        @pl.when(k == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
            _hoist_recv_planes(pj_ref, rx_ref, ry_ref, rv_ref)

        @pl.when((k < cap) & (k < cnt_ref[j]))
        def _():
            w = _pair_weights_rs(rx_ref[:], ry_ref[:], rv_ref[:],
                                 *_unpack(pi_ref), r2_ref[0])
            wbuf_ref[k % 2] = w

        @pl.when((k >= 1) & (k - 1 < cnt_ref[j]))
        def _():
            out_ref[:] += jnp.dot(wbuf_ref[(k - 1) % 2], x_ref[:],
                                  preferred_element_type=jnp.float32)

    def call_pipe(*ops_):
        send_pipe = pl.BlockSpec(
            (3 * 8, BLOCK),
            lambda j, k, idx_ref, cnt, r2: (
                idx_ref[j, jnp.minimum(k, cap - 1)], 0),
            memory_space=pltpu.VMEM)
        recv_pipe = pl.BlockSpec((3 * 8, BLOCK),
                                 lambda j, k, *_: (j, 0),
                                 memory_space=pltpu.VMEM)
        x_pipe = pl.BlockSpec(
            (BLOCK, g),
            lambda j, k, idx_ref, cnt, r2: (
                idx_ref[j, jnp.clip(k - 1, 0, cap - 1)], 0),
            memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3, grid=(nb_r, cap + 1),
            in_specs=[send_pipe, recv_pipe, x_pipe], out_specs=out_spec,
            scratch_shapes=_recv_scratch()
            + [pltpu.VMEM((2, BLOCK, BLOCK), jnp.float32)])
        return pl.pallas_call(
            k_full_pipe, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb_r * BLOCK, g), jnp.float32),
            interpret=interpret,
        )(idx, count, r2, *ops_)

    # -- full kernel, round-3 legacy orientation
    def k_full_legacy(idx_ref, cnt_ref, r2_ref, pi_ref, pj_ref, x_ref,
                      out_ref):
        j, k = pl.program_id(0), pl.program_id(1)

        @pl.when(k == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        @pl.when(k < cnt_ref[j])
        def _():
            w = _pair_weights_legacy(*_unpack(pi_ref), *_unpack(pj_ref),
                                     r2_ref[0])
            out_ref[:] += jnp.dot(w.T, x_ref[:],
                                  preferred_element_type=jnp.float32)

    return {
        "bookkeeping": lambda x: call(k_book, [const_spec], x),
        "dma_only": lambda x: call(k_dma, [x_spec], x),
        "matmul_only": lambda x: call(k_mm, [x_spec], x),
        "weights_hoisted": lambda x: call(k_wonly,
                                          [send_v, recv_v, const_spec],
                                          ps_v, ps_v, x, scratch=True),
        "weights_legacy": lambda x: call(k_wonly_legacy,
                                         [send_v, recv_v, const_spec],
                                         ps_v, ps_v, x),
        "full_hoisted": lambda x: call(k_full, [send_v, recv_v, x_spec],
                                       ps_v, ps_v, x, scratch=True),
        "full_pipelined": lambda x: call_pipe(ps_v, ps_v, x),
        "full_legacy": lambda x: call(k_full_legacy,
                                      [send_v, recv_v, x_spec],
                                      ps_v, ps_v, x),
    }


def main() -> int:
    args = parse_args()
    import jax
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from gnn_pathplanning_tpu.ops.pallas_swarm import (
        block_pair_mask, compact_sender_index, pad_agents, spatial_sort)

    rows = []
    for n in args.agents:
        r = 6.0
        density = args.degree / (np.pi * r * r)
        side = np.sqrt(n / density)
        rng = np.random.RandomState(1337)
        pos = rng.rand(n, 2).astype(np.float32) * side
        pos = np.asarray(pos)[np.asarray(spatial_sort(jnp.asarray(pos),
                                                      cell=r))]
        x = rng.rand(n, args.feats).astype(np.float32)
        pos_pad, x_pad, valid = pad_agents(jnp.asarray(pos), jnp.asarray(x))
        mask = block_pair_mask(pos_pad, r, valid)
        cap = int(np.asarray(mask).sum(axis=0).max())
        idx, count, overflow = compact_sender_index(mask, cap)
        assert not bool(overflow)
        nb = pos_pad.shape[0] // 128
        steps = nb * cap

        variants = build_variants(pos_pad, valid, r, idx, count,
                                  args.feats, interpret=args.interpret)
        row = {"agents": n, "blocks": nb, "cap": cap, "grid_steps": steps,
               "active_pairs": int(np.asarray(mask).sum())}

        for name, fn in variants.items():
            # Two chain lengths; the SLOPE (T2-T1)/(c2-c1) is the true
            # per-call time with any fixed per-dispatch cost (the axon
            # tunnel adds ~tens of ms per jit invocation) cancelled
            # exactly. Dividing one chained run by its length does NOT
            # cancel it: at chain=30 a 25 ms floor masquerades as a flat
            # ~830 us/call "bookkeeping" cost at every N.
            def timed(chain, fn=fn):
                @jax.jit
                def chained(z):
                    def body(_, acc):
                        out = fn(acc)
                        return acc * 0.999999 + out * 1e-12
                    return jax.lax.fori_loop(0, chain, body, z)

                jax.block_until_ready(chained(x_pad))  # compile + warm
                best = np.inf
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    jax.block_until_ready(chained(x_pad))
                    best = min(best, time.perf_counter() - t0)
                return best

            c1, c2 = args.chain, 4 * args.chain
            t1, t2 = timed(c1), timed(c2)
            per_call = (t2 - t1) / (c2 - c1)
            floor = t1 - c1 * per_call
            row[name + "_per_call_s"] = per_call
            row[name + "_ns_per_step"] = 1e9 * per_call / steps
            row[name + "_dispatch_floor_s"] = floor
            print(f"N={n} {name:14s} {per_call * 1e6:9.1f} us/call "
                  f"{1e9 * per_call / steps:7.1f} ns/step "
                  f"(floor {floor * 1e3:6.2f} ms)", flush=True)
        rows.append(row)

    result = {"platform": jax.devices()[0].platform,
              "device": str(jax.devices()[0]),
              "feats": args.feats, "chain": args.chain, "rows": rows}
    Path(args.out).write_text(json.dumps(result, indent=2))
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())

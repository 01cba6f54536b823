"""Pallas TPU kernels for swarm-scale graph convolution.

The reference regime (N <= 64 agents) is served by dense batched matmuls
(ops.graph_filter). At swarm scale (BASELINE.md stress config: 1024+ agents)
the dense GSO costs O(N^2) HBM and the reference rebuilds it per step with an
O(N^3) eigendecomposition connectivity check
(/root/reference/utils/graphUtils/graphTools.py:396-423). These kernels
exploit the *geometric* structure of the communication graph instead:

- Agents are sorted into spatial blocks (``spatial_sort``) so the
  radius-graph adjacency becomes block-banded; only block pairs whose
  bounding boxes come within the communication radius can hold edges
  (``block_pair_mask``).
- The SpMM ``z[n] = sum_m W[m, n] x[m]`` is *fused from positions*: each
  active 128x128 block pair recomputes its pairwise distances on the VPU and
  feeds the resulting 0/1 weights straight into a 128x128xG MXU matmul — the
  N x N matrix never exists in HBM. Inactive block pairs are skipped with
  ``@pl.when`` (no flops, and their feature blocks are never read).
- Degree normalization (D^-1/2 W D^-1/2, same semantics as ops.gso) comes
  from a first fused pass that only accumulates degrees.

Weight-build orientation (round-4 redesign). The round-3 slope-timed anatomy
(benchmarks/kernel_anatomy_r3b.json) decomposed the compact SpMM step at
N=16k as 389 ns = 42 DMA + ~97 MXU matmul + ~240 VPU pair-weight build + 22
bookkeeping, with the VPU build ~1.7x above the ~140 ns floor of the
distance arithmetic itself. The overhead was relayouts: building
``w[send, recv]`` needs the *sender* lane vector transposed into column
(sublane) form — a lane->sublane relayout re-paid at EVERY grid step because
the sender block changes per step — and the matmul then consumed ``w.T``
(another relayout). The kernels now build ``w[recv, send]`` instead: the
expensive column-form broadcast belongs to the RECEIVER, which is constant
across a receiver block's whole sender loop, so it is hoisted into VMEM
scratch and paid once per receiver block (the grid iterates senders
fastest); the sender side only needs a cheap sublane broadcast, and the MXU
consumes ``w[recv, send] @ x[send, G]`` with no transpose. Degrees flow out
in column form ([N, 1]) so no orientation change is ever needed.

Two round-3 experimental paths were REMOVED as measured non-levers
(VERDICT r3 next #6): homogeneous-coordinate MXU weights (0.97x roofline,
degrees 320 vs 242 ns/step) and HBM-cached pair-weight blocks (faster
per-kernel, 287 vs 401 ns, but a rollout-level loss, 381k vs 412k
agent-steps/s, because the w blocks round-trip HBM). Git history holds both.

Layout notes (per the pallas TPU guide): coordinates are stored as separate
x/y planes shaped [NB, BLOCK] so every VMEM block is (1, 128) — lane-aligned;
accumulation across the sender grid dimension happens in the output VMEM
block (grid iterates the last dimension fastest, and the output index map
ignores it).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128  # agent block: MXU/VPU lane aligned


def pad_to_block(n: int) -> int:
    return ((n + BLOCK - 1) // BLOCK) * BLOCK


def pad_agents(pos: jax.Array, x: jax.Array | None = None):
    """Pad [N, ...] agent arrays to a BLOCK multiple; returns
    (pos_pad, x_pad, valid). Padding agents sit at a far-away corner so they
    can never enter anyone's radius even before masking."""
    n = pos.shape[0]
    np_ = pad_to_block(n)
    valid = jnp.zeros((np_,), jnp.float32).at[:n].set(1.0)
    pos_pad = jnp.full((np_, 2), 1e7, jnp.float32).at[:n].set(
        pos.astype(jnp.float32))
    x_pad = None
    if x is not None:
        x_pad = jnp.zeros((np_,) + x.shape[1:], x.dtype).at[:n].set(x)
    return pos_pad, x_pad, valid


def spatial_sort(pos: jax.Array, cell: float) -> jax.Array:
    """Permutation ordering agents by spatial grid cell (row-major bins of
    size ``cell``): nearby agents land in nearby blocks, concentrating edges
    near the block diagonal."""
    c = jnp.floor(pos.astype(jnp.float32) / cell).astype(jnp.int32)
    key = c[:, 0] * 65536 + c[:, 1]
    return jnp.argsort(key)


def _block_boxes(pos: jax.Array, valid: jax.Array):
    """Per-block coordinate bounding boxes (padding lanes excluded):
    (mins [NB, 2], maxs [NB, 2], has_any [NB])."""
    nb = pos.shape[0] // BLOCK
    p = pos.reshape(nb, BLOCK, 2)
    v = valid.reshape(nb, BLOCK, 1) > 0
    big = jnp.float32(1e9)
    mins = jnp.min(jnp.where(v, p, big), axis=1)
    maxs = jnp.max(jnp.where(v, p, -big), axis=1)
    return mins, maxs, jnp.sum(v[..., 0], axis=1) > 0


def block_pair_mask(pos: jax.Array, radius, valid: jax.Array,
                    recv_pos: jax.Array | None = None,
                    recv_valid: jax.Array | None = None) -> jax.Array:
    """[NB_send, NB_recv] int32: could sender block I and receiver block J
    share an edge? Square (recv == send) when recv_pos is omitted."""
    mins_s, maxs_s, has_s = _block_boxes(pos, valid)
    if recv_pos is None:
        mins_r, maxs_r, has_r = mins_s, maxs_s, has_s
    else:
        mins_r, maxs_r, has_r = _block_boxes(recv_pos, recv_valid)
    gap = jnp.maximum(
        jnp.maximum(mins_s[:, None] - maxs_r[None, :],
                    mins_r[None, :] - maxs_s[:, None]), 0.0)
    dist2 = jnp.sum(gap * gap, axis=-1)
    ok = (dist2 < jnp.asarray(radius, jnp.float32) ** 2) \
        & has_s[:, None] & has_r[None, :]
    return ok.astype(jnp.int32)


def _pack_mask(mask: jax.Array) -> jax.Array:
    """Bit-pack the [NB_send, NB_recv] 0/1 block-pair mask along the
    receiver axis into [NB_send, ceil(NB_recv/32)] int32.

    The mask rides scalar-prefetch SMEM (1 MB total on v5e): unpacked it
    is NB^2 * 4 bytes — exactly 1 MB at NB=512 (N=65536 agents), which
    overflowed SMEM by the 148 B the runtime needs for its own scalars
    and made every N=65536 compile fail. Packed it is NB^2 / 8 bytes
    (32 KB at NB=512; headroom to N~1M). Bit 31 makes the word negative;
    the kernels' ``(word >> j) & 1`` test is exact anyway (arithmetic
    shift right only pollutes bits above bit 0)."""
    nb_s, nb_r = mask.shape
    pad = (-nb_r) % 32
    m = jnp.pad(mask, ((0, 0), (0, pad))).reshape(nb_s, -1, 32)
    shifts = jnp.arange(32, dtype=jnp.int32)
    return jnp.sum(m.astype(jnp.int32) << shifts[None, None, :], axis=-1)


def _mask_bit(mask_ref, i, j):
    """Scalar 0/1: was mask[i, j] set, reading the packed bitfield."""
    return (mask_ref[i, j // 32] >> (j % 32)) & 1


def _pair_weights_rs(rx, ry, rv, xs, ys, vs, r2):
    """[recv, send]-oriented 0/1 adjacency; strict < threshold,
    self/duplicate cells removed. Receiver planes ``rx/ry/rv`` arrive
    PRE-BROADCAST in column form ([BLOCK, BLOCK], hoisted per receiver
    block into VMEM scratch); sender lane vectors broadcast along sublanes
    — no per-step relayouts (module notes)."""
    dx = rx - xs[None, :]
    dy = ry - ys[None, :]
    d2 = dx * dx + dy * dy
    w = jnp.where(d2 < r2, 1.0, 0.0)
    w = jnp.where(d2 == 0.0, 0.0, w)  # self-loops / co-located padding
    return w * rv * vs[None, :]


def _split_dot(w, x, out_ref):
    """Accumulate ``w @ x`` into ``out_ref`` at near-f32 accuracy without
    paying the 6-pass HIGHEST matmul.

    On-chip A/B at N=16k (slope-timed): the Mosaic DEFAULT-precision f32
    dot truncates the inputs to bf16 (max_abs ~3e-2 vs the f32 oracle,
    0.8%% relative — would break the 5e-4 kernel-parity gates), while
    HIGHEST is exact but runs the step at 257 ns vs 137 (MXU passes stop
    hiding behind the VPU weight build). The weights are EXACT in bf16
    (0/1), so only ``x`` needs care: split x = hi + lo (both bf16) and
    accumulate two single-pass bf16 matmuls — no w error terms exist, the
    residual is bounded by bf16(lo) truncation (~2^-16 relative; measured
    max_abs 4.5e-5), and the two MXU passes stay largely hidden behind the
    VPU build: 176 ns/step, 2.2x over the round-3 kernel.

    When ``x`` is already bf16 the split degenerates (lo == 0): one pass.
    """
    if x.dtype == jnp.bfloat16:
        out_ref[:] += jnp.dot(w.astype(jnp.bfloat16), x,
                              preferred_element_type=jnp.float32)
        return
    wb = w.astype(jnp.bfloat16)
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    if SPLIT_CONCAT:
        # A/B variant (benchmarks/pallas_roofline.py --concat): one wide
        # MXU pass over [hi | lo] stacked along the output axis instead of
        # two G-wide passes — same FLOPs, fewer MXU issues. Numerically
        # identical accumulation order per output element.
        g = x.shape[-1]
        y = jnp.dot(wb, jnp.concatenate([hi, lo], axis=-1),
                    preferred_element_type=jnp.float32)
        out_ref[:] += y[:, :g] + y[:, g:]
        return
    out_ref[:] += (jnp.dot(wb, hi, preferred_element_type=jnp.float32)
                   + jnp.dot(wb, lo, preferred_element_type=jnp.float32))


# Trace-time switch for the concat split variant above. Benchmarks flip it
# around a fresh jit; shipped default is the measured-best two-dot form.
SPLIT_CONCAT = False


def _hoist_recv_planes(p_ref, rx_ref, ry_ref, rv_ref):
    """Pay the receiver lane->sublane relayouts ONCE per receiver block:
    the column-broadcast coordinate planes live in VMEM scratch across the
    whole sender loop (the grid iterates senders fastest)."""
    xr, yr, vr = _unpack(p_ref)
    rx_ref[:] = jnp.broadcast_to(xr[:, None], (BLOCK, BLOCK))
    ry_ref[:] = jnp.broadcast_to(yr[:, None], (BLOCK, BLOCK))
    rv_ref[:] = jnp.broadcast_to(vr[:, None], (BLOCK, BLOCK))


def _recv_scratch():
    return [pltpu.VMEM((BLOCK, BLOCK), jnp.float32) for _ in range(3)]


# Agent-coordinate "planes" (x, y, valid) are PACKED into one
# [NB * 3 * 8, BLOCK] array per side: per block, rows 0-7 replicate x,
# rows 8-15 y, rows 16-23 valid (each block's 128 lane values replicated
# across 8 sublane rows so every tile is a legal (8, 128) layout). One
# BlockSpec -> ONE DMA per grid step per side instead of three — at swarm
# scale the kernels are DMA-issue-bound (7 DMAs/step measured ~390 ns/step
# vs ~80 ns of useful 64 KB x-block transfer), and dynamic row reads from
# an unblocked VMEM ref are worse still (~50 us each on v5e).
_SUB = 8


def _unpack(p_ref):
    """(x, y, valid) lane vectors from a packed plane block."""
    return p_ref[0], p_ref[_SUB], p_ref[2 * _SUB]


def _degree_kernel(mask_ref, r2_ref, pi_ref, pj_ref, out_ref,
                   rx_ref, ry_ref, rv_ref):
    j, i = pl.program_id(0), pl.program_id(1)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        _hoist_recv_planes(pj_ref, rx_ref, ry_ref, rv_ref)

    @pl.when(_mask_bit(mask_ref, i, j) == 1)
    def _():
        w = _pair_weights_rs(rx_ref[:], ry_ref[:], rv_ref[:],
                             *_unpack(pi_ref), r2_ref[0])
        out_ref[:] += jnp.sum(w, axis=1, keepdims=True)


def _spmm_kernel(mask_ref, r2_ref, pi_ref, pj_ref, x_ref, out_ref,
                 rx_ref, ry_ref, rv_ref):
    j, i = pl.program_id(0), pl.program_id(1)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        _hoist_recv_planes(pj_ref, rx_ref, ry_ref, rv_ref)

    @pl.when(_mask_bit(mask_ref, i, j) == 1)
    def _():
        w = _pair_weights_rs(rx_ref[:], ry_ref[:], rv_ref[:],
                             *_unpack(pi_ref), r2_ref[0])
        _split_dot(w, x_ref[:], out_ref)


def _join_vma(*arrays) -> frozenset:
    """Join of the inputs' varying-mesh-axes sets: under shard_map with
    check_vma, pallas_call out_shapes must declare how outputs vary."""
    vma = frozenset()
    for a in arrays:
        v = getattr(jax.typeof(a), "vma", None)
        if v:
            vma |= v
    return vma


def _planes(pos, valid):
    """[NB * 3 * _SUB, BLOCK] packed sublane-replicated coordinate planes
    (per block: rows 0-7 x, 8-15 y, 16-23 valid)."""
    nb = pos.shape[0] // BLOCK

    def rep(v):
        return jnp.broadcast_to(v.reshape(nb, 1, BLOCK), (nb, _SUB, BLOCK))

    packed = jnp.concatenate([rep(pos[:, 0]), rep(pos[:, 1]), rep(valid)],
                             axis=1)
    return packed.reshape(nb * 3 * _SUB, BLOCK)


def _plane_specs():
    send = pl.BlockSpec((3 * _SUB, BLOCK), lambda j, i: (i, 0),
                        memory_space=pltpu.VMEM)
    recv = pl.BlockSpec((3 * _SUB, BLOCK), lambda j, i: (j, 0),
                        memory_space=pltpu.VMEM)
    return send, recv


def geometric_degrees(pos: jax.Array, radius, valid: jax.Array,
                      mask: jax.Array, interpret: bool = False,
                      recv_pos: jax.Array | None = None,
                      recv_valid: jax.Array | None = None) -> jax.Array:
    """deg[n] = #neighbors within radius (block-sparse fused kernel).

    With ``recv_pos``/``recv_valid`` the senders (``pos``) and receivers
    differ: returns the receivers' degrees w.r.t. the sender set — the
    rectangular form used by the agent-sharded rollout (each chip's
    receivers are its local agents, senders are the full swarm)."""
    nb_s = pos.shape[0] // BLOCK
    ps = _planes(pos, valid)
    if recv_pos is None:
        pr, nb_r = ps, nb_s
    else:
        nb_r = recv_pos.shape[0] // BLOCK
        pr = _planes(recv_pos, recv_valid)
    r2 = (jnp.asarray(radius, jnp.float32) ** 2).reshape(1)
    send, recv = _plane_specs()
    out = pl.pallas_call(
        _degree_kernel,
        grid=(nb_r, nb_s),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  send, recv],
        out_specs=pl.BlockSpec((BLOCK, 1), lambda j, i: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb_r * BLOCK, 1), jnp.float32,
                                       vma=_join_vma(mask, ps, pr)),
        scratch_shapes=_recv_scratch(),
        interpret=interpret,
    )(_pack_mask(mask), r2, ps, pr)
    return out.reshape(-1)


def geometric_spmm(pos: jax.Array, x: jax.Array, radius, valid: jax.Array,
                   mask: jax.Array, interpret: bool = False,
                   recv_pos: jax.Array | None = None,
                   recv_valid: jax.Array | None = None) -> jax.Array:
    """z[n] = sum_m W[m, n] x[m] over the radius graph, fused from
    positions; x is [N_send, G] with N_send a BLOCK multiple. With
    ``recv_pos`` the output covers the (rectangular) receiver set instead
    of the senders."""
    n, g = x.shape
    nb_s = n // BLOCK
    ps = _planes(pos, valid)
    if recv_pos is None:
        pr, n_r = ps, n
    else:
        n_r = recv_pos.shape[0]
        pr = _planes(recv_pos, recv_valid)
    nb_r = n_r // BLOCK
    r2 = (jnp.asarray(radius, jnp.float32) ** 2).reshape(1)
    send, recv = _plane_specs()
    out = pl.pallas_call(
        _spmm_kernel,
        grid=(nb_r, nb_s),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  send, recv,
                  pl.BlockSpec((BLOCK, g), lambda j, i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLOCK, g), lambda j, i: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_r, g), jnp.float32,
                                       vma=_join_vma(mask, ps, pr, x)),
        scratch_shapes=_recv_scratch(),
        interpret=interpret,
    )(_pack_mask(mask), r2, ps, pr, x)
    return out


def compact_sender_index(mask: jax.Array, cap: int):
    """Compact the block-pair mask into per-receiver sender lists.

    The dense-grid kernels iterate ALL (sender, receiver) block pairs and
    rely on ``@pl.when`` to skip compute — but Pallas still DMAs the sender
    x-block for every grid step, so at swarm scale >90% of HBM traffic is
    spent on inactive pairs (measured: N=16384 runs at ~96% of v5e peak
    bandwidth while only 7.7%% of pairs are active). This builds, for each
    receiver block j, the list of active sender blocks so a scalar-prefetch
    grid visits only those.

    Args:
      mask: [NB_send, NB_recv] 0/1 (from :func:`block_pair_mask`).
      cap: static max senders per receiver (grid dimension). With
        ``spatial_sort``-ed agents the active count per receiver is ~the
        neighbor-cell count, roughly constant in N.

    Returns:
      (idx [NB_recv, cap] int32 — active sender blocks first, arbitrary
      fill after; count [NB_recv] int32 clipped to cap; overflow bool —
      True if any receiver had more active senders than cap, i.e. the
      compact kernel WOULD drop edges and the caller must fall back).
    """
    raw = jnp.sum(mask, axis=0)                            # [NB_r]
    order = jnp.argsort(1 - mask, axis=0, stable=True)     # active first
    idx = order[:cap, :].T.astype(jnp.int32)               # [NB_r, cap]
    count = jnp.minimum(raw, cap).astype(jnp.int32)
    # Fill slots (k >= count) repeat the last active sender: Pallas skips
    # the DMA when consecutive grid steps map to the same block, so fill
    # steps cost neither bandwidth nor flops (compute is @pl.when-guarded).
    last = jnp.take_along_axis(idx, jnp.maximum(count - 1, 0)[:, None],
                               axis=1)
    idx = jnp.where(jnp.arange(cap)[None, :] < count[:, None], idx, last)
    return idx, count, jnp.any(raw > cap)


def _degree_kernel_compact(idx_ref, cnt_ref, r2_ref, pi_ref, pj_ref,
                           out_ref, rx_ref, ry_ref, rv_ref):
    j, k = pl.program_id(0), pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        _hoist_recv_planes(pj_ref, rx_ref, ry_ref, rv_ref)

    @pl.when(k < cnt_ref[j])
    def _():
        w = _pair_weights_rs(rx_ref[:], ry_ref[:], rv_ref[:],
                             *_unpack(pi_ref), r2_ref[0])
        out_ref[:] += jnp.sum(w, axis=1, keepdims=True)


def _spmm_kernel_compact(idx_ref, cnt_ref, r2_ref, pi_ref, pj_ref, x_ref,
                         out_ref, rx_ref, ry_ref, rv_ref):
    """Receiver-hoisted compact SpMM. An explicitly software-pipelined
    variant (double-buffered w, matmul one step behind the build) was
    measured SLOWER on-chip (203 vs 150 ns/step at N=16k,
    kernel_anatomy_r4): Mosaic already overlaps the VPU build with the MXU
    matmul inside this plain body (weights 136 + matmul 124 + dma 39 ns in
    isolation sum to ~300, the full step runs at 150), so the extra grid
    step and scratch traffic only added overhead. The pipelined variant
    stays in benchmarks/kernel_anatomy.py as the record."""
    j, k = pl.program_id(0), pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        _hoist_recv_planes(pj_ref, rx_ref, ry_ref, rv_ref)

    @pl.when(k < cnt_ref[j])
    def _():
        w = _pair_weights_rs(rx_ref[:], ry_ref[:], rv_ref[:],
                             *_unpack(pi_ref), r2_ref[0])
        _split_dot(w, x_ref[:], out_ref)


def _make_spmm_kernel_compact_multi(s_per_step: int):
    """Compact SpMM kernel processing ``s_per_step`` sender blocks per grid
    step. One-sender steps are dominated by per-step fixed costs (grid
    bookkeeping + DMA issue); batching S senders amortizes them S-fold
    while keeping the same @pl.when-guarded skip semantics per sender."""

    def kernel(idx_ref, cnt_ref, r2_ref, pr_ref, *rest):
        senders = rest[:s_per_step]
        xs = rest[s_per_step:2 * s_per_step]
        out_ref = rest[2 * s_per_step]
        rx_ref, ry_ref, rv_ref = rest[2 * s_per_step + 1:]
        j, kk = pl.program_id(0), pl.program_id(1)

        @pl.when(kk == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
            _hoist_recv_planes(pr_ref, rx_ref, ry_ref, rv_ref)

        for s in range(s_per_step):
            @pl.when(kk * s_per_step + s < cnt_ref[j])
            def _(s=s):
                w = _pair_weights_rs(rx_ref[:], ry_ref[:], rv_ref[:],
                                     *_unpack(senders[s]), r2_ref[0])
                _split_dot(w, xs[s][:], out_ref)

    return kernel


def _compact_plane_specs():
    # scalar-prefetch index maps receive the prefetch refs after the grid
    # indices: (j, k, idx_ref, cnt_ref, r2_ref)
    send = pl.BlockSpec((3 * _SUB, BLOCK),
                        lambda j, k, idx, cnt, r2: (idx[j, k], 0),
                        memory_space=pltpu.VMEM)
    recv = pl.BlockSpec((3 * _SUB, BLOCK),
                        lambda j, k, idx, cnt, r2: (j, 0),
                        memory_space=pltpu.VMEM)
    return send, recv


def geometric_degrees_compact(pos: jax.Array, radius, valid: jax.Array,
                              idx: jax.Array, count: jax.Array,
                              interpret: bool = False,
                              recv_pos: jax.Array | None = None,
                              recv_valid: jax.Array | None = None) -> jax.Array:
    """Compact-grid variant of :func:`geometric_degrees`: only the (up to
    ``cap``) active sender blocks per receiver are visited/DMA'd."""
    nb_r = (recv_pos if recv_pos is not None else pos).shape[0] // BLOCK
    cap = idx.shape[1]
    r2 = (jnp.asarray(radius, jnp.float32) ** 2).reshape(1)
    ps = _planes(pos, valid)
    pr = ps if recv_pos is None else _planes(recv_pos, recv_valid)
    send, recv = _compact_plane_specs()
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb_r, cap),
        in_specs=[send, recv],
        out_specs=pl.BlockSpec((BLOCK, 1),
                               lambda j, k, *_: (j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=_recv_scratch())
    out = pl.pallas_call(
        _degree_kernel_compact,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb_r * BLOCK, 1), jnp.float32,
                                       vma=_join_vma(idx, ps, pr)),
        interpret=interpret,
    )(idx, count, r2, ps, pr)
    return out.reshape(-1)


def geometric_spmm_compact(pos: jax.Array, x: jax.Array, radius,
                           valid: jax.Array, idx: jax.Array,
                           count: jax.Array, interpret: bool = False,
                           recv_pos: jax.Array | None = None,
                           recv_valid: jax.Array | None = None,
                           senders_per_step: int = 1) -> jax.Array:
    """Compact-grid variant of :func:`geometric_spmm`: the sender x-block
    DMA happens only for active block pairs (plus the <= cap fill slots),
    cutting HBM traffic by the inactive fraction — the dense-grid kernel
    already runs at ~96%% of v5e bandwidth, so traffic is the lever.

    ``senders_per_step`` > 1 batches that many sender blocks into one grid
    step (separate DMAs, shared step overhead) — the one-sender grid is
    per-step-overhead-bound at swarm scale. ``x`` may be bfloat16 (halved
    feature traffic); accumulation stays float32 and the 0/1 weights are
    exactly representable, so bf16 only rounds the features themselves."""
    n, g = x.shape
    n_r = n if recv_pos is None else recv_pos.shape[0]
    nb_r = n_r // BLOCK
    r2 = (jnp.asarray(radius, jnp.float32) ** 2).reshape(1)
    s_step = max(1, int(senders_per_step))
    ps = _planes(pos, valid)
    pr = ps if recv_pos is None else _planes(recv_pos, recv_valid)
    if s_step == 1:
        cap = idx.shape[1]
        send, recv = _compact_plane_specs()
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nb_r, cap),
            in_specs=[send, recv,
                      pl.BlockSpec((BLOCK, g),
                                   lambda j, k, idx_ref, cnt, r2: (idx_ref[j, k], 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BLOCK, g), lambda j, k, *_: (j, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=_recv_scratch())
        out = pl.pallas_call(
            _spmm_kernel_compact,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_r, g), jnp.float32,
                                           vma=_join_vma(idx, ps, pr, x)),
            interpret=interpret,
        )(idx, count, r2, ps, pr, x)
        return out

    idx_m = _pad_idx_multi(idx, s_step)
    steps = idx_m.shape[1] // s_step

    def send_spec(s):
        return pl.BlockSpec(
            (3 * _SUB, BLOCK),
            lambda j, kk, idx_ref, cnt, r2, s=s: (
                idx_ref[j, kk * s_step + s], 0),
            memory_space=pltpu.VMEM)

    recv = pl.BlockSpec((3 * _SUB, BLOCK), lambda j, kk, *_: (j, 0),
                        memory_space=pltpu.VMEM)

    def x_spec(s):
        return pl.BlockSpec(
            (BLOCK, g),
            lambda j, kk, idx_ref, cnt, r2, s=s: (idx_ref[j, kk * s_step + s], 0),
            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb_r, steps),
        in_specs=[recv] + [send_spec(s) for s in range(s_step)]
                 + [x_spec(s) for s in range(s_step)],
        out_specs=pl.BlockSpec((BLOCK, g), lambda j, kk, *_: (j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=_recv_scratch())
    out = pl.pallas_call(
        _make_spmm_kernel_compact_multi(s_step),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_r, g), jnp.float32,
                                       vma=_join_vma(idx_m, ps, pr, x)),
        interpret=interpret,
    )(idx_m, count, r2, pr, *([ps] * s_step), *([x] * s_step))
    return out


def _pad_idx_multi(idx: jax.Array, s_step: int) -> jax.Array:
    """Pad the compact sender-index columns to a multiple of ``s_step``
    (repeating the last column — fill steps re-DMA the same block, which
    Pallas skips, and compute stays @pl.when-guarded)."""
    cap = idx.shape[1]
    cap_m = -(-cap // s_step) * s_step
    if cap_m == cap:
        return idx
    pad = jnp.broadcast_to(idx[:, -1:], (idx.shape[0], cap_m - cap))
    return jnp.concatenate([idx, pad], axis=1)


def make_geometric_ops(send_pos: jax.Array, send_valid: jax.Array, radius,
                       recv_pos: jax.Array | None = None,
                       recv_valid: jax.Array | None = None,
                       cap: int | None = None, interpret: bool = False,
                       senders_per_step: int = 1):
    """Build ``(degrees_fn, spmm_fn)`` over the radius graph between a
    padded sender set and an (optionally rectangular) padded receiver set.

    With ``cap`` the ops route through the compacted scalar-prefetch grid
    (sender blocks DMA'd only for active pairs); a ``lax.cond`` falls back
    to the exhaustive grid if any receiver block exceeds ``cap`` active
    senders, so results are exact either way. Shared by the single-chip
    filter and the sharded rollout/halo filter bodies.

    ``senders_per_step`` stays 1 by default: multi-sender batching paid
    only against the (since-reverted) pipelined s1 kernel; against the
    plain receiver-hoisted kernel the roofline sweep measures s2/s4 at
    0.91-1.01x of s1 (roofline_r4), so batching no longer carries its
    extra spec complexity at any measured N.
    """
    mask = block_pair_mask(send_pos, radius, send_valid,
                           recv_pos, recv_valid)
    if cap is None:
        def degrees_fn():
            return geometric_degrees(send_pos, radius, send_valid, mask,
                                     interpret, recv_pos, recv_valid)

        def spmm_fn(z):
            return geometric_spmm(send_pos, z, radius, send_valid, mask,
                                  interpret, recv_pos, recv_valid)

        return degrees_fn, spmm_fn

    idx, count, overflow = compact_sender_index(mask, cap)

    def degrees_fn():
        return jax.lax.cond(
            overflow,
            lambda a: geometric_degrees(a[0], radius, a[1], mask,
                                        interpret, recv_pos, recv_valid),
            lambda a: geometric_degrees_compact(a[0], radius, a[1], idx,
                                                count, interpret,
                                                recv_pos, recv_valid),
            (send_pos, send_valid))

    def spmm_fn(z):
        return jax.lax.cond(
            overflow,
            lambda a: geometric_spmm(a[0], a[1], radius, a[2], mask,
                                     interpret, recv_pos, recv_valid),
            lambda a: geometric_spmm_compact(
                a[0], a[1], radius, a[2], idx, count, interpret,
                recv_pos, recv_valid, senders_per_step=senders_per_step),
            (send_pos, z, send_valid))

    return degrees_fn, spmm_fn


def graph_filter_geometric(pos: jax.Array, x: jax.Array, radius,
                           weights: jax.Array, bias: jax.Array | None = None,
                           valid: jax.Array | None = None,
                           interpret: bool = False,
                           cap: int | None = None) -> jax.Array:
    """Full K-tap graph filter over the radius graph without materializing
    the GSO: matches ``ops.graph_filter(x, normalize(adjacency(pos, r)), w,
    b)`` on the valid lanes.

    Inputs must be BLOCK-padded (see ``pad_agents``); ``valid`` marks real
    agents. Positions must be pairwise distinct (the MAPF collision-free
    invariant): co-located agents are treated as self-edges and removed,
    where the dense oracle would keep a distance-0 edge.

    ``cap`` routes the hops through the compacted scalar-prefetch grid
    (sender x-blocks DMA'd only for active pairs). If any receiver block
    has more than ``cap`` active sender blocks, a ``lax.cond`` falls back
    to the exhaustive dense-grid kernels — results are exact either way.
    """
    n = pos.shape[0]
    assert n % BLOCK == 0, "pad inputs to a BLOCK multiple (pad_agents)"
    if valid is None:
        valid = jnp.ones((n,), jnp.float32)
    degrees_fn, spmm = make_geometric_ops(pos, valid, radius, cap=cap,
                                          interpret=interpret)
    deg = degrees_fn()
    inv_sqrt = jnp.where(deg > 1e-9, jax.lax.rsqrt(jnp.maximum(deg, 1e-9)),
                         0.0)

    k_taps = weights.shape[0]
    zs = [x]
    z = x
    for _ in range(1, k_taps):
        z = inv_sqrt[:, None] * spmm(inv_sqrt[:, None] * z)
        zs.append(z)
    stacked = jnp.concatenate(zs, axis=-1)
    w2 = weights.reshape(k_taps * weights.shape[1], weights.shape[2])
    # HIGHEST precision: the default TPU matmul truncates f32 -> bf16 inputs,
    # which showed ~1% output error vs the dense f32 oracle; the tap
    # contraction is cheap relative to the SpMM so full f32 costs nothing.
    y = jnp.dot(stacked, w2, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias
    return y * valid[:, None]

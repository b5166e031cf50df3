"""Packed-layout embedding tables + the Pallas scatter-free row-update kernel.

This is the TPU replacement for the reference's embedding backward scatter
(reference: src/ops/embedding.cu:192-217 — a CUDA atomicAdd per (row, dim)
element, fused with the optimizer step by the update task). XLA's TPU
scatter engine issues ~75 ns/update regardless of sorting/uniqueness flags
(PERF.md), which put the whole DLRM train step at a scatter-imposed ceiling.
This kernel replaces the scatter with dense MXU work:

  1. Tables are stored PACKED: [V, D] f32 -> [Pp, 128] with rpp = 128 // D
     rows per 128-lane pack. The narrow [V, D] layout lane-pads each row to
     128 on TPU (measured: reshape to packed costs a 0.7 ms relayout, and
     the packed gather is no slower), so packed is the canonical storage.
  2. Updates (row, delta) are keyed by row and sorted — ONE batched
     bitonic lax.sort over all tables of the same operand shape (measured
     2.3 ms for 10x65536 keys vs 2.9 ms for one table: batching wins;
     host routing can precompute the order off the critical path). The
     payload permutation composes with the bag broadcast (gather_payload
     reads src[order // h] — the [B*H, D] expansion is never built) and
     separate per-table gather ops overlap their latency (3.7 ms for
     10x65536 rows vs 14.8 ms for one batched gather).
  3. A grid over chunks of C consecutive packs walks the table once.
     Each cell streams its sorted update tiles from HBM (double-buffered
     DMA), builds the in-chunk one-hot on the VPU from an ENCODED stream
     ([K/128, 128] int32 carrying psmod*rpp + sub), and accumulates
     acc += onehot^T @ deltas on the MXU (bf16 -> f32). Duplicate rows
     are summed by the matmul — no dedup prep, no conflicts, fully
     deterministic (the round-1 pack-RMW kernel lost 3.7x to dedup prep).
     HBM traffic is one sequential read+write of the table plus one read
     of the update stream. Two stream formats (set_stream_mode, winner
     measured at calibration): "expanded" ships lane-expanded [K, 128]
     delta tiles built by XLA; "compact" ships dense-packed [K/rpp, 128]
     (rpp-fold less stream traffic) and the kernel expands lanes itself —
     a constant line-replication matmul, an identity-matmul transpose of
     the per-entry sub vector, and rpp static lane rolls selected by roll
     class (sub - pos) mod rpp with a target-lane-group mask.

Measured at kaggle dims (V=1M, D=16, K=65536, 10 tables): kernels 1.9 ms
total vs 53.8 ms for the XLA scatters.
"""
from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TILE = 1024          # update rows per in-kernel DMA tile (8 ps-pack rows)
_PS_ROWS = TILE // LANES


def rows_per_pack(d: int) -> int:
    assert LANES % d == 0, f"packed layout needs D | 128, got D={d}"
    return LANES // d


def packed_num_packs(v: int, d: int, chunk_packs: int) -> Tuple[int, int]:
    """(padded pack count, chunk count) for a [v, d] table."""
    rpp = rows_per_pack(d)
    p = -(-v // rpp)
    n_chunks = -(-p // chunk_packs)
    return n_chunks * chunk_packs, n_chunks


def pack_table(table: jax.Array, chunk_packs: int = 1024) -> jax.Array:
    """[V, D] -> [Pp, 128] (row r lives at pack r//rpp, lanes (r%rpp)*D..)."""
    v, d = table.shape
    rpp = rows_per_pack(d)
    pp, _ = packed_num_packs(v, d, chunk_packs)
    flat = jnp.pad(table.reshape(-1), (0, pp * LANES - v * d))
    return flat.reshape(pp, LANES)


def unpack_table(packed: jax.Array, v: int, d: int) -> jax.Array:
    """[Pp, 128] -> [V, D]."""
    return packed.reshape(-1)[: v * d].reshape(v, d)


def packed_gather(packed: jax.Array, rows: jax.Array, d: int) -> jax.Array:
    """rows [K] int32 (must be in-range) -> [K, D]. Fetches whole packs and
    selects the row's D-lane slice with a mask+sum (measured: beats both a
    take_along_axis select — that's a slow batch-dim gather — and the
    narrow [V, D] gather at large K; the pack IS the physical tile)."""
    rpp = rows_per_pack(d)
    if rpp == 1:
        return packed.at[rows].get(mode="promise_in_bounds")
    p = rows // rpp
    sub = rows % rpp
    g = packed.at[p].get(mode="promise_in_bounds")  # [K, 128]
    g3 = g.reshape(g.shape[0], rpp, d)
    oh = (
        sub[:, None]
        == jax.lax.broadcasted_iota(jnp.int32, (g.shape[0], rpp), 1)
    )
    return jnp.sum(g3 * oh[..., None].astype(g3.dtype), axis=1)


_GATHER_MODE = "pack"  # "pack" (whole-pack fetch + mask) | "subpack"
_GATHER_MODE_BY_DIM: dict = {}  # per-D measured winners override the default


def set_gather_mode(mode: str, d=None) -> None:
    """Select the packed-table row-gather implementation for every packed
    lookup site (forward, optimizer pools, routed owners). With d=None the
    DEFAULT is set and any per-dim overrides are cleared (a full reset —
    compile() re-applies the machine file's per-dim winners after);
    with d, only that row dim's winner is set. Chosen by
    FFConfig.packed_gather_mode or the gather calibration
    (autotune/machine.calibrate_packed_gather)."""
    global _GATHER_MODE
    assert mode in ("pack", "subpack"), mode
    if d is None:
        _GATHER_MODE = mode
        _GATHER_MODE_BY_DIM.clear()
    else:
        _GATHER_MODE_BY_DIM[int(d)] = mode


def get_gather_mode(d=None) -> str:
    if d is not None:
        return _GATHER_MODE_BY_DIM.get(int(d), _GATHER_MODE)
    return _GATHER_MODE


def gather_rows(packed: jax.Array, rows: jax.Array, d: int) -> jax.Array:
    """Mode-dispatched packed row gather (see set_gather_mode)."""
    if get_gather_mode(d) == "subpack":
        return packed_gather_subpack(packed, rows, d)
    return packed_gather(packed, rows, d)


def packed_gather_subpack(
    packed: jax.Array, rows: jax.Array, d: int
) -> jax.Array:
    """Sub-pack forward gather: one lax.gather with 2D start indices
    (pack, sub*D) and slice_sizes (1, D), so each lookup moves D*4 logical
    bytes instead of the full 512 B pack. The whole-pack path
    (packed_gather) is stream-bandwidth-bound at ~6 GB/s — 8x the logical
    bytes for D=16 — so slicing inside the lane dimension targets the
    narrow-gather rate (~10 ns/row; reference fused lookup:
    src/ops/embedding.cu:166-190 likewise fetches exactly D floats/row).
    Selected per-config by the gather calibration (machine.gather_mode)."""
    rpp = rows_per_pack(d)
    if rpp == 1:
        return packed.at[rows].get(mode="promise_in_bounds")
    k = rows.shape[0]
    p = (rows // rpp).astype(jnp.int32)
    lane0 = ((rows % rpp) * d).astype(jnp.int32)
    starts = jnp.stack([p, lane0], axis=1)  # [K, 2]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,),            # the D-lane slice stays in the output
        collapsed_slice_dims=(0,),   # the 1-pack dim collapses
        start_index_map=(0, 1),
    )
    return jax.lax.gather(
        packed, starts, dnums, slice_sizes=(1, d),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


_STREAM_MODE = "expanded"  # "expanded" ([K,128] lane-expanded) | "compact"
_STREAM_MODE_BY_DIM: dict = {}  # per-D measured winners override the default


def set_stream_mode(mode: str, d=None) -> None:
    """Select the update-stream format for the packed kernel. "compact"
    ships the sorted payload as [K/rpp, 128] (payload rows dense-packed,
    rpp entries per 128-lane line) and the KERNEL does the lane expansion
    (VERDICT r2 item 2): the XLA-side lane_expand_sorted materialization
    disappears and the stream's HBM traffic shrinks rpp-fold. d=None sets
    the default and clears per-dim overrides (compile() re-applies the
    machine file's per-dim winners after); with d, only that row dim's
    winner is set. Chosen by FFConfig.packed_stream_mode or the stream
    calibration (autotune/machine.calibrate_stream_mode)."""
    global _STREAM_MODE
    assert mode in ("expanded", "compact"), mode
    if d is None:
        _STREAM_MODE = mode
        _STREAM_MODE_BY_DIM.clear()
    else:
        _STREAM_MODE_BY_DIM[int(d)] = mode


def get_stream_mode(d=None) -> str:
    if d is not None:
        return _STREAM_MODE_BY_DIM.get(int(d), _STREAM_MODE)
    return _STREAM_MODE


_SELECTIVE = True  # touched-chunk-only dispatch (VERDICT r4 item 1)


def set_selective(on: bool) -> None:
    """Enable/disable touched-chunk selective dispatch: when on, the update
    grid's block index map routes every grid step through a compacted list
    of chunks that actually received entries, so the table read+write HBM
    traffic scales with TOUCHED chunks (∝ batch under Zipf indices) instead
    of total vocab. The reference's scatter backward touches only batch rows
    (src/ops/embedding.cu:192-217); this is the packed-layout equivalent.
    Off reproduces the round-4 full-pass behavior for A/B measurement."""
    global _SELECTIVE
    _SELECTIVE = bool(on)


def get_selective() -> bool:
    return _SELECTIVE


def snapshot_modes():
    """Capture the full gather/stream/selective mode state (modes are read
    at TRACE time, so a model compiled with one config must re-apply its own
    modes before its first step traces — another model's compile may have
    run in between)."""
    return (_GATHER_MODE, dict(_GATHER_MODE_BY_DIM),
            _STREAM_MODE, dict(_STREAM_MODE_BY_DIM), _SELECTIVE)


def restore_modes(snap) -> None:
    global _GATHER_MODE, _STREAM_MODE, _SELECTIVE
    if len(snap) == 5:
        _GATHER_MODE, gbd, _STREAM_MODE, sbd, _SELECTIVE = snap
    else:  # pre-round-5 snapshot tuples carry no selective flag
        _GATHER_MODE, gbd, _STREAM_MODE, sbd = snap
    _GATHER_MODE_BY_DIM.clear()
    _GATHER_MODE_BY_DIM.update(gbd)
    _STREAM_MODE_BY_DIM.clear()
    _STREAM_MODE_BY_DIM.update(sbd)


# --------------------------------------------------------------------------
# update-stream prep (XLA side)
# --------------------------------------------------------------------------

def prep_sorted_routes(
    rows_tk: jax.Array,          # [T, K] int32; <0 or >= v marks dropped
    vocab_sizes: Sequence[int],
    d: int,
    chunk_packs_t: Sequence[int],
    routes=None,
):
    """Batched ROW-sort prep (no payloads): ONE lax.sort over all T tables'
    row keys. Sorting by row (instead of pack id — rows are monotone in
    packs so the chunk grouping is identical) makes duplicate rows adjacent,
    which the lazy Adam/momentum paths need for first-occurrence flags.
    Returns per-table (starts [n_chunks+1], ps_pk [K_pad/128, 128],
    order [K], rows_sorted [K] with sentinel pp*rpp for dropped entries).
    `routes`: optional host-precomputed (order, enc, starts) per table
    (host_pack_routes / ffdata) — skips the on-device sort + counts pass."""
    t, k = rows_tk.shape
    rpp = rows_per_pack(d)
    n_chunks_t = [
        packed_num_packs(v, d, c)[1]
        for v, c in zip(vocab_sizes, chunk_packs_t)
    ]
    c_col = jnp.asarray(list(chunk_packs_t), jnp.int32)[:, None]
    sentinel = jnp.asarray(
        [n * c for n, c in zip(n_chunks_t, chunk_packs_t)], jnp.int32
    )[:, None]
    row_sent = sentinel * rpp
    rows_tk = rows_tk.astype(jnp.int32)
    # negatives drop too (matching host_pack_routes' documented contract):
    # a negative row would floor-divide to pack -1 and silently accumulate
    # into the wrong pack of chunk 0
    in_range = (rows_tk >= 0) & (
        rows_tk < jnp.asarray(list(vocab_sizes), jnp.int32)[:, None]
    )
    rk = jnp.where(in_range, rows_tk, row_sent)
    p = rk // rpp  # sentinel row -> sentinel pack exactly
    if routes is not None:
        # host-routed: the sort order, ENCODED stream (psmod*rpp + sub),
        # and chunk starts are index-derived, so the input pipeline
        # precomputed all three (host_pack_routes / ffdata) — the on-device
        # bitonic sort, counts pass, AND the sorted-rows take_along_axis
        # disappear from the step. (rows_s below is computed lazily: only
        # the lazy Adam/momentum paths consume it; the plain-update path
        # lets XLA DCE it — the [T, K] narrow int gather is NOT in XLA's
        # fast gather class and costs ~ms at bench scale.)
        order = jnp.stack([r[0] for r in routes]).astype(jnp.int32)
        enc = jnp.stack([r[1] for r in routes]).astype(jnp.int32)
        rows_s = jnp.take_along_axis(rk, order, axis=1)
    else:
        iota_k = jax.lax.broadcasted_iota(jnp.int32, (t, k), 1)
        rows_s, order = jax.lax.sort((rk, iota_k), dimension=1, num_keys=1)
        ps = rows_s // rpp
        # in-chunk pack position, sentinel = chunk_packs for dropped/padding,
        # packed 128 positions per row for the kernel's transposed one-hot
        psmod = jnp.where(ps < sentinel, ps % c_col, c_col)
        # ENCODED stream value: psmod * rpp + in-pack row position. The
        # kernel decodes psmod with one shift; the compact stream mode
        # needs sub for its in-kernel lane expansion. Sentinel rows encode
        # exactly chunk_packs * rpp (row_sent % rpp == 0).
        enc = psmod * rpp + jax.lax.rem(rows_s, rpp)
    k_pad = (-(-k // TILE) + 1) * TILE  # one spare tile for tail over-read
    pad = k_pad - k
    ps_pk = jnp.concatenate(
        [enc, jnp.broadcast_to(c_col * rpp, (t, pad))], axis=1
    )
    ps_pk = ps_pk.reshape(t, k_pad // LANES, LANES)
    out = []
    for i in range(t):
        # chunk starts in the sorted stream via per-chunk counts + cumsum
        # (a [K, n_chunks] compare-reduce; measured much faster than XLA's
        # searchsorted for the ~100-chunk regime). Counts are permutation
        # invariant so this reads the UNsorted pack ids. Falls back to
        # searchsorted when the chunk count would blow up the compare.
        nc = n_chunks_t[i]
        if routes is not None:
            starts = routes[i][2].astype(jnp.int32)
        elif nc <= 2048:
            cid = jnp.minimum(p[i] // chunk_packs_t[i], nc)
            counts = jnp.sum(
                (
                    cid[:, None]
                    == jax.lax.broadcasted_iota(jnp.int32, (k, nc), 1)
                ).astype(jnp.int32),
                axis=0,
            )
            starts = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)]
            ).astype(jnp.int32)
        else:  # pragma: no cover - only reached for >16M-row tables
            edges = jnp.arange(nc + 1, dtype=jnp.int32) * chunk_packs_t[i]
            starts = jnp.searchsorted(
                rows_s[i] // rpp, edges
            ).astype(jnp.int32)
        out.append((starts, ps_pk[i], order[i], rows_s[i]))
    return out


def gather_payload(delta, order):
    """Gather one table's update payload into sorted order WITHOUT
    materializing the [K, D] bag expansion (VERDICT r2 item 2 — the
    reference's one fused backward reads the pooled grad directly,
    src/ops/embedding.cu:192-217). `delta` is either
      - a [K, D] array (row k = delta[k]), or
      - (src [B, D], h): row k = src[k // h] — the pooled-output grad IS
        the payload for every bag member, so the reorder gather composes
        with the bag broadcast and reads the 1/h-size source, or
      - (src [B, D], h, scale [K, 1]): row k = src[k // h] * scale[k]
        (per-row factors, e.g. AdaGrad's rsqrt(accumulator)).
    """
    if isinstance(delta, tuple):
        src, hh = delta[0], int(delta[1])
        o = order if hh == 1 else order // hh
        g_s = src.at[o].get(mode="promise_in_bounds")
        if len(delta) > 2 and delta[2] is not None:
            g_s = g_s * delta[2].at[order].get(mode="promise_in_bounds")
        return g_s
    return delta.at[order].get(mode="promise_in_bounds")


def payload_rows_unsorted(delta, k: int):
    """Materialize one table's payload in UNSORTED (stream) order: the
    [K, D] view of the gather_payload tuple contract. Used by the expanded
    stream mode, whose lane expansion runs BEFORE the sort permutation so
    the permutation gather moves [K, 128] lines — XLA's wide-row gather
    class (~6 ns/row measured round 2) — instead of [K, D] narrow rows.
    Gathering D=16 narrow rows by `order` and expanding after (the round-3
    composed-payload ordering) measured +7 ms/step on the kaggle bench:
    narrow-row permutation gathers fall out of the fast class."""
    if not isinstance(delta, tuple):
        return delta
    src, hh = delta[0], int(delta[1])
    b, dd = src.shape
    g = src if hh == 1 else jnp.broadcast_to(
        src[:, None, :], (b, hh, dd)
    ).reshape(k, dd)
    if len(delta) > 2 and delta[2] is not None:
        g = g * delta[2]
    return g


def lane_expand_sorted(g_sorted, sub_sorted, k_pad: int, delta_dtype):
    """[K, D] sorted deltas + [K] in-pack row positions -> [K_pad, 128]
    lane-expanded kernel stream (pad rows zero)."""
    k, dd = g_sorted.shape
    rpp = LANES // dd
    gi = g_sorted.astype(delta_dtype)
    if rpp == 1:
        g_exp = gi
    else:
        oh_sub = (
            sub_sorted[:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (k, rpp), 1)
        ).astype(delta_dtype)
        g_exp = (oh_sub[..., None] * gi[:, None, :]).reshape(k, LANES)
    return jnp.pad(g_exp, ((0, k_pad - k), (0, 0)))


def compact_stream_sorted(g_sorted, k_pad: int, delta_dtype):
    """[K, D] sorted deltas -> [K_pad/rpp, 128] dense-packed kernel stream
    (rpp consecutive entries per 128-lane line; the row-major reshape is a
    free relayout). The kernel expands lanes itself (compact stream mode)."""
    k, dd = g_sorted.shape
    rpp = LANES // dd
    g = jnp.pad(g_sorted.astype(delta_dtype), ((0, k_pad - k), (0, 0)))
    return g.reshape(k_pad // rpp, LANES)


def _stream_for_kernel(g_sorted, sub_sorted, k_pad: int, delta_dtype):
    """(stream, compact_flag) per the (per-dim) stream mode."""
    dd = g_sorted.shape[1]
    rpp = LANES // dd
    if get_stream_mode(dd) == "compact" and rpp > 1:
        return compact_stream_sorted(g_sorted, k_pad, delta_dtype), True
    return lane_expand_sorted(g_sorted, sub_sorted, k_pad, delta_dtype), False


def _prep_streams(
    rows_tk: jax.Array,          # [T, K] int32; <0 or >= v marks dropped
    deltas_list: Sequence[jax.Array],  # T x [K, D] or (src, h[, scale])
    vocab_sizes: Sequence[int],
    d: int,
    chunk_packs_t: Sequence[int],
    delta_dtype=jnp.bfloat16,
    routes=None,
):
    """Sort + expand all T update streams (ONE batched key sort, per-table
    payload gathers). Returns per-table (starts, ps_pk, g_stream, compact)."""
    t, k = rows_tk.shape
    rpp = rows_per_pack(d)
    pre = prep_sorted_routes(rows_tk, vocab_sizes, d, chunk_packs_t, routes)
    k_pad = (-(-k // TILE) + 1) * TILE
    rows_i = rows_tk.astype(jnp.int32)
    in_range = (rows_i >= 0) & (
        rows_i < jnp.asarray(list(vocab_sizes), jnp.int32)[:, None]
    )
    sub_u = jnp.where(in_range, rows_i % rpp, 0)
    out = []
    for i in range(t):
        starts, ps_pk, order, rows_s = pre[i]
        if get_stream_mode(d) == "compact" and rpp > 1:
            # compact streams ship [K/rpp, 128]: the narrow payload gather
            # is the only option (the kernel expands lanes itself)
            g_s = gather_payload(deltas_list[i], order)
            g_stream = compact_stream_sorted(g_s, k_pad, delta_dtype)
            compact = True
        else:
            # expanded mode: lane-expand BEFORE the sort permutation so the
            # permutation gather moves [K, 128] lines (XLA's wide-row
            # gather class, ~6 ns/row measured). Gathering [K, D] narrow
            # rows first and expanding after cost +7 ms/step on the kaggle
            # bench (round-3 regression; see payload_rows_unsorted).
            gi = payload_rows_unsorted(deltas_list[i], k).astype(delta_dtype)
            if rpp == 1:
                g_exp = gi
            else:
                oh_sub = (
                    sub_u[i][:, None]
                    == jax.lax.broadcasted_iota(jnp.int32, (k, rpp), 1)
                ).astype(delta_dtype)
                g_exp = (oh_sub[..., None] * gi[:, None, :]).reshape(k, LANES)
            # fold the tail padding into the permutation gather (pad rows
            # read entry 0 — GARBAGE is fine there: their encoded ps is the
            # sentinel chunk_packs*rpp, which one-hots to an all-zero
            # column in the kernel) instead of a separate [K_pad, 128]
            # jnp.pad copy (~0.2 ms/step across the kaggle tables)
            order_pad = jnp.concatenate(
                [order, jnp.zeros((k_pad - k,), order.dtype)]
            )
            g_stream = g_exp.at[order_pad].get(mode="promise_in_bounds")
            compact = False
        out.append((starts, ps_pk, g_stream, compact))
    return out


def pick_chunk_packs(v: int, d: int, k: int) -> int:
    """Chunk size balancing grid-cell overhead (~1.5 us/cell, favors big
    chunks) against the one-hot matmul flops K*C*256 (favors small ones):
    C* = sqrt(P * cell_overhead * flop_rate / (K * 256))."""
    p = -(-v // rows_per_pack(d))
    c = int((p * 1.5e-6 * 2.0e14 / (max(k, 1) * 2 * LANES)) ** 0.5)
    # upper clamp: C=4096 keeps the block+acc VMEM budget inside Mosaic's
    # limit (C=5632 crashes the compiler); lower clamp bounds cell count
    c = max(512, min(4096, c))
    return -(-c // 256) * 256


# --------------------------------------------------------------------------
# the kernel
# --------------------------------------------------------------------------

def _update_kernel(
    cids_ref,    # SMEM [G] i32 chunk id per grid step (selective dispatch;
                 # consumed by the block index maps, unused in the body)
    lo_ref,      # SMEM [G] i32 entry-range start per grid step
    hi_ref,      # SMEM [G] i32 entry-range end (lo==hi for padding steps)
    tp_ref,      # VMEM [C, 128] table chunk (aliased to output)
    ps_hbm,      # HBM [K_pad/128, 128] i32 ENCODED psmod*rpp+sub
    g_hbm,       # HBM deltas: [K_pad, 128] lane-expanded (expanded mode)
                 #            or [K_pad/rpp, 128] dense-packed (compact)
    out_ref,     # VMEM [C, 128] updated chunk
    acc_ref,     # VMEM [C, 128] f32 scratch
    facc_ref,    # VMEM [C, 128] f32 first-flag mask (decay mode; dummy 8
                 # rows otherwise)
    ps_buf,      # VMEM [2, TILE//128, 128] i32
    g_buf,       # VMEM [2, TILE(/rpp), 128] delta_dtype
    ps_sem, g_sem,
    *,
    chunk_packs: int,
    rpp: int,
    d: int,
    compact: bool,
    decay: float = 0.0,
):
    c, u = chunk_packs, TILE
    k = pl.program_id(0)
    s0 = lo_ref[k]
    s1 = hi_ref[k]
    # DMA offsets must be provably tile-aligned; aligning the stream start
    # to TILE makes both the g rows (bf16: 16) and the packed-ps rows
    # (int32: 8, = TILE/128 per tile) aligned. Leading rows belong to the
    # previous chunk and are masked off.
    s0a = jax.lax.div(s0, u) * u
    # empty ranges (untouched chunk / padding step) must skip the stream
    # DMA entirely: s0 > s0a would otherwise still yield nt = 1
    nt = jnp.where(s1 > s0, jax.lax.div(s1 - s0a + u - 1, u), 0)

    # f32 tables accumulate DIRECTLY into the output block: the separate
    # acc zero + final (tp + acc) pass cost ~1.6 us of VPU time per cell
    # (~1.3 ms/step across the kaggle chunks) and f32 += is the same
    # rounding class as sum-then-add. Narrower table dtypes (bf16) keep
    # the f32 scratch so a chunk's delta still sums in f32 and rounds to
    # storage ONCE.
    # lazy-decay mode keeps the separate f32 accumulators (the epilogue
    # multiplies the ORIGINAL chunk, so direct in-place accumulation is
    # out); facc shares acc_ref's trailing half — see _packed_apply's
    # scratch shape (stacked [2C, 128] when decay > 0)
    direct = out_ref.dtype == jnp.float32 and decay == 0.0
    if direct:
        out_ref[:] = tp_ref[:]
        acc = out_ref
        facc = None
    else:
        acc_ref[:] = jnp.zeros_like(acc_ref)
        acc = acc_ref
        facc = None
        if decay > 0.0:
            facc_ref[:] = jnp.zeros_like(facc_ref)
            facc = facc_ref

    _stream_accumulate(
        acc, s0, s1, s0a, nt, ps_hbm, g_hbm, ps_buf, g_buf, ps_sem, g_sem,
        c=c, rpp=rpp, d=d, compact=compact, decay=decay, facc=facc,
    )

    if decay > 0.0:
        out_ref[:] = (
            tp_ref[:].astype(jnp.float32)
            * (1.0 - decay * facc_ref[:])
            + acc_ref[:]
        ).astype(out_ref.dtype)
    elif not direct:
        out_ref[:] = tp_ref[:] + acc_ref[:].astype(tp_ref.dtype)


def _stream_accumulate(
    acc, s0, s1, s0a, nt, ps_hbm, g_hbm, ps_buf, g_buf, ps_sem, g_sem,
    *, c: int, rpp: int, d: int, compact: bool, decay: float = 0.0,
    facc=None,
):
    """Shared tile loop of the update kernels: stream the sorted entry
    range [s0, s1) from HBM (double-buffered DMA) and accumulate the
    one-hot matmul into `acc` (a [C, 128] f32 ref). `nt` = 0 skips
    everything (untouched chunk).

    decay > 0 (the lazy-decay epilogue, round 5): the ps stream carries a
    FIRST-OCCURRENCE flag in bit 16 of each encoded entry; the loop also
    accumulates `facc` += onehot^T @ (first-flag lane indicator), which is
    EXACTLY 1 on every touched (row, lane) and 0 elsewhere (the flag rides
    only the first duplicate). The caller's epilogue
    out = chunk * (1 - decay * facc) + acc then yields
    b*old + (1-b)*G_r on touched rows and old elsewhere — the lazy
    Adam/momentum decay WITHOUT gathering the old rows
    (reference sparse-lazy convention: src/runtime/optimizer_kernel.cu)."""
    u = TILE
    g_rows_tile = u // rpp if compact else u

    def dmas(ti, slot):
        row0 = pl.multiple_of(
            jax.lax.div(s0a, rpp if compact else 1) + ti * g_rows_tile,
            g_rows_tile,
        )
        prow0 = pl.multiple_of(jax.lax.div(s0a, LANES) + ti * _PS_ROWS, _PS_ROWS)
        return (
            pltpu.make_async_copy(
                ps_hbm.at[pl.ds(prow0, _PS_ROWS), :],
                ps_buf.at[slot], ps_sem.at[slot],
            ),
            pltpu.make_async_copy(
                g_hbm.at[pl.ds(row0, g_rows_tile), :],
                g_buf.at[slot], g_sem.at[slot]
            ),
        )

    @pl.when(nt > 0)
    def _():
        for dma in dmas(0, 0):
            dma.start()

        iota_c = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        if decay > 0.0 or (compact and rpp > 1):
            eyed = (
                jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
            ).astype(jnp.float32)
        if compact and rpp > 1:
            # constants for the in-kernel lane expansion: line replication
            # one-hot [128, L] (entry e reads stream line e // rpp), the
            # 128x128 identity (transposes the per-entry sub vector from
            # lanes to sublanes via one MXU pass), and each sublane's
            # in-line position e % rpp.
            nl = LANES // rpp  # stream lines per 128-entry group
            # rep_oh rides the STREAM dtype so bf16 payloads feed the MXU
            # as bf16 x bf16 -> f32 (Mosaic only needs a 32-bit
            # accumulator, not 32-bit operands); casting gl up to f32
            # doubled the replication matmul's VMEM/VReg traffic.
            rep_oh = (
                jax.lax.broadcasted_iota(jnp.int32, (LANES, nl), 0) // rpp
                == jax.lax.broadcasted_iota(jnp.int32, (LANES, nl), 1)
            ).astype(g_hbm.dtype)
            eyef = eyed
            subl_mod = (
                jax.lax.broadcasted_iota(jnp.int32, (LANES, 1), 0) % rpp
            )

        def row_accum(ti, slot, j):
                base = s0a + ti * u
                cv_raw = ps_buf[slot][j : j + 1, :]          # [1, 128]
                if decay > 0.0:
                    # bit 16 carries the first-occurrence flag
                    fb = jax.lax.shift_right_logical(cv_raw, 16)
                    cv = jax.lax.bitwise_and(cv_raw, 0xFFFF)
                else:
                    cv = cv_raw
                ps_row = cv // rpp                           # in-chunk pack
                # keep only rows in [s0, s1): head/tail tiles over-read the
                # neighbor chunks' sorted rows. The range mask applies to
                # the [1, 128] ENTRY line (out-of-range entries snap to the
                # sentinel pack, which never matches the iota) — masking
                # the [C, 128] one-hot after the compare costs a full
                # extra VPU pass per row.
                row_g = base + j * LANES + lane
                valid = (row_g >= s0) & (row_g < s1)
                pr = jnp.where(valid, ps_row, c)             # [1, 128]
                oh_t = (pr == iota_c).astype(g_buf.dtype)    # [C, 128]
                if compact and rpp > 1:
                    # lane expansion IN-KERNEL from the dense-packed stream:
                    # entry e's payload sits at line e//rpp, lane group
                    # e%rpp; its target lane group is sub(e). The shift
                    # (sub - e%rpp) % rpp classes each entry into one of
                    # rpp STATIC lane rotations — rpp rolls + selects on
                    # the VPU replace the XLA-side [K,128] materialization.
                    sub_f = (cv - ps_row * rpp).astype(jnp.float32)
                    sub_col = jax.lax.dot_general(
                        eyef, sub_f, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(jnp.int32)                      # [128, 1]
                    rcls = jax.lax.rem(sub_col - subl_mod + rpp, rpp)
                    # each row keeps ONLY its target lane group: the rolled
                    # line still carries the other rpp-1 entries' payloads
                    keep = lane // d == sub_col              # [128, 128]
                    gl = g_buf[slot][j * nl : (j + 1) * nl, :]   # [L, 128]
                    # Mosaic requires a 32-bit matmul ACCUMULATOR (operands
                    # stay in the stream dtype); the replication product is
                    # exact (one-hot lhs), so the f32-acc + cast
                    # round-trips bf16 payloads bit-exactly.
                    g_line = jax.lax.dot_general(
                        rep_oh, gl,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(gl.dtype)                       # [128, 128]
                    g_tile = jnp.zeros((LANES, LANES), gl.dtype)
                    for r in range(rpp):
                        rolled = (
                            jnp.roll(g_line, r * d, axis=1) if r else g_line
                        )
                        g_tile = g_tile + jnp.where(
                            (rcls == r) & keep, rolled,
                            jnp.zeros((), gl.dtype),
                        )
                else:
                    g_tile = g_buf[slot][j * LANES : (j + 1) * LANES, :]
                acc[:] += jax.lax.dot_general(
                    oh_t,
                    g_tile,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if decay > 0.0:
                    # first-flag lane indicator: entry e contributes 1 to
                    # its row's D-lane group iff it is the run's first
                    # occurrence — facc lands exactly {0, 1} per (row,
                    # lane). Transposes ride the identity matmul (the
                    # compact path's sub_col trick).
                    fb_col = jax.lax.dot_general(
                        eyed, (fb * valid).astype(jnp.float32),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                                        # [128, 1]
                    sub_e = cv - ps_row * rpp                # [1, 128]
                    sub_ecol = jax.lax.dot_general(
                        eyed, sub_e.astype(jnp.float32),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(jnp.int32)                      # [128, 1]
                    keep_f = (lane // d == sub_ecol).astype(jnp.float32)
                    fm_tile = (fb_col * keep_f).astype(g_buf.dtype)
                    facc[:] += jax.lax.dot_general(
                        oh_t, fm_tile,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

        def body(ti, _):
            slot = jax.lax.rem(ti, 2)

            @pl.when(ti + 1 < nt)
            def _():
                for dma in dmas(ti + 1, 1 - slot):
                    dma.start()

            for dma in dmas(ti, slot):
                dma.wait()
            base = s0a + ti * u
            for j in range(_PS_ROWS):
                # tile-alignment waste guard: a chunk's entry range
                # [s0, s1) usually covers only a few of the tile's
                # _PS_ROWS 128-entry rows (big tables average ~2 live
                # rows of 8 at kaggle scale), and each dead row still
                # costs a [C, 128] one-hot build + MXU pass — measured
                # 2.36 ms vs the 1.59 ms r+w bandwidth floor on the
                # 648 MB kaggle table. Skip rows fully outside the range
                # so kernel compute scales with ACTUAL entries.
                @pl.when(
                    (base + j * LANES < s1) & (base + (j + 1) * LANES > s0)
                )
                def _(j=j):
                    row_accum(ti, slot, j)
            return 0

        jax.lax.fori_loop(0, nt, body, 0)


def _update_kernel_manual(
    lo_ref,      # SMEM [n_chunks] i32 entry-range starts (scalar prefetch)
    hi_ref,      # SMEM [n_chunks] i32 entry-range ends
    tp_hbm,      # ANY [Pp, 128] table (aliased to out_hbm)
    ps_hbm,      # ANY encoded entry stream
    g_hbm,       # ANY delta stream
    out_hbm,     # ANY [Pp, 128] updated table (the same HBM buffer)
    buf,         # VMEM [C, 128] chunk staging
    acc_ref,     # VMEM f32 scratch (dummy 8 rows when table is f32)
    ps_buf, g_buf,
    chunk_sem, ps_sem, g_sem,
    *,
    chunk_packs: int,
    rpp: int,
    d: int,
    compact: bool,
):
    """SPARSE-regime variant: the table stays in HBM and each grid step
    DMAs its chunk in/out ONLY when the chunk received entries — untouched
    chunks cost one grid tick, nothing else, so table HBM traffic is
    ∝ touched chunks exactly (the reference backward's ∝-batch cost,
    src/ops/embedding.cu:192-217). Measured round 5: the BlockSpec
    pipeline re-copies blocks even for repeated indices (no revisiting
    elision on this toolchain), so grid-schedule parking alone cannot
    skip HBM traffic — manual DMA can. Serial in→compute→out per touched
    chunk (no cross-chunk overlap), which loses ~1.5x to the pipelined
    kernel when most chunks are touched — _packed_apply gates on the
    expected touched fraction."""
    c, u = chunk_packs, TILE
    k = pl.program_id(0)
    s0 = lo_ref[k]
    s1 = hi_ref[k]

    @pl.when(s1 > s0)
    def _():
        row0 = pl.multiple_of(k * c, c)
        inc = pltpu.make_async_copy(
            tp_hbm.at[pl.ds(row0, c), :], buf, chunk_sem
        )
        inc.start()
        inc.wait()
        direct = buf.dtype == jnp.float32
        if direct:
            acc = buf
        else:
            acc_ref[:] = jnp.zeros_like(acc_ref)
            acc = acc_ref
        s0a = jax.lax.div(s0, u) * u
        nt = jax.lax.div(s1 - s0a + u - 1, u)
        _stream_accumulate(
            acc, s0, s1, s0a, nt, ps_hbm, g_hbm, ps_buf, g_buf,
            ps_sem, g_sem, c=c, rpp=rpp, d=d, compact=compact,
        )
        if not direct:
            buf[:] = buf[:] + acc_ref[:].astype(buf.dtype)
        outc = pltpu.make_async_copy(
            buf, out_hbm.at[pl.ds(row0, c), :], chunk_sem
        )
        outc.start()
        outc.wait()


def _selective_schedule(starts: jax.Array, n_chunks: int):
    """starts [n_chunks+1] -> (cids, lo, hi), each [n_chunks] i32: a grid
    schedule that visits every TOUCHED chunk once (ascending) and parks the
    remaining grid steps on ONE untouched chunk with an empty entry range.
    MEASURED round 5: this toolchain's BlockSpec pipeline does NOT elide
    copies for repeated block indices (parked steps still cost a chunk
    read+write each, ~6 us at C=4096), so parking alone cannot shrink
    table HBM traffic — it only buys HBM-page locality (+24% at tiny K,
    parity at bench batches). The real ∝-touched-chunks path is the
    manual-DMA kernel (_update_kernel_manual), which _packed_apply gates
    in for the sparse regime; this schedule remains the grid layout for
    the pipelined kernel."""
    tch = starts[1:] > starts[:-1]                       # [n_chunks]
    n_t = jnp.sum(tch.astype(jnp.int32))
    iota = jnp.arange(n_chunks, dtype=jnp.int32)
    key = jnp.where(tch, iota, iota + n_chunks)
    skey = jax.lax.sort(key)                             # touched first
    park = jnp.argmin(tch).astype(jnp.int32)             # first untouched
    live = iota < n_t
    cids = jnp.where(live, skey, park)
    lo = starts.at[cids].get(mode="promise_in_bounds")
    hi = jnp.where(
        live, starts.at[cids + 1].get(mode="promise_in_bounds"), lo
    )
    return cids, lo, hi


def _packed_apply(
    packed: jax.Array,
    starts: jax.Array,
    ps_pk: jax.Array,
    g_exp: jax.Array,
    *,
    chunk_packs: int,
    d: int,
    compact: bool = False,
    interpret: bool = False,
    k_entries=None,
    decay: float = 0.0,
) -> jax.Array:
    pp = packed.shape[0]
    rpp = rows_per_pack(d)
    compact = bool(compact and rpp > 1)
    n_chunks = pp // chunk_packs
    assert n_chunks * chunk_packs == pp and starts.shape[0] == n_chunks + 1
    # SPARSE regime: when the stream cannot touch even ~40% of the chunks
    # (uniform-draw upper bound; skew touches fewer), dispatch the
    # manual-DMA kernel — untouched chunks are skipped entirely, so the
    # table pass costs ∝ touched chunks (the reference backward's ∝-batch
    # cost, src/ops/embedding.cu:192-217). Dense batches keep the
    # pipelined BlockSpec kernel (its chunk copies overlap compute; the
    # serial manual DMA would lose ~1.5x there).
    k_e = int(k_entries) if k_entries else int(ps_pk.size)
    exp_touched = n_chunks * (
        1.0 - (1.0 - 1.0 / n_chunks) ** k_e
    ) if n_chunks > 1 else 1.0
    if get_selective() and decay == 0.0 and exp_touched < 0.4 * n_chunks:
        return _packed_apply_manual(
            packed, starts, ps_pk, g_exp, chunk_packs=chunk_packs, d=d,
            compact=compact, interpret=interpret,
        )
    if get_selective():
        cids, lo, hi = _selective_schedule(starts, n_chunks)
    else:
        cids = jnp.arange(n_chunks, dtype=jnp.int32)
        lo, hi = starts[:-1], starts[1:]
    kernel = functools.partial(
        _update_kernel, chunk_packs=chunk_packs, rpp=rpp, d=d,
        compact=compact, decay=decay,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(
                (chunk_packs, LANES), lambda k, cids, lo, hi: (cids[k], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (chunk_packs, LANES), lambda k, cids, lo, hi: (cids[k], 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            # f32 tables accumulate into the output block (direct mode in
            # _update_kernel); the f32 scratch shrinks to a dummy tile.
            # decay mode always uses the full accumulators (+ facc).
            pltpu.VMEM(
                (
                    8
                    if packed.dtype == jnp.float32 and decay == 0.0
                    else chunk_packs,
                    LANES,
                ),
                jnp.float32,
            ),
            pltpu.VMEM(
                (chunk_packs if decay > 0.0 else 8, LANES), jnp.float32
            ),
            pltpu.VMEM((2, _PS_ROWS, LANES), jnp.int32),
            pltpu.VMEM(
                (2, TILE // rpp if compact else TILE, LANES), g_exp.dtype
            ),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(packed.shape, packed.dtype),
        input_output_aliases={3: 0},  # table chunk updated in place
        cost_estimate=pl.CostEstimate(
            # the one-hot accumulation processes every ENTRY (ps_pk.size =
            # K_pad) in both stream modes; compact's g rows are K_pad/rpp
            # and would understate MXU work rpp-fold
            flops=int(2 * ps_pk.size * chunk_packs * LANES),
            bytes_accessed=int(
                packed.size * packed.dtype.itemsize * 2
                + ps_pk.size * 4
                + g_exp.size * g_exp.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(cids, lo, hi, packed, ps_pk, g_exp)


def _packed_apply_manual(
    packed: jax.Array,
    starts: jax.Array,
    ps_pk: jax.Array,
    g_exp: jax.Array,
    *,
    chunk_packs: int,
    d: int,
    compact: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Sparse-regime dispatch: table stays in HBM (ANY), touched chunks
    DMA in/out inside the kernel, untouched chunks cost one grid tick."""
    pp = packed.shape[0]
    rpp = rows_per_pack(d)
    compact = bool(compact and rpp > 1)
    n_chunks = pp // chunk_packs
    kernel = functools.partial(
        _update_kernel_manual, chunk_packs=chunk_packs, rpp=rpp, d=d,
        compact=compact,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # table (aliased)
            pl.BlockSpec(memory_space=pl.ANY),  # ps stream
            pl.BlockSpec(memory_space=pl.ANY),  # g stream
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((chunk_packs, LANES), packed.dtype),  # chunk staging
            pltpu.VMEM(
                (8 if packed.dtype == jnp.float32 else chunk_packs, LANES),
                jnp.float32,
            ),
            pltpu.VMEM((2, _PS_ROWS, LANES), jnp.int32),
            pltpu.VMEM(
                (2, TILE // rpp if compact else TILE, LANES), g_exp.dtype
            ),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(packed.shape, packed.dtype),
        input_output_aliases={2: 0},  # table updated in place in HBM
        cost_estimate=pl.CostEstimate(
            flops=int(2 * ps_pk.size * chunk_packs * LANES),
            bytes_accessed=int(
                # ∝ touched chunks; upper-bound with the entry count
                min(pp, ps_pk.size * chunk_packs // max(1, TILE))
                * LANES * packed.dtype.itemsize * 2
                + ps_pk.size * 4
                + g_exp.size * g_exp.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(starts[:-1], starts[1:], packed, ps_pk, g_exp)


# --------------------------------------------------------------------------
# public entry points
# --------------------------------------------------------------------------

def packed_row_update_batched(
    packed_tables: List[jax.Array],
    rows_list: Sequence[jax.Array],     # each [K] int32 (>= v drops)
    deltas_list: Sequence[jax.Array],   # each [K, D], already scaled
    vocab_sizes: Sequence[int],
    d: int,
    *,
    chunk_packs=1024,
    delta_dtype=jnp.bfloat16,
    interpret: bool = False,
    routes=None,
) -> List[jax.Array]:
    """table[rows[i]] += deltas[i] for every table, duplicates summed,
    out-of-range rows dropped. All tables must share K and D so the key
    sort batches into one lax.sort call. chunk_packs: int or per-table
    list (each table's packed array must be padded to its chunk size).
    routes: optional host-precomputed (order, enc, starts) per table."""
    if isinstance(chunk_packs, int):
        chunk_packs = [chunk_packs] * len(packed_tables)
    rows_tk = jnp.stack(rows_list)
    streams = _prep_streams(
        rows_tk, deltas_list, vocab_sizes, d, chunk_packs, delta_dtype,
        routes=routes,
    )
    out = []
    for packed, c, (starts, ps_pk, g_stream, compact) in zip(
        packed_tables, chunk_packs, streams
    ):
        out.append(
            _packed_apply(
                packed, starts, ps_pk, g_stream,
                chunk_packs=c, d=d, compact=compact, interpret=interpret,
                k_entries=rows_tk.shape[1],
            )
        )
    return out


def packed_row_update(
    packed: jax.Array,
    rows: jax.Array,
    deltas: jax.Array,
    v: int,
    d: int,
    **kw,
) -> jax.Array:
    return packed_row_update_batched(
        [packed], [rows], [deltas], [v], d, **kw
    )[0]


def _first_flags(rows_s, row_sent):
    """[K] sorted rows -> f32 {0,1}: 1 at the first occurrence of each
    distinct valid row (duplicates are adjacent after the row sort)."""
    prev = jnp.concatenate([jnp.full((1,), -1, rows_s.dtype), rows_s[:-1]])
    return ((rows_s != prev) & (rows_s < row_sent)).astype(jnp.float32)


def packed_lazy_adam_batched(
    tables: List[jax.Array],       # packed [Pp, 128] f32 each
    m_pools: List[jax.Array],      # packed f32
    v_pools: List[jax.Array],      # packed f32
    rows_list: Sequence[jax.Array],
    grads_list: Sequence[jax.Array],   # T x [K, D] raw gradients
    vocab_sizes: Sequence[int],
    d: int,
    *,
    alpha_t,
    beta1: float,
    beta2: float,
    epsilon: float,
    weight_decay: float = 0.0,
    chunk_packs=1024,
    interpret: bool = False,
    routes=None,
):
    """Scatter-free LAZY Adam on packed pools (VERDICT r2 item 3; reference
    dense-Adam kernels: src/runtime/optimizer_kernel.cu:295-350 — lazy/
    touched-rows-only is the sparse-embedding convention). Per touched row:
      m <- b1*m + (1-b1)*G_r          (G_r = summed duplicate grads)
      v <- b2*v + (1-b2)*sum(g_i^2)   (summed squares per occurrence)
      w <- w - alpha_t * m / (sqrt(v) + eps)
    Streams are row-sorted so duplicates are adjacent. Round 5: the m/v
    decay rides the KERNEL's lazy-decay epilogue (first-occurrence flags
    in bit 16 of the encoded stream; out = chunk*(1 - (1-b)*fmask) + acc)
    — no m_old/v_old gathers, and the m/v passes consume the same raw
    gradient payload scaled by (1-b), halving the gather count of the
    round-4 formulation (measured: 4 of the step's 6 pool gathers gone).
    Returns (new_tables, new_m, new_v)."""
    t = len(tables)
    if isinstance(chunk_packs, int):
        chunk_packs = [chunk_packs] * t
    rows_tk = jnp.stack([r.astype(jnp.int32) for r in rows_list])
    k = rows_tk.shape[1]
    k_pad = (-(-k // TILE) + 1) * TILE
    rpp = rows_per_pack(d)
    pre = prep_sorted_routes(rows_tk, vocab_sizes, d, chunk_packs, routes)
    new_t, new_m, new_v = [], [], []
    for i in range(t):
        starts, ps_pk, order, rows_s = pre[i]
        pp, nc = packed_num_packs(vocab_sizes[i], d, chunk_packs[i])
        row_sent = pp * rpp
        safe = jnp.minimum(rows_s, row_sent - 1)
        sub_s = rows_s % rpp
        first = _first_flags(rows_s, row_sent)[:, None]
        ps_adam = _first_bit_stream(ps_pk, first[:, 0], k_pad)
        g_s = gather_payload(grads_list[i], order).astype(jnp.float32)
        if weight_decay != 0.0:
            g_s = g_s + weight_decay * gather_rows(tables[i], safe, d)
        # streams ride bf16 (like the SGD path): the one-hot MXU matmuls
        # run ~8x faster than with f32 operands (measured round 5: f32
        # streams put the Adam step at 84 ms), and the m/v increments are
        # EMA terms of grads that were computed in bf16 anyway — the f32
        # POOLS and the kernel's f32 accumulate are what carry precision
        sm, sc = _stream_for_kernel(
            (1.0 - beta1) * g_s, sub_s, k_pad, jnp.bfloat16)
        m2 = _packed_apply(
            m_pools[i], starts, ps_adam, sm,
            chunk_packs=chunk_packs[i], d=d, compact=sc, interpret=interpret,
            k_entries=k, decay=(1.0 - beta1),
        )
        sv, sc = _stream_for_kernel(
            (1.0 - beta2) * jnp.square(g_s), sub_s, k_pad, jnp.bfloat16)
        v2 = _packed_apply(
            v_pools[i], starts, ps_adam, sv,
            chunk_packs=chunk_packs[i], d=d, compact=sc, interpret=interpret,
            k_entries=k, decay=(1.0 - beta2),
        )
        m_new = gather_rows(m2, safe, d)
        v_new = gather_rows(v2, safe, d)
        dw = first * (-alpha_t) * m_new / (jnp.sqrt(v_new) + epsilon)
        sw, sc = _stream_for_kernel(dw, sub_s, k_pad, jnp.bfloat16)
        w2 = _packed_apply(
            tables[i], starts, ps_pk, sw,
            chunk_packs=chunk_packs[i], d=d, compact=sc, interpret=interpret,
            k_entries=k,
        )
        new_t.append(w2)
        new_m.append(m2)
        new_v.append(v2)
    return new_t, new_m, new_v


def _first_bit_stream(ps_pk, first, k_pad: int):
    """Encode first-occurrence flags into bit 16 of the packed entry
    stream (padding/sentinel entries keep flag 0)."""
    k = first.shape[0]
    fpad = jnp.pad(first.astype(jnp.int32), (0, k_pad - k))
    return ps_pk + (fpad.reshape(k_pad // LANES, LANES) << 16)


def packed_lazy_momentum_batched(
    tables: List[jax.Array],
    vel_pools: List[jax.Array],
    rows_list: Sequence[jax.Array],
    grads_list: Sequence[jax.Array],
    vocab_sizes: Sequence[int],
    d: int,
    *,
    lr,
    momentum: float,
    nesterov: bool = False,
    weight_decay: float = 0.0,
    chunk_packs=1024,
    interpret: bool = False,
    routes=None,
):
    """Scatter-free lazy momentum SGD on packed pools. Per touched row:
    v <- mu*v + G_r; w <- w - lr*(v) (nesterov: w -= lr*(G_r + mu*v)).
    Returns (new_tables, new_velocities)."""
    t = len(tables)
    if isinstance(chunk_packs, int):
        chunk_packs = [chunk_packs] * t
    rows_tk = jnp.stack([r.astype(jnp.int32) for r in rows_list])
    k = rows_tk.shape[1]
    k_pad = (-(-k // TILE) + 1) * TILE
    rpp = rows_per_pack(d)
    pre = prep_sorted_routes(rows_tk, vocab_sizes, d, chunk_packs, routes)
    new_t, new_v = [], []
    for i in range(t):
        starts, ps_pk, order, rows_s = pre[i]
        pp, nc = packed_num_packs(vocab_sizes[i], d, chunk_packs[i])
        row_sent = pp * rpp
        safe = jnp.minimum(rows_s, row_sent - 1)
        sub_s = rows_s % rpp
        first = _first_flags(rows_s, row_sent)[:, None]
        g_s = gather_payload(grads_list[i], order).astype(jnp.float32)
        if weight_decay != 0.0:
            g_s = g_s + weight_decay * gather_rows(tables[i], safe, d)
        # velocity decay rides the kernel's lazy-decay epilogue (no v_old
        # gather); nesterov still needs v_old for its look-ahead term
        ps_mom = _first_bit_stream(ps_pk, first[:, 0], k_pad)
        v_old = (
            gather_rows(vel_pools[i], safe, d) if nesterov else None
        )
        sv, sc = _stream_for_kernel(g_s, sub_s, k_pad, jnp.bfloat16)
        v2 = _packed_apply(
            vel_pools[i], starts, ps_mom, sv,
            chunk_packs=chunk_packs[i], d=d, compact=sc, interpret=interpret,
            k_entries=k, decay=(1.0 - momentum),
        )
        v_new = gather_rows(v2, safe, d)
        if nesterov:
            # G_r at the first entry = v_new - mu*v_old
            step = (v_new - momentum * v_old) + momentum * v_new
        else:
            step = v_new
        dw = first * (-lr) * step
        sw, sc = _stream_for_kernel(dw, sub_s, k_pad, jnp.bfloat16)
        w2 = _packed_apply(
            tables[i], starts, ps_pk, sw,
            chunk_packs=chunk_packs[i], d=d, compact=sc, interpret=interpret,
            k_entries=k,
        )
        new_t.append(w2)
        new_v.append(v2)
    return new_t, new_v


def packed_row_update_reference(
    packed: jax.Array, rows: jax.Array, deltas: jax.Array, v: int, d: int
) -> jax.Array:
    """Pure-XLA semantics oracle for parity tests."""
    table = unpack_table(packed, v, d)
    table = table.at[rows].add(deltas.astype(table.dtype), mode="drop")
    pp = packed.shape[0]
    flat = jnp.pad(table.reshape(-1), (0, pp * LANES - v * d))
    return flat.reshape(pp, LANES)


def host_pack_routes(rows, v: int, d: int, chunk_packs: int):
    """HOST-side route computation for one table's update stream (numpy):
    the sort order, in-chunk pack positions, and chunk starts are pure
    functions of the indices, so the input pipeline computes them off the
    critical path (ffdata provides a threaded sort) and the device step
    skips its bitonic sort. Sorts by ROW (monotone in packs, so the chunk
    grouping is unchanged; duplicate rows become adjacent for the lazy
    Adam/momentum first-occurrence flags). rows: [K], <0 or >=v drops."""
    import numpy as _np

    rows = _np.asarray(rows).reshape(-1).astype(_np.int64)
    rpp = rows_per_pack(d)
    pp, n_chunks = packed_num_packs(v, d, chunk_packs)
    sent = n_chunks * chunk_packs
    rk = _np.where((rows >= 0) & (rows < v), rows, sent * rpp)
    from ...data import native_batcher as _nb

    order = _nb.argsort_i64(rk)
    rs = rk[order]
    ps = rs // rpp
    psmod = _np.where(ps < sent, ps % chunk_packs, chunk_packs)
    # ship the ENCODED stream (psmod*rpp + in-pack position) so the device
    # never touches the sorted row values (sentinel rows encode exactly
    # chunk_packs*rpp: rs % rpp == 0 there)
    enc = (psmod * rpp + rs % rpp).astype(_np.int32)
    starts = _np.searchsorted(
        ps, _np.arange(n_chunks + 1, dtype=_np.int64) * chunk_packs
    ).astype(_np.int32)
    return order.astype(_np.int32), enc, starts

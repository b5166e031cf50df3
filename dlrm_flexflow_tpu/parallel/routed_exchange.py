"""Routed (capacity-bucketed) pooled-embedding exchange.

The dense slot exchange (embedding_collection.py) ships every slot's dense
[global_batch, D] partial and makes each owner process the FULL global
batch per slot (invalid rows ride the wire and the update): per-chip cost
grows with the chip count, and row-splitting a table multiplies the wire
volume by its split degree. This module replaces it with source-side
routing — the TPU-native answer to the reference's exact Legion region
intersections (the runtime there ships only the rows a consumer actually
needs, src/runtime/simulator.cc:357-388 models those copies):

  1. Each chip classifies its LOCAL lookups by destination sub-table
     (static row-range arithmetic), sorts them per table (one batched
     bitonic over [T, B_loc*H]), and packs them into per-slot capacity
     buckets — contiguous dynamic slices of the sorted stream, NO scatter.
  2. ONE index all-to-all ships the compact buckets to the owners
     ([N, C] int32, C ~ cap * B_loc * T * H / N).
  3. Owners gather rows for exactly the received entries and reply with a
     second all-to-all ([N, C, D]); sources reassemble via an inverse-
     permutation gather. Backward mirrors with gradient payloads and a
     compact row update at the owner.

Per-chip compute and wire stay O(B_loc * T * H) under weak scaling —
independent of BOTH the chip count and the split degree. Capacities are
exact for unsplit tables (c = B_loc*H can't overflow); split sub-tables
get cap_factor * B_loc*H/s slots — overflow drops the lookup in fwd AND
bwd consistently (as if it were padding). Hash-permuted row layouts make
overflow Binomial-rare on skewed data (PERF.md round-1 analysis);
cap_factor=0 means exact (c = B_loc*H everywhere, fat wire — test mode).

SUM pooling only (like row-splits: partials must sum exactly).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ffconst import AggrMode


def _round8(x: int) -> int:
    return max(8, (int(x) + 7) // 8 * 8)


class RoutedPlan:
    """Static routing tables derived from (layout, B_loc, H, cap_factor)."""

    def __init__(self, layout, b_loc: int, h: int, cap_factor: float):
        n = layout.num_shards
        subs = layout.subs
        s_count = len(subs)
        split = layout.split or [1] * layout.num_tables
        # per-table: first sub index + rows per sub (chunk)
        self.table_base = np.zeros(layout.num_tables, np.int32)
        self.table_chunk = np.zeros(layout.num_tables, np.int32)
        seen = {}
        for i, (t, start, length) in enumerate(subs):
            if t not in seen:
                seen[t] = i
                self.table_base[t] = i
            # chunk = ceil(vocab / split); reconstruct from the first sub
            self.table_chunk[t] = -(-layout.vocab_sizes[t] // max(1, split[t]))
        # per-slot (== per-sub) static data
        self.slot_dest = np.asarray(
            [layout.owner[i] for i in range(s_count)], np.int32
        )
        self.slot_lbase = np.asarray(
            [int(layout.row_offset[i]) for i in range(s_count)], np.int32
        )
        self.slot_rstart = np.asarray(
            [subs[i][1] for i in range(s_count)], np.int32
        )
        me = b_loc * h
        caps = []
        for i, (t, start, length) in enumerate(subs):
            s = max(1, split[t])
            if cap_factor <= 0 or s == 1:
                caps.append(me)  # exact: a sub can't receive more
            else:
                caps.append(min(me, _round8(int(cap_factor * me / s))))
        self.slot_cap = np.asarray(caps, np.int32)
        # bucket packing: dest block d holds its slots' sub-buckets
        # back to back; blocks pad to the max so the all-to-all tiles
        self.slot_bucket_off = np.zeros(s_count, np.int64)
        per_dest = np.zeros(n, np.int64)
        for i in range(s_count):
            d = self.slot_dest[i]
            self.slot_bucket_off[i] = per_dest[d]
            per_dest[d] += self.slot_cap[i]
        self.c_max = int(_round8(int(per_dest.max()) if s_count else 8))
        self.n = n
        self.h = h
        self.b_loc = b_loc
        self.s_count = s_count


def _classify(plan: RoutedPlan, layout, idx_local):
    """idx_local [B_loc, T, H] -> (slot [B_loc*T*H] with sentinel S for
    padding, lrow dest-local row)."""
    b, t, h = idx_local.shape
    r = idx_local.astype(jnp.int32)
    chunk = jnp.asarray(plan.table_chunk)[None, :, None]
    base = jnp.asarray(plan.table_base)[None, :, None]
    nsub = jnp.asarray(
        [max(1, (layout.split or [1] * layout.num_tables)[tt])
         for tt in range(layout.num_tables)], jnp.int32
    )[None, :, None]
    vocab = jnp.asarray(layout.vocab_sizes, jnp.int32)[None, :, None]
    valid = (r >= 0) & (r < vocab)  # out-of-vocab drops, matching dense mode
    k = jnp.clip(r // jnp.maximum(chunk, 1), 0, nsub - 1)
    slot = jnp.where(valid, base + k, plan.s_count)
    lbase = jnp.asarray(np.append(plan.slot_lbase, 0))
    rstart = jnp.asarray(np.append(plan.slot_rstart, 0))
    lrow = jnp.take(lbase, slot) + r - jnp.take(rstart, slot)
    lrow = jnp.where(valid, lrow, layout.r_pad)  # sentinel row: dropped
    return slot.reshape(b, t * h), lrow.reshape(b, t * h)


def _tmajor(plan: RoutedPlan, x_bth):
    """[B, T*H(, D)] -> [T, B*H(, D)]."""
    b = x_bth.shape[0]
    t = x_bth.shape[1] // plan.h
    trail = x_bth.shape[2:]
    x = x_bth.reshape((b, t, plan.h) + trail)
    x = jnp.moveaxis(x, 1, 0)
    return x.reshape((t, b * plan.h) + trail)


def _route_sorted(plan: RoutedPlan, slot_bth):
    """Sort entries by destination slot per table (ONE batched bitonic over
    [T, B_loc*H]). Returns (slot_start [S], slot_end [S], keys_sorted
    [T, B*H], order [T, B*H]) — each slot's entries are CONTIGUOUS in the
    t-major sorted stream."""
    keys = _tmajor(plan, slot_bth)
    t, m_t = keys.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (t, m_t), 1)
    keys_s, order = jax.lax.sort((keys, iota), dimension=1, num_keys=1)
    starts, ends = [], []
    for tt in range(t):
        lo = int(plan.table_base[tt])
        n_sub = (
            (int(plan.table_base[tt + 1]) if tt + 1 < len(plan.table_base)
             else plan.s_count) - lo
        )
        edges = jnp.arange(lo, lo + n_sub, dtype=jnp.int32)
        starts.append(
            jnp.searchsorted(keys_s[tt], edges).astype(jnp.int32) + tt * m_t
        )
        ends.append(
            jnp.searchsorted(keys_s[tt], edges, side="right").astype(jnp.int32)
            + tt * m_t
        )
    return (
        jnp.concatenate(starts), jnp.concatenate(ends), keys_s, order
    )


def _fill_buckets(plan: RoutedPlan, flat_sorted, slot_start, slot_end,
                  sentinel):
    """Place each slot's contiguous sorted run into its capacity bucket via
    dynamic slices (no scatter anywhere). flat_sorted: [M_total(, D)]
    (t-major flattened). Returns [N, C_max(, D)]."""
    trail = flat_sorted.shape[1:]
    # pad so a slice starting at the stream tail never clamps (dynamic_slice
    # silently shifts out-of-range starts, which would read wrong entries)
    pad = int(plan.slot_cap.max()) if plan.s_count else 0
    flat_sorted = jnp.concatenate([
        flat_sorted,
        jnp.full((pad,) + trail, sentinel, flat_sorted.dtype),
    ])
    pieces = {d: [] for d in range(plan.n)}
    for i in range(plan.s_count):
        c = int(plan.slot_cap[i])
        st = slot_start[i]
        cnt = slot_end[i] - st
        sl = jax.lax.dynamic_slice(
            flat_sorted, (st,) + (0,) * len(trail), (c,) + trail
        )
        q = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)[:, 0]
        mask = (q < cnt).reshape((c,) + (1,) * len(trail))
        sl = jnp.where(mask, sl, sentinel)
        pieces[int(plan.slot_dest[i])].append((int(plan.slot_bucket_off[i]), sl))
    rows = []
    pad_shape = (plan.c_max,) + trail
    for d in range(plan.n):
        segs = []
        off = 0
        for boff, sl in sorted(pieces[d], key=lambda x: x[0]):
            assert boff == off
            segs.append(sl)
            off += sl.shape[0]
        if off < plan.c_max:
            segs.append(
                jnp.full((plan.c_max - off,) + trail, sentinel,
                         flat_sorted.dtype)
            )
        rows.append(
            jnp.concatenate(segs) if segs
            else jnp.full(pad_shape, sentinel, flat_sorted.dtype)
        )
    return jnp.stack(rows)  # [N, C_max(, D)]


def _entry_bucket_pos(plan: RoutedPlan, slot_sorted_flat, slot_start):
    """For each sorted entry: absolute position in the [N*C_max] bucket
    space (or sentinel N*C_max when over capacity / padding)."""
    m = slot_sorted_flat.shape[0]
    sl = slot_sorted_flat
    cap = jnp.asarray(np.append(plan.slot_cap, 0))
    dest = jnp.asarray(np.append(plan.slot_dest, 0))
    boff = jnp.asarray(np.append(plan.slot_bucket_off, 0), jnp.int32)
    st = jnp.concatenate([slot_start, jnp.zeros((1,), jnp.int32)])
    pos_in_run = (
        jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)[:, 0]
        - jnp.take(st, jnp.minimum(sl, plan.s_count))
    )
    ok = (sl < plan.s_count) & (pos_in_run < jnp.take(cap, jnp.minimum(sl, plan.s_count)))
    pos = (
        jnp.take(dest, jnp.minimum(sl, plan.s_count)) * plan.c_max
        + jnp.take(boff, jnp.minimum(sl, plan.s_count))
        + pos_in_run
    )
    return jnp.where(ok, pos, plan.n * plan.c_max)


def routed_lookup_local(plan: RoutedPlan, layout, pool_local, idx_local,
                        axis: str, compute_dtype=None):
    """Per-chip body of the routed pooled lookup (call under shard_map)."""
    b, t, h = idx_local.shape
    slot, lrow = _classify(plan, layout, idx_local)
    slot_start, slot_end, keys_s, order = _route_sorted(plan, slot)
    lrow_s = jnp.take_along_axis(_tmajor(plan, lrow), order, axis=1)
    lrow_flat = lrow_s.reshape(-1)
    keys_flat = keys_s.reshape(-1)
    bucket = _fill_buckets(
        plan, lrow_flat, slot_start, slot_end, jnp.int32(layout.r_pad)
    )
    recv = jax.lax.all_to_all(
        bucket, axis, split_axis=0, concat_axis=0, tiled=True
    )  # [N_src, C_max] dest-local rows for MY sub-tables
    safe = jnp.minimum(recv.reshape(-1), layout.r_pad - 1)
    if layout.packed_pool:
        from ..ops.pallas.packed_update import packed_gather

        rows = packed_gather(pool_local[0], safe, layout.dim)
    else:
        rows = jnp.take(pool_local[0], safe, axis=0)
    rows = jnp.where(
        (recv.reshape(-1) < layout.r_pad)[:, None], rows,
        jnp.zeros((), rows.dtype),
    )
    if compute_dtype is not None:
        rows = rows.astype(compute_dtype)
    reply = jax.lax.all_to_all(
        rows.reshape(plan.n, plan.c_max, -1), axis,
        split_axis=0, concat_axis=0, tiled=True,
    )  # [N, C_max, D] — my entries, bucket order
    # reassemble: sorted-entry -> bucket position, then invert the sort
    pos_sorted = _entry_bucket_pos(plan, keys_flat, slot_start)
    m_t = b * h
    pos_sorted = pos_sorted.reshape(t, m_t)
    inv_keys, inv_order = jax.lax.sort(
        (order, jax.lax.broadcasted_iota(jnp.int32, (t, m_t), 1)),
        dimension=1, num_keys=1,
    )
    pos_orig = jnp.take_along_axis(pos_sorted, inv_order, axis=1)  # [T, B*H]
    reply_flat = reply.reshape(plan.n * plan.c_max, -1)
    d = reply_flat.shape[-1]
    got = jnp.take(
        reply_flat, jnp.minimum(pos_orig.reshape(-1), reply_flat.shape[0] - 1),
        axis=0,
    )
    got = jnp.where(
        (pos_orig.reshape(-1) < plan.n * plan.c_max)[:, None], got,
        jnp.zeros((), got.dtype),
    )
    got = got.reshape(t, b, h, d).transpose(1, 0, 2, 3)
    return jnp.sum(got.astype(jnp.float32), axis=2).astype(got.dtype)


def routed_update_local(plan: RoutedPlan, layout, pool_local, sstate_local,
                        idx_local, g_local, optimizer, axis: str, lr=None):
    """Per-chip body of the routed backward + fused row update."""
    b, t, h = idx_local.shape
    slot, lrow = _classify(plan, layout, idx_local)
    # per-entry gradient payload = its table's pooled grad (SUM pooling)
    d = g_local.shape[-1]
    g_entry = jnp.broadcast_to(
        g_local[:, :, None, :], (b, t, h, d)
    ).reshape(b, t * h, d)
    slot_start, slot_end, keys_s, order = _route_sorted(plan, slot)
    lrow_s = jnp.take_along_axis(_tmajor(plan, lrow), order, axis=1)
    g_s = jnp.take_along_axis(
        _tmajor(plan, g_entry), order[:, :, None], axis=1
    )  # [T, B*H, D]
    lrow_flat = lrow_s.reshape(-1)
    bucket_rows = _fill_buckets(
        plan, lrow_flat, slot_start, slot_end, jnp.int32(layout.r_pad)
    )
    bucket_g = _fill_buckets(
        plan, g_s.reshape(-1, d), slot_start, slot_end,
        jnp.zeros((), g_s.dtype),
    )  # [N, C_max, D]
    recv_rows = jax.lax.all_to_all(
        bucket_rows, axis, split_axis=0, concat_axis=0, tiled=True
    ).reshape(-1)
    recv_g = jax.lax.all_to_all(
        bucket_g, axis, split_axis=0, concat_axis=0, tiled=True
    ).reshape(-1, d)
    from .embedding_collection import local_pool_row_update

    st = sstate_local[0] if sstate_local is not None else None
    table, st = local_pool_row_update(
        layout, pool_local[0], st, recv_rows, recv_g.astype(jnp.float32),
        optimizer, lr=lr,
    )
    return table, st


def routed_embedding_lookup(layout, pool, indices, mesh: Mesh,
                            aggr=AggrMode.AGGR_MODE_SUM, axis: str = "data",
                            compute_dtype=None, cap_factor: float = 0.0):
    assert aggr is AggrMode.AGGR_MODE_SUM, "routed exchange requires SUM"
    n = layout.num_shards
    b_glob, t, h = indices.shape[0], indices.shape[1], (
        indices.shape[2] if indices.ndim > 2 else 1
    )
    plan = RoutedPlan(layout, b_glob // n, h, cap_factor)

    def local_fn(pool_local, idx_local):
        return routed_lookup_local(
            plan, layout, pool_local, idx_local, axis, compute_dtype
        )

    return jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(layout.param_spec(axis), P(axis, None, None)),
        out_specs=P(axis, None, None), check_vma=False,
    )(pool, indices)


def routed_embedding_sparse_update(layout, pool, sstate, indices, g_pooled,
                                   mesh: Mesh, optimizer,
                                   aggr=AggrMode.AGGR_MODE_SUM,
                                   axis: str = "data", lr=None,
                                   cap_factor: float = 0.0):
    assert aggr is AggrMode.AGGR_MODE_SUM, "routed exchange requires SUM"
    n = layout.num_shards
    h = indices.shape[2] if indices.ndim > 2 else 1
    plan = RoutedPlan(layout, indices.shape[0] // n, h, cap_factor)
    has_state = sstate is not None

    def local_fn(pool_local, sstate_local, idx_local, g_local):
        table, st = routed_update_local(
            plan, layout, pool_local, sstate_local, idx_local, g_local,
            optimizer, axis, lr=lr,
        )
        if has_state:
            return table[None], st[None]
        return table[None]

    if has_state:
        st_spec = P(axis, *([None] * (sstate.ndim - 1)))
        return jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=(
                layout.param_spec(axis), st_spec,
                P(axis, None, None), P(axis, None, None),
            ),
            out_specs=(layout.param_spec(axis), st_spec),
            check_vma=False,
        )(pool, sstate, indices, g_pooled)
    out = jax.shard_map(
        lambda p, i, g: local_fn(p, None, i, g), mesh=mesh,
        in_specs=(
            layout.param_spec(axis), P(axis, None, None), P(axis, None, None)
        ),
        out_specs=layout.param_spec(axis), check_vma=False,
    )(pool, indices, g_pooled)
    return out, None

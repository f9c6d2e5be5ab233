"""Pallas per-lane one-hot cluster traversal — the MXU-resident walk.

Third traversal backend for single-level cluster scenes (C <= 512),
joining the XLA shortlist (ops/cluster_intersect.py) and the
tile-shared Pallas walk (ops/pallas_cluster.py). Same contract, same
watertight math (isect._wt_block), bit-identical hit sets up to
exact-t ties.

Why this exists (measured, round 4, tools/cluster_profile.py on v5e):

- The XLA shortlist walk pays ~300 us of per-8192-chunk SETUP (lax.map
  slicing + while-state round trips through HBM) plus ~6 full HBM
  passes over its (C, chunk) entry table per cluster visit — on the
  glossy bench scene that is 13.9/18.7 ms per 262k-lane sweep
  (camera/bounce), HALF of it setup.
- The tile-shared Pallas walk (one scalar cluster per 1024-lane tile
  per iteration) serializes 256 tiles x ~25 union-visits of tiny
  steps and loses to the XLA path in-context (35 vs 23 ms/iteration).
- This kernel keeps the XLA algorithm's PER-LANE front-to-back walk
  (per-lane visit counts, mean ~3.5 camera / ~7.5 bounce, are 3-7x
  smaller than tile-shared union visits) but runs it entirely in
  VMEM: the (C, T) entry table never touches HBM, and the per-lane
  row fetch is a one-hot matmul on the MXU against the resident
  cluster table.

Two TPU-specific tricks carry the design:

1. PACKED ENTRY ORDERING. The entry table stores
   (f32_bits(entry) & ~0x1FF) | cluster_id as int32. Positive-float
   bit patterns order like the floats, so ONE int min-reduction per
   visit yields the per-lane nearest cluster AND a guaranteed-unique
   winner (ids break exact ties) — the equality compare against the
   min IS the one-hot, no argmin / second reduction / gather needed.
   Truncating 9 mantissa bits only COARSENS the front-to-back order
   (entry_trunc <= entry keeps the cull conservative); hit selection
   stays exact because every triangle test compares exact f32 t.
2. EXACT 3x-bf16 FETCH. One-hot contraction is exact in bf16 (0/1
   times a bf16 payload, exactly one nonzero term per output), so the
   f32 cluster rows are split hi/mid/lo at sync time
   (pack_onehot_tables; the classic non-overlapping 8+8+8-bit mantissa
   split) and fetched with three DEFAULT-precision bf16 matmuls
   summed in f32 — bit-exact row reconstruction at half the MXU
   passes of a Precision.HIGHEST f32 contraction.

Ref capability being matched: the per-thread BVH walk of
kernel/bvh/bvh_traversal.h:34-229 — redesigned (shortlist + MXU fetch)
rather than translated, per SURVEY.md §7.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracingproject_tpu.utils.math import RAY_TMAX
from raytracingproject_tpu.ops import intersect as isect
from raytracingproject_tpu.ops.cluster_intersect import META_COLS

LANE = 128
INF = 3e38          # finite sentinel: one-hot payloads must stay finite
ID_BITS = 9         # supports C <= 512; 2^-14 relative entry coarsening
ID_MASK = (1 << ID_BITS) - 1
# default VMEM budget for the per-tile working set (entry + one-hot +
# fetched rows); v5e VMEM is ~16 MB/core and the pipeline needs
# headroom for lane-IO double buffering
VMEM_BUDGET = 14 * 2**20

MAX_C = 1 << ID_BITS


def choose_tile(c_pad, w_pad, dual=False):
    """Largest lane-tile whose working set fits the VMEM budget.

    The per-lane coefficient is calibrated to real Mosaic scoped-vmem
    allocations (round 4): entry int32 + one-hot build intermediates
    (~13 B/cluster with the blocked entry build) plus the three dot
    outputs and the accumulated rows (~10 B/table-col), plus ~1 KB of
    lane IO/state. The dual (union) walk holds TWO entry tables and
    two ray states."""
    per_lane = c_pad * (26 if dual else 13) + w_pad * 10 \
        + (2048 if dual else 1024)
    for t in (4096, 2048, 1024):
        if per_lane * t <= VMEM_BUDGET:
            return t
    return 1024


def split_bf16x3(x):
    """Exact f32 = hi + mid + lo bf16 split (non-overlapping mantissa
    bits; the residual of each bf16 rounding is exactly representable
    in f32, so the reconstruction is bit-exact)."""
    x = np.asarray(x, np.float32)
    bf = jnp.bfloat16  # ml_dtypes-backed numpy dtype via jnp
    hi = np.asarray(x, bf)
    r1 = x - np.asarray(hi, np.float32)
    mid = np.asarray(r1, bf)
    r2 = r1 - np.asarray(mid, np.float32)
    lo = np.asarray(r2, bf)
    assert (np.asarray(hi, np.float32) + np.asarray(mid, np.float32)
            + np.asarray(lo, np.float32) == x).all(), \
        "bf16x3 split must reconstruct exactly"
    return hi, mid, lo


def pack_onehot_tables(cbounds, ctable):
    """Sync-time packing for the one-hot walk: transpose the cluster
    table to (W, C) fetch orientation, pad W to the bf16 sublane tile
    (16) and C to the MXU lane tile (128), split into exact bf16
    thirds, and pad the bounds to the same C with never-hit boxes.
    Returns dict of numpy arrays to device_put (or None when C exceeds
    the packed-id capacity)."""
    c, w = ctable.shape
    if c > MAX_C:
        return None
    c_pad = max(128, -(-c // 128) * 128)
    w_pad = -(-w // 16) * 16
    if (c_pad * 13 + w_pad * 10 + 1024) * 1024 > VMEM_BUDGET:
        # even the smallest lane tile would blow Mosaic's scoped-vmem
        # budget (choose_tile coefficients) — decline here so dispatch
        # (integrator._use_pallas_onehot keys on "oh_cbounds") falls
        # back to the XLA/tile-shared walks instead of failing at
        # compile time inside a jit (ADVICE r4)
        return None
    tt = np.zeros((w_pad, c_pad), np.float32)
    tt[:w, :c] = np.asarray(ctable, np.float32).T
    hi, mid, lo = split_bf16x3(tt)
    # pad bounds: a degenerate point box at +INF. NOT the "inverted
    # box" (lo=+INF, hi=-INF): under the slab math an inverted box is
    # ALWAYS-HIT with entry=tmin (tn=-INF, tf=+INF), which made every
    # lane walk all c_pad-c pad rows before any real cluster (round-4
    # bug: 77 pad rows = 77 wasted visits per tile on glossy). The
    # point box at +INF fails the slab test for every sign pattern:
    # any +inf axis fails tn<=tmax, any -inf axis fails tf>=tmin.
    cb = np.full((c_pad, 6), np.float32(INF))
    cb[:c] = np.asarray(cbounds, np.float32)
    return {"oh_table_hi": hi, "oh_table_mid": mid, "oh_table_lo": lo,
            "oh_cbounds": cb}


def _onehot_kernel(cluster_tris, has_instances, shadow_any_hit,
                   has_motion, c_pad, tile,
                   cb_ref, th_ref, tm_ref, tl_ref,
                   o_ref, d_ref, tmin_ref, tmax_ref, vis_ref, time_ref,
                   t_ref, prim_ref, u_ref, v_ref, obj_ref,
                   entry_ref):
    """One (tile,)-lane block vs the whole cluster table (VMEM)."""
    s = tile // LANE
    ox = o_ref[0].reshape(s, LANE)
    oy = o_ref[1].reshape(s, LANE)
    oz = o_ref[2].reshape(s, LANE)
    dx = d_ref[0].reshape(s, LANE)
    dy = d_ref[1].reshape(s, LANE)
    dz = d_ref[2].reshape(s, LANE)
    tmin = tmin_ref[:].reshape(s, LANE)
    tmax = tmax_ref[:].reshape(s, LANE)
    vis_lane = vis_ref[:].reshape(s, LANE)
    time = time_ref[:].reshape(s, LANE) if has_motion else None

    # ---- packed entry table (C, T): truncated f32 entry bits | id.
    # Built in 128-row blocks: the full (C, T) tn/tf temporaries were
    # the largest scoped-vmem peak contributor (measured OOM at
    # C=512, W=384, T=1024) ----
    tmin_f = tmin.reshape(1, tile)
    tmax_f = tmax.reshape(1, tile)
    mask = jnp.int32(~ID_MASK)
    inv3 = []
    for dax_t in (dx, dy, dz):
        dax = dax_t.reshape(1, tile)
        inv3.append(jnp.where(jnp.abs(dax) > 1e-20,
                              1.0 / jnp.where(dax == 0, 1.0, dax),
                              jnp.where(dax >= 0, 1e20, -1e20)))
    cb_blk = 128
    for c0 in range(0, c_pad, cb_blk):
        tn = jnp.full((cb_blk, tile), -INF, jnp.float32)
        tf = jnp.full((cb_blk, tile), INF, jnp.float32)
        for ax in range(3):
            oax = (ox, oy, oz)[ax].reshape(1, tile)
            lo_b = cb_ref[c0:c0 + cb_blk, ax].reshape(cb_blk, 1)
            hi_b = cb_ref[c0:c0 + cb_blk, 3 + ax].reshape(cb_blk, 1)
            t0 = (lo_b - oax) * inv3[ax]
            t1 = (hi_b - oax) * inv3[ax]
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        ok = (tn <= tf) & (tf >= tmin_f) & (tn <= tmax_f)
        ef = jnp.where(ok, jnp.maximum(tn, tmin_f), INF)
        cid_b = c0 + jax.lax.broadcasted_iota(jnp.int32, (cb_blk, 1), 0)
        entry_ref[c0:c0 + cb_blk, :] = \
            (pltpu.bitcast(ef, jnp.int32) & mask) | cid_b
    cid = jax.lax.broadcasted_iota(jnp.int32, (c_pad, 1), 0)
    # retired/processed sentinel per row: keeps the packed values
    # unique even when every live row is exhausted, so the equality
    # one-hot always selects exactly one row
    sent = (pltpu.bitcast(jnp.full((c_pad, 1), INF, jnp.float32),
                          jnp.int32) & mask) | cid

    tri_w = 18 if has_motion else 9
    pbase = META_COLS + tri_w * cluster_tris
    obase = pbase + cluster_tris
    vbase = obase + cluster_tris

    ws0 = None
    if not has_instances:
        ws0 = isect.watertight_setup_c(ox, oy, oz, dx, dy, dz)

    def gate(t_best, prim_b):
        if shadow_any_hit:
            return jnp.where(prim_b >= 0, -INF, jnp.minimum(t_best, INF))
        return jnp.minimum(t_best, INF)

    def unpack(m):
        return pltpu.bitcast(m & mask, jnp.float32)

    def alive_of(m, t_best, prim_b):
        # float-only liveness scalar (negative = some lane still active):
        # the proven kernels (ops/pallas_cluster.py pick) reduce floats
        # for their while conds; a bool->int reduction here left the
        # loop running to its iteration cap on real Mosaic (the i1
        # relayout family of bugs), costing 8x in-context
        return jnp.min(unpack(m) - gate(t_best, prim_b))

    t0w = jnp.minimum(tmax, RAY_TMAX)
    prim0 = jnp.full((s, LANE), -1, jnp.int32)
    m0 = jnp.min(entry_ref[:], axis=0).reshape(s, LANE)
    carry0 = (t0w, prim0,
              jnp.zeros((s, LANE), jnp.float32),
              jnp.zeros((s, LANE), jnp.float32),
              jnp.full((s, LANE), -1, jnp.int32),
              m0, alive_of(m0, t0w, prim0), jnp.int32(0))

    def cond(st):
        return (st[6] < 0.0) & (st[7] < c_pad)

    def body(st):
        t_best, prim_b, u_b, v_b, obj_b, m, _, it = st
        act = unpack(m) < gate(t_best, prim_b)

        # equality against the (unique) packed min IS the one-hot.
        # Select in f32 first: Mosaic cannot relayout the (8,128)-tiled
        # i1 mask of an int32 compare straight into a (16,128) bf16
        # select ("Invalid relayout ... vector<...xi1>")
        eq = entry_ref[:] == m.reshape(1, tile)
        oh = jnp.where(eq, 1.0, 0.0).astype(jnp.bfloat16)
        dn = (((1,), (0,)), ((), ()))
        rows = jax.lax.dot_general(th_ref[:], oh, dn,
                                   preferred_element_type=jnp.float32)
        rows = rows + jax.lax.dot_general(
            tm_ref[:], oh, dn, preferred_element_type=jnp.float32)
        rows = rows + jax.lax.dot_general(
            tl_ref[:], oh, dn, preferred_element_type=jnp.float32)

        def rs(j):
            return rows[j].reshape(s, LANE)

        if has_instances:
            mt = [rs(j) for j in range(12)]
            oxx = mt[0] * ox + mt[1] * oy + mt[2] * oz + mt[3]
            oyy = mt[4] * ox + mt[5] * oy + mt[6] * oz + mt[7]
            ozz = mt[8] * ox + mt[9] * oy + mt[10] * oz + mt[11]
            dxx = mt[0] * dx + mt[1] * dy + mt[2] * dz
            dyy = mt[4] * dx + mt[5] * dy + mt[6] * dz
            dzz = mt[8] * dx + mt[9] * dy + mt[10] * dz
            ws = isect.watertight_setup_c(oxx, oyy, ozz, dxx, dyy, dzz)
        else:
            ws = ws0

        bt, bp, bu, bv, bo = t_best, prim_b, u_b, v_b, obj_b
        for k in range(cluster_tris):
            b = META_COLS + 9 * k
            v0c = (rs(b), rs(b + 1), rs(b + 2))
            e1c = (rs(b + 3), rs(b + 4), rs(b + 5))
            e2c = (rs(b + 6), rs(b + 7), rs(b + 8))
            if has_motion:
                db = META_COLS + 9 * cluster_tris + 9 * k
                v0c = tuple(v0c[j] + time * rs(db + j) for j in range(3))
                e1c = tuple(e1c[j] + time * rs(db + 3 + j)
                            for j in range(3))
                e2c = tuple(e2c[j] + time * rs(db + 6 + j)
                            for j in range(3))
            hit, t, u, v = isect._wt_block(ws, v0c, e1c, e2c, tmin, bt)
            pid = rs(pbase + k)
            hit = hit & act & (pid >= 0.0)
            tri_vis = rs(vbase + k).astype(jnp.int32)
            hit &= (tri_vis & vis_lane) > 0
            bt = jnp.where(hit, t, bt)
            bp = jnp.where(hit, pid.astype(jnp.int32), bp)
            bu = jnp.where(hit, u, bu)
            bv = jnp.where(hit, v, bv)
            bo = jnp.where(hit, rs(obase + k).astype(jnp.int32), bo)

        # retire the processed rows and cull everything behind the
        # (tightened) best hit, then re-reduce for the next visit
        ent = entry_ref[:]
        cull = eq | (unpack(ent)
                     >= jnp.minimum(bt, INF).reshape(1, tile))
        ent = jnp.where(cull, sent, ent)
        entry_ref[:] = ent
        m2 = jnp.min(ent, axis=0).reshape(s, LANE)
        return (bt, bp, bu, bv, bo, m2, alive_of(m2, bt, bp), it + 1)

    out = jax.lax.while_loop(cond, body, carry0)
    t_ref[:] = out[0].reshape(tile)
    prim_ref[:] = out[1].reshape(tile)
    u_ref[:] = out[2].reshape(tile)
    v_ref[:] = out[3].reshape(tile)
    obj_ref[:] = out[4].reshape(tile)
    if _DEBUG_ITERS:
        # diagnostic: per-tile loop trip count riding the v channel
        v_ref[:] = jnp.broadcast_to(
            out[7].astype(jnp.float32), (tile,))


_DEBUG_ITERS = False


G_PAD = 128   # two-level inner capacity (clusters per supercluster)


def pack_onehot2_tables(sc_bounds, cbounds, ctable, gmax):
    """Sync-time packing for the TWO-LEVEL one-hot walk: per
    supercluster, the group's cluster rows transposed to fetch
    orientation, padded to (W_pad, G_PAD) and split into exact bf16
    thirds — (SC, W_pad, G_PAD) HBM arrays the kernel DMAs per outer
    visit; plus (SC, G_PAD, 6) group-local cluster bounds (never-hit
    point boxes past gcount). Returns None when a group exceeds G_PAD
    or the inner working set would blow the VMEM budget."""
    sc_bounds = np.asarray(sc_bounds, np.float32)
    cbounds = np.asarray(cbounds, np.float32)
    ctable = np.asarray(ctable, np.float32)
    if gmax > G_PAD:
        return None
    c, w = ctable.shape
    w_pad = -(-w // 16) * 16
    # inner working set at tile 1024 (floats): sc_entry + centry +
    # rows + tables; stay within the calibrated budget with 2x peak
    sc = sc_bounds.shape[0]
    est = (sc * 4 + G_PAD * 4 + w_pad * 4 + w_pad * 2 * 3 // 128
           + 1024) * 1024
    if est * 2 > VMEM_BUDGET:
        return None
    hi = np.zeros((sc, w_pad, G_PAD), np.float32)
    # bounds minor dim padded to the 128-lane tile: Mosaic requires
    # HBM DMA slices lane-tile aligned (cols 0-5 used, rest never read)
    gcb = np.full((sc, G_PAD, 128), np.float32(INF))
    for g in range(sc):
        start = int(sc_bounds[g, 6])
        count = int(sc_bounds[g, 7])
        if count == 0:
            continue
        hi[g, :w, :count] = ctable[start:start + count].T
        gcb[g, :count, :6] = cbounds[start:start + count]
    h, m, lo = split_bf16x3(hi)
    return {"oh2_scb": sc_bounds, "oh2_gcb": gcb,
            "oh2_hi": h, "oh2_mid": m, "oh2_lo": lo}


def _onehot2_kernel(cluster_tris, has_instances, shadow_any_hit,
                    has_motion, sc_pad, w_pad, tile,
                    scb_ref, gcb_hbm, th_hbm, tm_hbm, tl_hbm,
                    o_ref, d_ref, tmin_ref, tmax_ref, vis_ref, time_ref,
                    t_ref, prim_ref, u_ref, v_ref, obj_ref,
                    sce_ref, centry_ref, gcb_ref, tab_h, tab_m, tab_l,
                    sem_cb, sem_h, sem_m, sem_l):
    """Two-level walk: tile-shared OUTER supercluster pick (the group
    tables must be DMA'd once per tile), per-lane one-hot INNER walk
    over the group's <=G_PAD clusters from the DMA'd VMEM tables —
    the single-level kernel's per-lane visit counts (3-7x below
    tile-union counts) applied to the >512-cluster regime
    (round-5 verdict item 6; ref: two-level pack_instances,
    bvh/bvh.h:117)."""
    s = tile // LANE
    ox = o_ref[0].reshape(s, LANE)
    oy = o_ref[1].reshape(s, LANE)
    oz = o_ref[2].reshape(s, LANE)
    dx = d_ref[0].reshape(s, LANE)
    dy = d_ref[1].reshape(s, LANE)
    dz = d_ref[2].reshape(s, LANE)
    tmin = tmin_ref[:].reshape(s, LANE)
    tmax = tmax_ref[:].reshape(s, LANE)
    vis_lane = vis_ref[:].reshape(s, LANE)
    time = time_ref[:].reshape(s, LANE) if has_motion else None
    tmin_f = tmin.reshape(1, tile)
    tmax_f = tmax.reshape(1, tile)
    mask = jnp.int32(~ID_MASK)

    inv3 = []
    for dax_t in (dx, dy, dz):
        dax = dax_t.reshape(1, tile)
        inv3.append(jnp.where(jnp.abs(dax) > 1e-20,
                              1.0 / jnp.where(dax == 0, 1.0, dax),
                              jnp.where(dax >= 0, 1e20, -1e20)))

    # ---- outer entry table: f32 slab entries vs supercluster bounds
    # (tile-shared pick needs no packed-id uniqueness) ----
    cb_blk = 128
    for c0 in range(0, sc_pad, cb_blk):
        tn = jnp.full((cb_blk, tile), -INF, jnp.float32)
        tf = jnp.full((cb_blk, tile), INF, jnp.float32)
        for ax in range(3):
            oax = (ox, oy, oz)[ax].reshape(1, tile)
            lo_b = scb_ref[c0:c0 + cb_blk, ax].reshape(cb_blk, 1)
            hi_b = scb_ref[c0:c0 + cb_blk, 3 + ax].reshape(cb_blk, 1)
            t0 = (lo_b - oax) * inv3[ax]
            t1 = (hi_b - oax) * inv3[ax]
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        ok = (tn <= tf) & (tf >= tmin_f) & (tn <= tmax_f)
        sce_ref[c0:c0 + cb_blk, :] = jnp.where(
            ok, jnp.maximum(tn, tmin_f), INF)

    tri_w = 18 if has_motion else 9
    pbase = META_COLS + tri_w * cluster_tris
    obase = pbase + cluster_tris
    vbase = obase + cluster_tris

    ws0 = None
    if not has_instances:
        ws0 = isect.watertight_setup_c(ox, oy, oz, dx, dy, dz)

    def gate(t_best, prim_b):
        if shadow_any_hit:
            return jnp.where(prim_b >= 0, -INF, jnp.minimum(t_best, INF))
        return jnp.minimum(t_best, INF)

    def outer_pick(t_best, prim_b):
        g = gate(t_best, prim_b).reshape(1, tile)
        masked = jnp.where(sce_ref[:] < g, sce_ref[:], INF)
        cm = jnp.min(masked, axis=1).reshape(-1, 1)
        scid = jnp.argmin(cm, axis=0)[0]
        return scid, jnp.min(cm)

    def unpack(m):
        return pltpu.bitcast(m & mask, jnp.float32)

    def outer_body(st):
        bt, bp, bu, bv, bo, scid, _, it = st
        # DMA the group's tables + bounds
        cps = [pltpu.make_async_copy(gcb_hbm.at[scid], gcb_ref, sem_cb),
               pltpu.make_async_copy(th_hbm.at[scid], tab_h, sem_h),
               pltpu.make_async_copy(tm_hbm.at[scid], tab_m, sem_m),
               pltpu.make_async_copy(tl_hbm.at[scid], tab_l, sem_l)]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

        # ---- inner entry table (G_PAD, T): packed entry|id ints ----
        need = gate(bt, bp).reshape(1, tile)
        tn = jnp.full((G_PAD, tile), -INF, jnp.float32)
        tf = jnp.full((G_PAD, tile), INF, jnp.float32)
        for ax in range(3):
            oax = (ox, oy, oz)[ax].reshape(1, tile)
            lo_b = gcb_ref[:, ax].reshape(G_PAD, 1)
            hi_b = gcb_ref[:, 3 + ax].reshape(G_PAD, 1)
            t0 = (lo_b - oax) * inv3[ax]
            t1 = (hi_b - oax) * inv3[ax]
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        ok = (tn <= tf) & (tf >= tmin_f) & (tn <= jnp.minimum(
            tmax_f, need))
        ef = jnp.where(ok, jnp.maximum(tn, tmin_f), INF)
        cid_b = jax.lax.broadcasted_iota(jnp.int32, (G_PAD, 1), 0)
        centry_ref[:] = (pltpu.bitcast(ef, jnp.int32) & mask) | cid_b
        sent = (pltpu.bitcast(jnp.full((G_PAD, 1), INF, jnp.float32),
                              jnp.int32) & mask) | cid_b

        def alive_of(m, t_best, prim_b):
            return jnp.min(unpack(m) - gate(t_best, prim_b))

        m0 = jnp.min(centry_ref[:], axis=0).reshape(s, LANE)
        inner0 = (bt, bp, bu, bv, bo, m0, alive_of(m0, bt, bp),
                  jnp.int32(0))

        def inner_cond(ist):
            return (ist[6] < 0.0) & (ist[7] < G_PAD)

        def inner_body(ist):
            ibt, ibp, ibu, ibv, ibo, m, _, iit = ist
            act = unpack(m) < gate(ibt, ibp)
            eq = centry_ref[:] == m.reshape(1, tile)
            oh = jnp.where(eq, 1.0, 0.0).astype(jnp.bfloat16)
            dn = (((1,), (0,)), ((), ()))
            rows = jax.lax.dot_general(
                tab_h[:], oh, dn, preferred_element_type=jnp.float32)
            rows = rows + jax.lax.dot_general(
                tab_m[:], oh, dn, preferred_element_type=jnp.float32)
            rows = rows + jax.lax.dot_general(
                tab_l[:], oh, dn, preferred_element_type=jnp.float32)

            def rs(j):
                return rows[j].reshape(s, LANE)

            if has_instances:
                mt = [rs(j) for j in range(12)]
                oxx = mt[0] * ox + mt[1] * oy + mt[2] * oz + mt[3]
                oyy = mt[4] * ox + mt[5] * oy + mt[6] * oz + mt[7]
                ozz = mt[8] * ox + mt[9] * oy + mt[10] * oz + mt[11]
                dxx = mt[0] * dx + mt[1] * dy + mt[2] * dz
                dyy = mt[4] * dx + mt[5] * dy + mt[6] * dz
                dzz = mt[8] * dx + mt[9] * dy + mt[10] * dz
                ws = isect.watertight_setup_c(oxx, oyy, ozz,
                                              dxx, dyy, dzz)
            else:
                ws = ws0

            for k in range(cluster_tris):
                b = META_COLS + 9 * k
                v0c = (rs(b), rs(b + 1), rs(b + 2))
                e1c = (rs(b + 3), rs(b + 4), rs(b + 5))
                e2c = (rs(b + 6), rs(b + 7), rs(b + 8))
                if has_motion:
                    db = META_COLS + 9 * cluster_tris + 9 * k
                    v0c = tuple(v0c[j] + time * rs(db + j)
                                for j in range(3))
                    e1c = tuple(e1c[j] + time * rs(db + 3 + j)
                                for j in range(3))
                    e2c = tuple(e2c[j] + time * rs(db + 6 + j)
                                for j in range(3))
                hit, t, u, v = isect._wt_block(ws, v0c, e1c, e2c,
                                               tmin, ibt)
                pid = rs(pbase + k)
                hit = hit & act & (pid >= 0.0)
                tri_vis = rs(vbase + k).astype(jnp.int32)
                hit &= (tri_vis & vis_lane) > 0
                ibt = jnp.where(hit, t, ibt)
                ibp = jnp.where(hit, pid.astype(jnp.int32), ibp)
                ibu = jnp.where(hit, u, ibu)
                ibv = jnp.where(hit, v, ibv)
                ibo = jnp.where(hit, rs(obase + k).astype(jnp.int32),
                                ibo)

            ent = centry_ref[:]
            cull = eq | (unpack(ent)
                         >= jnp.minimum(ibt, INF).reshape(1, tile))
            ent = jnp.where(cull, sent, ent)
            centry_ref[:] = ent
            m2 = jnp.min(ent, axis=0).reshape(s, LANE)
            return (ibt, ibp, ibu, ibv, ibo, m2,
                    alive_of(m2, ibt, ibp), iit + 1)

        iout = jax.lax.while_loop(inner_cond, inner_body, inner0)
        bt, bp, bu, bv, bo = iout[0], iout[1], iout[2], iout[3], iout[4]

        sce_ref[pl.ds(scid, 1), :] = jnp.full((1, tile), INF,
                                              jnp.float32)
        nsc, nm = outer_pick(bt, bp)
        return (bt, bp, bu, bv, bo, nsc, nm, it + 1)

    t0w = jnp.minimum(tmax, RAY_TMAX)
    prim0 = jnp.full((s, LANE), -1, jnp.int32)
    sc0, m0 = outer_pick(t0w, prim0)
    carry0 = (t0w, prim0,
              jnp.zeros((s, LANE), jnp.float32),
              jnp.zeros((s, LANE), jnp.float32),
              jnp.full((s, LANE), -1, jnp.int32),
              sc0, m0, jnp.int32(0))
    out = jax.lax.while_loop(
        lambda st: (st[6] < INF) & (st[7] < sc_pad), outer_body, carry0)
    t_ref[:] = out[0].reshape(tile)
    prim_ref[:] = out[1].reshape(tile)
    u_ref[:] = out[2].reshape(tile)
    v_ref[:] = out[3].reshape(tile)
    obj_ref[:] = out[4].reshape(tile)


@functools.partial(
    jax.jit, static_argnames=("cluster_tris", "shadow_any_hit",
                              "has_instances", "has_motion", "tile",
                              "interpret"))
def intersect_clusters2_onehot(scb, gcb, th, tm, tl, cluster_tris,
                               o, d, tmin, tmax, visibility,
                               shadow_any_hit=False, has_instances=False,
                               time=None, has_motion=False, tile=1024,
                               interpret=False):
    """Two-level one-hot traversal as one Pallas dispatch.

    scb (SC, 8) f32 [lo, hi, cstart, gcount]; gcb (SC, G_PAD, 6) f32;
    th/tm/tl (SC, W_pad, G_PAD) bf16 — from pack_onehot2_tables. Same
    contract/returns as intersect_clusters_onehot."""
    sc = scb.shape[0]
    w_pad = th.shape[1]
    sc_pad = -(-sc // 128) * 128
    if sc_pad > sc:
        pad_b = jnp.tile(jnp.asarray(
            [[INF, INF, INF, INF, INF, INF, 0.0, 0.0]], jnp.float32),
            (sc_pad - sc, 1))
        scb_p = jnp.concatenate([jnp.asarray(scb), pad_b], axis=0)
    else:
        scb_p = jnp.asarray(scb)
    n = o.shape[0]
    pad = (-n) % tile
    if pad:
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        tmin = jnp.pad(tmin, (0, pad))
        tmax = jnp.pad(tmax, (0, pad), constant_values=-1.0)
        visibility = jnp.pad(visibility, (0, pad))
        if time is not None:
            time = jnp.pad(time, (0, pad))
    np_ = n + pad
    ntiles = np_ // tile
    if time is None:
        time = jnp.zeros((np_,), jnp.float32)

    kern = functools.partial(_onehot2_kernel, int(cluster_tris),
                             bool(has_instances), bool(shadow_any_hit),
                             bool(has_motion), int(sc_pad), int(w_pad),
                             int(tile))
    lane_spec = pl.BlockSpec((tile,), lambda i: (i,),
                             memory_space=pltpu.VMEM)
    soa_spec = pl.BlockSpec((3, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    t, prim, u, v, obj = pl.pallas_call(
        kern,
        grid=(ntiles,),
        in_specs=[full_spec,                       # scb (padded, VMEM)
                  any_spec, any_spec, any_spec, any_spec,  # HBM tables
                  soa_spec, soa_spec,
                  lane_spec, lane_spec, lane_spec, lane_spec],
        out_specs=[lane_spec] * 5,
        out_shape=[
            jax.ShapeDtypeStruct((np_,), jnp.float32),
            jax.ShapeDtypeStruct((np_,), jnp.int32),
            jax.ShapeDtypeStruct((np_,), jnp.float32),
            jax.ShapeDtypeStruct((np_,), jnp.float32),
            jax.ShapeDtypeStruct((np_,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((sc_pad, tile), jnp.float32),   # outer entries
            pltpu.VMEM((G_PAD, tile), jnp.int32),      # inner entries
            pltpu.VMEM((G_PAD, 128), jnp.float32),     # group bounds
            pltpu.VMEM((w_pad, G_PAD), jnp.bfloat16),
            pltpu.VMEM((w_pad, G_PAD), jnp.bfloat16),
            pltpu.VMEM((w_pad, G_PAD), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(scb_p, jnp.asarray(gcb), jnp.asarray(th), jnp.asarray(tm),
      jnp.asarray(tl), o.T.reshape(3, np_), d.T.reshape(3, np_),
      tmin, tmax, visibility.astype(jnp.int32), time)

    hit = prim >= 0
    return {"t": jnp.where(hit[:n], t[:n],
                           jnp.minimum(tmax[:n], RAY_TMAX)),
            "prim": jnp.where(hit[:n], prim[:n], -1),
            "u": u[:n], "v": v[:n],
            "object": jnp.where(hit[:n], obj[:n], -1)}


def _onehot_dual_kernel(cluster_tris, has_instances, has_motion, c_pad,
                        tile,
                        cb_ref, th_ref, tm_ref, tl_ref,
                        oc_ref, dc_ref, tminc_ref, tmaxc_ref, visc_ref,
                        oa_ref, da_ref, tmina_ref, tmaxa_ref, visa_ref,
                        time_ref,
                        t_ref, prim_ref, u_ref, v_ref, obj_ref, blk_ref,
                        entc_ref, enta_ref):
    """UNION walk: one fetch stream serves a CLOSEST-hit ray (the next
    bounce) and an ANY-hit ray (this bounce's NEE shadow) per lane.

    Each iteration picks, per lane, the nearest unprocessed cluster
    across BOTH rays' front-to-back queues (min of the two packed-int
    heads), fetches its row ONCE via the one-hot MXU contraction, and
    tests the triangles against both rays. The cluster then retires
    from both queues — clusters relevant to both rays (common near the
    shared origin) are fetched once instead of twice, and the second
    kernel launch + entry rebuild of a separate shadow sweep disappears
    (round-5 verdict item 2: the reference pays two traversals per
    bounce, kernel/kernel_shadow.h + kernel_path_surface.h).

    Testing a fetched cluster against a ray whose own queue didn't pick
    it is SOUND and free: closest accumulation only tightens (strict
    t < best), any-hit only latches, and the watertight math is exact —
    extra tests add information, never corrupt it.
    """
    s = tile // LANE

    def soa(ref):
        return (ref[0].reshape(s, LANE), ref[1].reshape(s, LANE),
                ref[2].reshape(s, LANE))

    ocx, ocy, ocz = soa(oc_ref)
    dcx, dcy, dcz = soa(dc_ref)
    oax, oay, oaz = soa(oa_ref)
    dax, day, daz = soa(da_ref)
    tminc = tminc_ref[:].reshape(s, LANE)
    tmaxc = tmaxc_ref[:].reshape(s, LANE)
    tmina = tmina_ref[:].reshape(s, LANE)
    tmaxa = tmaxa_ref[:].reshape(s, LANE)
    visc = visc_ref[:].reshape(s, LANE)
    visa = visa_ref[:].reshape(s, LANE)
    time = time_ref[:].reshape(s, LANE) if has_motion else None

    mask = jnp.int32(~ID_MASK)
    cb_blk = 128

    def build_entries(ent_ref, o3, d3, tmn, tmx):
        tmin_f = tmn.reshape(1, tile)
        tmax_f = tmx.reshape(1, tile)
        inv3 = []
        for dax_t in d3:
            dax_ = dax_t.reshape(1, tile)
            inv3.append(jnp.where(jnp.abs(dax_) > 1e-20,
                                  1.0 / jnp.where(dax_ == 0, 1.0, dax_),
                                  jnp.where(dax_ >= 0, 1e20, -1e20)))
        for c0 in range(0, c_pad, cb_blk):
            tn = jnp.full((cb_blk, tile), -INF, jnp.float32)
            tf = jnp.full((cb_blk, tile), INF, jnp.float32)
            for ax in range(3):
                oax_ = o3[ax].reshape(1, tile)
                lo_b = cb_ref[c0:c0 + cb_blk, ax].reshape(cb_blk, 1)
                hi_b = cb_ref[c0:c0 + cb_blk, 3 + ax].reshape(cb_blk, 1)
                t0 = (lo_b - oax_) * inv3[ax]
                t1 = (hi_b - oax_) * inv3[ax]
                tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                tf = jnp.minimum(tf, jnp.maximum(t0, t1))
            ok = (tn <= tf) & (tf >= tmin_f) & (tn <= tmax_f)
            ef = jnp.where(ok, jnp.maximum(tn, tmin_f), INF)
            cid_b = c0 + jax.lax.broadcasted_iota(jnp.int32,
                                                  (cb_blk, 1), 0)
            ent_ref[c0:c0 + cb_blk, :] = \
                (pltpu.bitcast(ef, jnp.int32) & mask) | cid_b

    build_entries(entc_ref, (ocx, ocy, ocz), (dcx, dcy, dcz),
                  tminc, tmaxc)
    build_entries(enta_ref, (oax, oay, oaz), (dax, day, daz),
                  tmina, tmaxa)
    cid_col = jax.lax.broadcasted_iota(jnp.int32, (c_pad, 1), 0)
    sent = (pltpu.bitcast(jnp.full((c_pad, 1), INF, jnp.float32),
                          jnp.int32) & mask) | cid_col
    MAXI = jnp.int32(0x7FFFFFFF)  # > any packed entry; low bits pick
    # column ID_MASK for done lanes (a real column only at c_pad=512,
    # where the repeat test is idempotent)

    tri_w = 18 if has_motion else 9
    pbase = META_COLS + tri_w * cluster_tris
    obase = pbase + cluster_tris
    vbase = obase + cluster_tris

    wsc0 = wsa0 = None
    if not has_instances:
        wsc0 = isect.watertight_setup_c(ocx, ocy, ocz, dcx, dcy, dcz)
        wsa0 = isect.watertight_setup_c(oax, oay, oaz, dax, day, daz)

    def unpack(m):
        return pltpu.bitcast(m & mask, jnp.float32)

    def heads(mc, ma, bt, blk):
        # per-lane queue heads masked to MAXI once that ray is done
        ec = jnp.where(unpack(mc) < jnp.minimum(bt, INF), mc, MAXI)
        ea = jnp.where((unpack(ma) < INF) & (blk == 0.0), ma, MAXI)
        return ec, ea

    def alive_of(mc, ma, bt, blk):
        # PURE-FLOAT liveness (negative = some lane still active):
        # mirrors _onehot_kernel.alive_of / pallas_cluster.pick — a
        # bool/select-built cond scalar miscompiles on real Mosaic
        # (the r4 run-to-cap family), silently correct but ~15x slow.
        live_c = unpack(mc) - jnp.minimum(bt, INF)
        live_a = unpack(ma) * (1.0 - blk) + blk * INF - INF
        return jnp.min(jnp.minimum(live_c, live_a))

    t0w = jnp.minimum(tmaxc, RAY_TMAX)
    prim0 = jnp.full((s, LANE), -1, jnp.int32)
    blk0 = jnp.zeros((s, LANE), jnp.float32)
    mc0 = jnp.min(entc_ref[:], axis=0).reshape(s, LANE)
    ma0 = jnp.min(enta_ref[:], axis=0).reshape(s, LANE)
    ec0, ea0 = heads(mc0, ma0, t0w, blk0)
    carry0 = (t0w, prim0,
              jnp.zeros((s, LANE), jnp.float32),
              jnp.zeros((s, LANE), jnp.float32),
              jnp.full((s, LANE), -1, jnp.int32),
              blk0, ec0, ea0, alive_of(mc0, ma0, t0w, blk0),
              jnp.int32(0))

    def cond(st):
        return (st[8] < 0.0) & (st[9] < c_pad + 2)

    def body(st):
        bt, bp, bu, bv, bo, blk, ec, ea, _, it = st
        pick = jnp.minimum(ec, ea)
        act = pick < MAXI
        # positional one-hot: equality against the OWNING table's packed
        # value (the single kernel's proven layout — a (C, T) table vs a
        # lane-broadcast; an iota-vs-lane-vector compare lowers to a
        # cross-layout broadcast that cost ~20x in Mosaic). Values embed
        # the id bits, so both tables can only match at the SAME row;
        # the OR marks row c positionally for retirement in BOTH tables.
        eq = (entc_ref[:] == pick.reshape(1, tile)) \
            | (enta_ref[:] == pick.reshape(1, tile))
        oh = jnp.where(eq, 1.0, 0.0).astype(jnp.bfloat16)
        dn = (((1,), (0,)), ((), ()))
        rows = jax.lax.dot_general(th_ref[:], oh, dn,
                                   preferred_element_type=jnp.float32)
        rows = rows + jax.lax.dot_general(
            tm_ref[:], oh, dn, preferred_element_type=jnp.float32)
        rows = rows + jax.lax.dot_general(
            tl_ref[:], oh, dn, preferred_element_type=jnp.float32)

        def rs(j):
            return rows[j].reshape(s, LANE)

        if has_instances:
            mt = [rs(j) for j in range(12)]

            def xform(ox, oy, oz, dx, dy, dz):
                oxx = mt[0] * ox + mt[1] * oy + mt[2] * oz + mt[3]
                oyy = mt[4] * ox + mt[5] * oy + mt[6] * oz + mt[7]
                ozz = mt[8] * ox + mt[9] * oy + mt[10] * oz + mt[11]
                dxx = mt[0] * dx + mt[1] * dy + mt[2] * dz
                dyy = mt[4] * dx + mt[5] * dy + mt[6] * dz
                dzz = mt[8] * dx + mt[9] * dy + mt[10] * dz
                return isect.watertight_setup_c(oxx, oyy, ozz,
                                                dxx, dyy, dzz)
            wsc = xform(ocx, ocy, ocz, dcx, dcy, dcz)
            wsa = xform(oax, oay, oaz, dax, day, daz)
        else:
            wsc, wsa = wsc0, wsa0

        any_hit = jnp.zeros((s, LANE), jnp.float32)
        for k in range(cluster_tris):
            b = META_COLS + 9 * k
            v0c = (rs(b), rs(b + 1), rs(b + 2))
            e1c = (rs(b + 3), rs(b + 4), rs(b + 5))
            e2c = (rs(b + 6), rs(b + 7), rs(b + 8))
            if has_motion:
                db = META_COLS + 9 * cluster_tris + 9 * k
                v0c = tuple(v0c[j] + time * rs(db + j) for j in range(3))
                e1c = tuple(e1c[j] + time * rs(db + 3 + j)
                            for j in range(3))
                e2c = tuple(e2c[j] + time * rs(db + 6 + j)
                            for j in range(3))
            pid = rs(pbase + k)
            tri_vis = rs(vbase + k).astype(jnp.int32)
            real = act & (pid >= 0.0)
            # closest ray
            hit, t, u, v = isect._wt_block(wsc, v0c, e1c, e2c, tminc, bt)
            hit = hit & real & ((tri_vis & visc) > 0)
            bt = jnp.where(hit, t, bt)
            bp = jnp.where(hit, pid.astype(jnp.int32), bp)
            bu = jnp.where(hit, u, bu)
            bv = jnp.where(hit, v, bv)
            bo = jnp.where(hit, rs(obase + k).astype(jnp.int32), bo)
            # any ray (window [tmina, tmaxa], latch only)
            hita, _, _, _ = isect._wt_block(wsa, v0c, e1c, e2c, tmina,
                                            tmaxa)
            hita = hita & real & ((tri_vis & visa) > 0)
            any_hit = jnp.maximum(any_hit, jnp.where(hita, 1.0, 0.0))
        blk = jnp.maximum(blk, any_hit)

        # retire the processed column from BOTH queues; cull closest
        # entries behind the tightened best
        colpick = eq
        entc = entc_ref[:]
        cullc = colpick | (unpack(entc)
                           >= jnp.minimum(bt, INF).reshape(1, tile))
        entc_ref[:] = jnp.where(cullc, sent, entc)
        enta = enta_ref[:]
        enta_ref[:] = jnp.where(colpick, sent, enta)
        mc2 = jnp.min(entc_ref[:], axis=0).reshape(s, LANE)
        ma2 = jnp.min(enta_ref[:], axis=0).reshape(s, LANE)
        ec2, ea2 = heads(mc2, ma2, bt, blk)
        return (bt, bp, bu, bv, bo, blk, ec2, ea2,
                alive_of(mc2, ma2, bt, blk), it + 1)

    out = jax.lax.while_loop(cond, body, carry0)
    t_ref[:] = out[0].reshape(tile)
    prim_ref[:] = out[1].reshape(tile)
    u_ref[:] = out[2].reshape(tile)
    v_ref[:] = out[3].reshape(tile)
    obj_ref[:] = out[4].reshape(tile)
    blk_ref[:] = (out[5] > 0.5).astype(jnp.int32).reshape(tile)


@functools.partial(
    jax.jit, static_argnames=("cluster_tris", "has_instances",
                              "has_motion", "tile", "interpret"))
def intersect_clusters_onehot_dual(oh_cbounds, th, tm, tl, cluster_tris,
                                   o_c, d_c, tmin_c, tmax_c, vis_c,
                                   o_a, d_a, tmin_a, tmax_a, vis_a,
                                   has_instances=False, time=None,
                                   has_motion=False, tile=None,
                                   interpret=False):
    """Union one-hot walk: per lane, a CLOSEST-hit ray and an ANY-hit
    ray traversed together over one cluster-fetch stream (see
    _onehot_dual_kernel). Returns (closest hit dict, blocked (N,) bool).

    An empty window (tmax < tmin) disables that ray for the lane — the
    integrator uses this for dead lanes and NEE-less bounces."""
    c_pad = oh_cbounds.shape[0]
    w_pad = th.shape[0]
    if tile is None:
        tile = choose_tile(c_pad, w_pad, dual=True)
    n = o_c.shape[0]
    pad = (-n) % tile
    if pad:
        def padv(x, cv=0.0):
            return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                           constant_values=cv)
        o_c, d_c = padv(o_c), padv(d_c, 1.0)
        o_a, d_a = padv(o_a), padv(d_a, 1.0)
        tmin_c, tmax_c = padv(tmin_c), padv(tmax_c, -1.0)
        tmin_a, tmax_a = padv(tmin_a), padv(tmax_a, -1.0)
        vis_c, vis_a = padv(vis_c), padv(vis_a)
        if time is not None:
            time = padv(time)
    np_ = n + pad
    ntiles = np_ // tile
    if time is None:
        time = jnp.zeros((np_,), jnp.float32)

    kern = functools.partial(_onehot_dual_kernel, int(cluster_tris),
                             bool(has_instances), bool(has_motion),
                             int(c_pad), int(tile))
    lane_spec = pl.BlockSpec((tile,), lambda i: (i,),
                             memory_space=pltpu.VMEM)
    soa_spec = pl.BlockSpec((3, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    t, prim, u, v, obj, blk = pl.pallas_call(
        kern,
        grid=(ntiles,),
        in_specs=[full_spec, full_spec, full_spec, full_spec,
                  soa_spec, soa_spec, lane_spec, lane_spec, lane_spec,
                  soa_spec, soa_spec, lane_spec, lane_spec, lane_spec,
                  lane_spec],
        out_specs=[lane_spec] * 6,
        out_shape=[
            jax.ShapeDtypeStruct((np_,), jnp.float32),
            jax.ShapeDtypeStruct((np_,), jnp.int32),
            jax.ShapeDtypeStruct((np_,), jnp.float32),
            jax.ShapeDtypeStruct((np_,), jnp.float32),
            jax.ShapeDtypeStruct((np_,), jnp.int32),
            jax.ShapeDtypeStruct((np_,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c_pad, tile), jnp.int32),
            pltpu.VMEM((c_pad, tile), jnp.int32),
        ],
        interpret=interpret,
    )(oh_cbounds, th, tm, tl,
      o_c.T.reshape(3, np_), d_c.T.reshape(3, np_), tmin_c, tmax_c,
      vis_c.astype(jnp.int32),
      o_a.T.reshape(3, np_), d_a.T.reshape(3, np_), tmin_a, tmax_a,
      vis_a.astype(jnp.int32), time)

    hit = prim >= 0
    return ({"t": jnp.where(hit[:n], t[:n],
                            jnp.minimum(tmax_c[:n], RAY_TMAX)),
             "prim": jnp.where(hit[:n], prim[:n], -1),
             "u": u[:n], "v": v[:n],
             "object": jnp.where(hit[:n], obj[:n], -1)},
            blk[:n] > 0)


@functools.partial(
    jax.jit, static_argnames=("cluster_tris", "shadow_any_hit",
                              "has_instances", "has_motion", "tile",
                              "interpret"))
def intersect_clusters_onehot(oh_cbounds, th, tm, tl, cluster_tris,
                              o, d, tmin, tmax, visibility,
                              shadow_any_hit=False, has_instances=False,
                              time=None, has_motion=False, tile=None,
                              interpret=False):
    """Whole-wavefront per-lane one-hot traversal as one Pallas dispatch.

    oh_cbounds (C_pad, 6) f32 and th/tm/tl (W_pad, C_pad) bf16 come
    from pack_onehot_tables (sync-time padding — ADVICE r03 #2). Same
    contract/returns as cluster_intersect.intersect_clusters.
    """
    c_pad = oh_cbounds.shape[0]
    w_pad = th.shape[0]
    if tile is None:
        tile = choose_tile(c_pad, w_pad)
    n = o.shape[0]
    pad = (-n) % tile
    if pad:
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        tmin = jnp.pad(tmin, (0, pad))
        tmax = jnp.pad(tmax, (0, pad), constant_values=-1.0)
        visibility = jnp.pad(visibility, (0, pad))
        if time is not None:
            time = jnp.pad(time, (0, pad))
    np_ = n + pad
    ntiles = np_ // tile
    if time is None:
        time = jnp.zeros((np_,), jnp.float32)

    o_soa = o.T.reshape(3, np_)
    d_soa = d.T.reshape(3, np_)

    kern = functools.partial(_onehot_kernel, int(cluster_tris),
                             bool(has_instances), bool(shadow_any_hit),
                             bool(has_motion), int(c_pad), int(tile))
    lane_spec = pl.BlockSpec((tile,), lambda i: (i,),
                             memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    t, prim, u, v, obj = pl.pallas_call(
        kern,
        grid=(ntiles,),
        in_specs=[
            full_spec,                               # cbounds (padded)
            full_spec, full_spec, full_spec,         # bf16 table thirds
            pl.BlockSpec((3, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),   # o
            pl.BlockSpec((3, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),   # d
            lane_spec,                               # tmin
            lane_spec,                               # tmax
            lane_spec,                               # visibility
            lane_spec,                               # time
        ],
        out_specs=[lane_spec] * 5,
        out_shape=[
            jax.ShapeDtypeStruct((np_,), jnp.float32),
            jax.ShapeDtypeStruct((np_,), jnp.int32),
            jax.ShapeDtypeStruct((np_,), jnp.float32),
            jax.ShapeDtypeStruct((np_,), jnp.float32),
            jax.ShapeDtypeStruct((np_,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c_pad, tile), jnp.int32),    # packed entries
        ],
        interpret=interpret,
    )(oh_cbounds, th, tm, tl, o_soa, d_soa, tmin, tmax,
      visibility.astype(jnp.int32), time)

    hit = prim >= 0
    return {"t": jnp.where(hit[:n], t[:n],
                           jnp.minimum(tmax[:n], RAY_TMAX)),
            "prim": jnp.where(hit[:n], prim[:n], -1),
            "u": u[:n], "v": v[:n],
            "object": jnp.where(hit[:n], obj[:n], -1)}

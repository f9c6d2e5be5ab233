"""Pallas TPU kernel for dense ray/triangle intersection
(ref: the CUDA megakernel's intersection inner loop,
kernel/geom/geom_triangle_intersect.h — rebuilt as a Mosaic kernel).

Design (see ops/intersect.py for the layout rationale):
- grid over RAY TILES: each program instance owns a (8, LANE) tile of
  rays whose origin/direction components and best-hit state live in
  VMEM for the whole kernel — no HBM round-trips between triangle
  blocks (the XLA scan fallback re-materializes carries per step).
- triangles stream through VMEM in (B, 9) packets; every packet is a
  fully unrolled tri-major Möller–Trumbore over the whole tile on the
  VPU (identical math to ops/intersect.py, bit-compatible).
- winner tracking via select-reductions (min over the triangle axis).

This kernel is the scaffold for the round-2 VMEM-resident BVH
traversal; today it accelerates the dense path that serves scenes below
the measured gather crossover (~16k prims).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracingproject_tpu.utils.math import RAY_TMAX

LANE = 128
SUBLANE = 8
TILE = SUBLANE * LANE          # rays per program instance
TRI_BLOCK = 8                  # triangles per unrolled packet


def _mt_block(v0, e1, e2, ox, oy, oz, dx, dy, dz, tmin, t_best):
    """One triangle packet vs the ray tile. All ray arrays (8, LANE);
    v0/e1/e2 are (TRI_BLOCK, 3) scalars read from VMEM."""
    t_blk = jnp.full_like(t_best, RAY_TMAX)
    k_blk = jnp.zeros_like(t_best, dtype=jnp.int32)
    u_blk = jnp.zeros_like(t_best)
    v_blk = jnp.zeros_like(t_best)
    for k in range(TRI_BLOCK):
        e1x, e1y, e1z = e1[k, 0], e1[k, 1], e1[k, 2]
        e2x, e2y, e2z = e2[k, 0], e2[k, 1], e2[k, 2]
        v0x, v0y, v0z = v0[k, 0], v0[k, 1], v0[k, 2]
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv = jnp.where(jnp.abs(det) > 1e-12,
                        1.0 / jnp.where(det == 0, 1.0, det), 0.0)
        tx = ox - v0x
        ty = oy - v0y
        tz = oz - v0z
        u = (tx * px + ty * py + tz * pz) * inv
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv
        t = (e2x * qx + e2y * qy + e2z * qz) * inv
        hit = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (u <= 1.0)
               & (v >= 0.0) & (u + v <= 1.0)
               & (t > tmin) & (t < t_best))
        closer = hit & (t < t_blk)
        t_blk = jnp.where(closer, t, t_blk)
        k_blk = jnp.where(closer, k, k_blk)
        u_blk = jnp.where(closer, u, u_blk)
        v_blk = jnp.where(closer, v, v_blk)
    return t_blk, k_blk, u_blk, v_blk


def _intersect_kernel(nblocks_ref, v0_ref, e1_ref, e2_ref,
                      o_ref, d_ref, tmin_ref,
                      t_ref, prim_ref, u_ref, v_ref):
    """One ray tile vs all triangle packets."""
    ox = o_ref[0].reshape(SUBLANE, LANE)
    oy = o_ref[1].reshape(SUBLANE, LANE)
    oz = o_ref[2].reshape(SUBLANE, LANE)
    dx = d_ref[0].reshape(SUBLANE, LANE)
    dy = d_ref[1].reshape(SUBLANE, LANE)
    dz = d_ref[2].reshape(SUBLANE, LANE)
    tmin = tmin_ref[:].reshape(SUBLANE, LANE)

    def body(blk, carry):
        t_best, prim_best, u_best, v_best = carry
        v0 = v0_ref[blk]      # (TRI_BLOCK, 3)
        e1 = e1_ref[blk]
        e2 = e2_ref[blk]
        t_blk, k_blk, u_blk, v_blk = _mt_block(
            v0, e1, e2, ox, oy, oz, dx, dy, dz, tmin, t_best)
        better = t_blk < t_best
        t_best = jnp.where(better, t_blk, t_best)
        prim_best = jnp.where(better, blk * TRI_BLOCK + k_blk, prim_best)
        u_best = jnp.where(better, u_blk, u_best)
        v_best = jnp.where(better, v_blk, v_best)
        return t_best, prim_best, u_best, v_best

    init = (jnp.full((SUBLANE, LANE), RAY_TMAX, jnp.float32),
            jnp.full((SUBLANE, LANE), -1, jnp.int32),
            jnp.zeros((SUBLANE, LANE), jnp.float32),
            jnp.zeros((SUBLANE, LANE), jnp.float32))
    t, prim, u, v = jax.lax.fori_loop(0, nblocks_ref[0], body, init)
    t_ref[:] = t.reshape(TILE)
    prim_ref[:] = prim.reshape(TILE)
    u_ref[:] = u.reshape(TILE)
    v_ref[:] = v.reshape(TILE)


@functools.partial(jax.jit, static_argnames=("interpret",))
def intersect_brute_pallas(tri_v0, tri_e1, tri_e2, o, d, tmin, tmax,
                           interpret=False):
    """Dense closest-hit intersection as a Pallas kernel.

    tri_v0/e1/e2: (nb, TRI_BLOCK, 3) float32 packets (pad with
    degenerate tris); o, d: (N, 3); tmin/tmax: (N,). N must be a
    multiple of TILE (caller pads). Returns dict(t, prim, u, v) with
    prim = -1 for misses (t left at tmax sentinel semantics of the
    caller)."""
    n = o.shape[0]
    assert n % TILE == 0, f"ray count {n} must be a multiple of {TILE}"
    ntiles = n // TILE
    nb = tri_v0.shape[0]
    nblocks = jnp.full((1,), nb, jnp.int32)

    # component-SoA ray layout: (3, N)
    o_soa = o.T.reshape(3, n)
    d_soa = d.T.reshape(3, n)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # v0 (whole table)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # e1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # e2
            pl.BlockSpec((3, TILE), lambda i, nbr: (0, i),
                         memory_space=pltpu.VMEM),  # o
            pl.BlockSpec((3, TILE), lambda i, nbr: (0, i),
                         memory_space=pltpu.VMEM),  # d
            pl.BlockSpec((TILE,), lambda i, nbr: (i,),
                         memory_space=pltpu.VMEM),  # tmin
        ],
        out_specs=[
            pl.BlockSpec((TILE,), lambda i, nbr: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE,), lambda i, nbr: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE,), lambda i, nbr: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE,), lambda i, nbr: (i,),
                         memory_space=pltpu.VMEM),
        ],
    )
    t, prim, u, v = pl.pallas_call(
        _intersect_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n,), jnp.float32),
            jax.ShapeDtypeStruct((n,), jnp.int32),
            jax.ShapeDtypeStruct((n,), jnp.float32),
            jax.ShapeDtypeStruct((n,), jnp.float32),
        ],
        interpret=interpret,
    )(nblocks, tri_v0, tri_e1, tri_e2, o_soa, d_soa, tmin)
    hit = t < jnp.minimum(tmax, RAY_TMAX)
    return {"t": jnp.where(hit, t, jnp.minimum(tmax, RAY_TMAX)),
            "prim": jnp.where(hit, prim, -1),
            "u": u, "v": v}

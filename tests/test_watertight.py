"""Watertight-intersection leak regression (ref:
util/util_math_intersect.h:88 ray_triangle_intersect — the shear-basis
watertight test). Rays aimed at SHARED EDGES and SHARED VERTICES of
adjacent triangles must never fall through the crack between them: the
watertight formulation evaluates the identical 2D edge function (exact
IEEE negation) on both sides, so at least one triangle reports the hit.
Checked on all four traversal paths (brute / BVH / packed / cluster),
which must also stay exact twins of each other and of the NumPy golden
(bvh/build.py _wt_intersect_np)."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracingproject_tpu.bvh import build as bvh_build
from raytracingproject_tpu.bvh import clusters as cl_mod
from raytracingproject_tpu.ops import intersect as isect
from raytracingproject_tpu.ops import cluster_intersect as ci


def _rot(a, b, c):
    ca, sa = np.cos(a), np.sin(a)
    cb, sb = np.cos(b), np.sin(b)
    cc, sc = np.cos(c), np.sin(c)
    rx = np.array([[1, 0, 0], [0, ca, -sa], [0, sa, ca]])
    ry = np.array([[cb, 0, sb], [0, 1, 0], [-sb, 0, cb]])
    rz = np.array([[cc, -sc, 0], [sc, cc, 0], [0, 0, 1]])
    return (rz @ ry @ rx).astype(np.float64)


def _quad_scene(offset, angles):
    """A unit quad split along its diagonal into two edge-sharing
    triangles, rotated by an awkward angle and pushed far from the
    origin (big coordinates = big ulps; see CLAUDE.md epsilon notes)."""
    corners = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                       np.float64)
    r = _rot(*angles)
    world = (corners - 0.5) @ r.T + np.asarray(offset, np.float64)
    tris = np.stack([world[[0, 1, 2]], world[[0, 2, 3]]])
    return tris.astype(np.float32), world.astype(np.float32)


def _edge_rays(world32, nray, seed):
    """Rays aimed at points strictly inside the shared diagonal
    (v0..v2), from randomized off-plane origins."""
    rng = np.random.default_rng(seed)
    s = rng.uniform(0.05, 0.95, nray)
    target = world32[0][None] * (1 - s[:, None]) + world32[2][None] * s[:, None]
    o = target + rng.normal(size=(nray, 3)) * 3.0 \
        + np.array([0.0, 0.0, 5.0])
    d = target - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o.astype(np.float32), d.astype(np.float32)


def _all_paths(tris, o, d):
    n = len(o)
    tv = jnp.asarray(tris)
    po = jnp.zeros(len(tris), jnp.int32)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    t0 = jnp.zeros(n, jnp.float32)
    t1 = jnp.full((n,), 1e30, jnp.float32)
    out = {}
    out["brute"] = isect.intersect_brute(tv, po, oj, dj, t0, t1)
    bvh = bvh_build.build_bvh(tris.min(1), tris.max(1))
    ordered = tris[bvh.prim_order]
    out["bvh"] = isect.intersect_bvh(
        jnp.asarray(bvh.bounds), jnp.asarray(bvh.children),
        jnp.asarray(ordered), po, oj, dj, t0, t1)
    nodes, leaves = isect.pack_traversal_tables(
        bvh.bounds, bvh.children, ordered)
    out["packed"] = isect.intersect_bvh_packed(
        jnp.asarray(nodes), jnp.asarray(leaves), oj, dj, t0, t1,
        prim_object=po)
    cuts = cl_mod.cut_clusters(bvh.children, 32)
    cd = []
    for (st, c) in cuts:
        verts = ordered[st:st + c]
        cd.append({"verts": verts, "prim": np.arange(st, st + c),
                   "obj": np.zeros(c, np.int32),
                   "vis": np.full(c, 0x1FF, np.float32),
                   "lo": verts.reshape(-1, 3).min(0),
                   "hi": verts.reshape(-1, 3).max(0), "w2o": None})
    cb, ctab, ct = ci.pack_cluster_table(cd)[:3]
    out["cluster"] = ci.intersect_clusters(
        jnp.asarray(cb), jnp.asarray(ctab), ct, oj, dj, t0, t1)
    # map bvh-order prim ids back to input order for comparison
    inv = {"bvh": bvh.prim_order, "packed": bvh.prim_order,
           "cluster": bvh.prim_order}
    res = {}
    for k, h in out.items():
        prim = np.asarray(h["prim"])
        if k in inv:
            prim = np.where(prim >= 0, inv[k][np.maximum(prim, 0)], -1)
        res[k] = (prim, np.asarray(h["t"]))
    return res


class TestWatertight:
    def test_shared_edge_no_leak_all_paths(self):
        for i, (offset, ang) in enumerate([
                ((0.0, 0.0, 0.0), (0.0, 0.0, 0.0)),
                ((500.0, -300.0, 200.0), (0.7, 1.3, 2.1)),
                ((-77.7, 123.4, 512.0), (2.9, 0.4, 1.1))]):
            tris, world = _quad_scene(offset, ang)
            o, d = _edge_rays(world, 512, seed=10 + i)
            res = _all_paths(tris, o, d)
            for name, (prim, _t) in res.items():
                misses = int((prim < 0).sum())
                assert misses == 0, \
                    f"{name}: {misses}/512 edge rays leaked (case {i})"
            # On edge-tie rays both triangles are legitimate winners
            # (t equal to within ulps), so paths may disagree on prim —
            # but the winning DISTANCE must agree across all paths.
            # (loose rtol: origins can land near the quad plane, and
            # grazing incidence amplifies rounding into t)
            base_prim, base_t = res["brute"]
            for name, (prim, t) in res.items():
                np.testing.assert_allclose(t, base_t, rtol=5e-3,
                                           err_msg=f"{name} vs brute")

    def test_shared_vertex_fan_no_leak(self):
        # 8-triangle fan around a central vertex at a nasty coordinate;
        # rays straight through the center must hit SOME triangle
        center = np.array([333.33, -512.7, 99.9], np.float64)
        rng = np.random.default_rng(42)
        r = _rot(0.5, 1.1, 2.3)
        ring = []
        for k in range(8):
            a = 2 * np.pi * k / 8
            ring.append(center + (r @ np.array(
                [np.cos(a), np.sin(a), 0.0])))
        tris = np.stack([
            np.stack([center, ring[k], ring[(k + 1) % 8]])
            for k in range(8)]).astype(np.float32)
        n = 256
        o = (center[None] + rng.normal(size=(n, 3)) * 4.0
             + (r @ [0, 0, 6.0])[None]).astype(np.float32)
        d = tris[0, 0][None] - o  # aim exactly at the shared vertex
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        res = _all_paths(tris, o.astype(np.float32), d.astype(np.float32))
        for name, (prim, _t) in res.items():
            misses = int((prim < 0).sum())
            assert misses == 0, f"{name}: {misses}/{n} vertex rays leaked"

    def test_numpy_golden_matches_device(self):
        # the f32 NumPy twin must agree with the device kernel bit-level
        tris, world = _quad_scene((3.0, -2.0, 7.0), (0.3, 0.9, 1.7))
        o, d = _edge_rays(world, 128, seed=77)
        hit, t, u, v = isect.ray_triangle_intersect(
            jnp.asarray(tris[:, 0])[None], jnp.asarray(tris[:, 1])[None],
            jnp.asarray(tris[:, 2])[None],
            jnp.asarray(o)[:, None], jnp.asarray(d)[:, None],
            jnp.zeros((128, 1)), jnp.full((128, 1), 1e30))
        hit = np.asarray(hit)
        t = np.asarray(t)
        for i in range(128):
            for k in range(2):
                tn, un, vn = bvh_build._wt_intersect_np(tris[k], o[i], d[i])
                np_hit = tn is not None and tn > 0
                assert bool(hit[i, k]) == np_hit, (i, k)
                if np_hit:
                    np.testing.assert_allclose(t[i, k], tn, rtol=1e-6)

"""Cluster-shortlist traversal parity (ops/cluster_intersect.py vs the
dense and packed-walk kernels — bit-exact by construction, same MT
formulation; ref traversal being replaced: kernel/bvh/bvh_traversal.h)."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracingproject_tpu.bvh import build as bvh_build
from raytracingproject_tpu.bvh import clusters as cl_mod
from raytracingproject_tpu.ops import intersect as isect
from raytracingproject_tpu.ops import cluster_intersect as ci
from raytracingproject_tpu.app import examples
from raytracingproject_tpu.ops import integrator as integ


def _soup(p, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-5, 5, (p, 3)).astype(np.float32)
    tri = (c[:, None] + rng.uniform(-0.4, 0.4, (p, 3, 3))).astype(np.float32)
    bvh = bvh_build.build_bvh(tri.min(1), tri.max(1))
    return tri[bvh.prim_order], bvh


def _tables(tv, bvh, ct_size=32):
    cuts = cl_mod.cut_clusters(bvh.children, ct_size)
    cd = []
    for (s, c) in cuts:
        verts = tv[s:s + c]
        cd.append({"verts": verts, "prim": np.arange(s, s + c),
                   "obj": np.zeros(c, np.int32),
                   "vis": np.full(c, 0x1FF, np.float32),
                   "lo": verts.reshape(-1, 3).min(0),
                   "hi": verts.reshape(-1, 3).max(0), "w2o": None})
    return ci.pack_cluster_table(cd)[:3]


def _rays(n, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (jnp.asarray(o), jnp.asarray(d),
            jnp.full((n,), 1e-4, jnp.float32),
            jnp.full((n,), 1e30, jnp.float32),
            jnp.full((n,), 1, jnp.uint32))


class TestClusterParity:
    def test_cut_covers_all_prims(self):
        tv, bvh = _soup(777)
        cuts = cl_mod.cut_clusters(bvh.children, 32)
        assert sum(c for _, c in cuts) == 777
        assert max(c for _, c in cuts) <= 32

    def test_closest_hit_matches_brute(self):
        tv, bvh = _soup(2000)
        cb, ctab, ct = _tables(tv, bvh)
        o, d, tmin, tmax, vis = _rays(2048)
        po = jnp.zeros(len(tv), jnp.int32)
        ovis = jnp.full(1, 0x1FF, jnp.uint32)
        hb = isect.intersect_brute(jnp.asarray(tv), po, o, d, tmin, tmax,
                                   visibility=vis, object_visibility=ovis)
        hc = ci.intersect_clusters(jnp.asarray(cb), jnp.asarray(ctab), ct,
                                   o, d, tmin, tmax, visibility=vis)
        # winner prims must agree exactly; t/u only to FMA rounding
        # (XLA fuses the differently-shaped kernels differently)
        np.testing.assert_array_equal(np.asarray(hb["prim"]),
                                      np.asarray(hc["prim"]))
        np.testing.assert_allclose(np.asarray(hb["t"]),
                                   np.asarray(hc["t"]), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(hb["u"]),
                                   np.asarray(hc["u"]),
                                   rtol=1e-4, atol=1e-5)

    def test_anyhit_matches(self):
        tv, bvh = _soup(1200, seed=3)
        cb, ctab, ct = _tables(tv, bvh)
        o, d, tmin, tmax, vis = _rays(1024, seed=4)
        po = jnp.zeros(len(tv), jnp.int32)
        ovis = jnp.full(1, 0x1FF, jnp.uint32)
        hb = isect.intersect_brute(jnp.asarray(tv), po, o, d, tmin, tmax,
                                   visibility=vis, object_visibility=ovis)
        hs = ci.intersect_clusters(jnp.asarray(cb), jnp.asarray(ctab), ct,
                                   o, d, tmin, tmax, visibility=vis,
                                   shadow_any_hit=True)
        np.testing.assert_array_equal(np.asarray(hb["prim"]) >= 0,
                                      np.asarray(hs["prim"]) >= 0)

    def test_chunked_equals_unchunked(self):
        tv, bvh = _soup(900, seed=5)
        cb, ctab, ct = _tables(tv, bvh)
        o, d, tmin, tmax, vis = _rays(700, seed=6)
        a = ci.intersect_clusters(jnp.asarray(cb), jnp.asarray(ctab), ct,
                                  o, d, tmin, tmax, visibility=vis,
                                  chunk=256)
        b = ci.intersect_clusters(jnp.asarray(cb), jnp.asarray(ctab), ct,
                                  o, d, tmin, tmax, visibility=vis)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]),
                                          np.asarray(b[k]))


def _render(scene, w, h, spp, strip_clusters=False):
    scene.device_update()
    kg = scene.make_kernel_globals()
    if strip_clusters:
        kg["dscene"] = {k: v for k, v in kg["dscene"].items()
                        if not k.startswith("cluster")}
        kg["cluster_tris"] = 0
    yy, xx = np.mgrid[0:h, 0:w]
    px = jnp.asarray(xx.reshape(-1), jnp.int32)
    py = jnp.asarray(yy.reshape(-1), jnp.int32)
    L, A = jax.jit(lambda a, b, c: integ.render_samples(
        kg, a, b, c, 0, spp))(px, py, py * w + px)
    return np.asarray(L) / spp


class TestClusterRenderParity:
    def test_instanced_scene_matches_packed(self):
        """TLAS/BLAS scene via clusters == packed-walk render (same hit
        prims; positions to FMA rounding)."""
        a = _render(examples.instanced_scene(24, 24, spp=3, grid=2),
                    24, 24, 3)
        b = _render(examples.instanced_scene(24, 24, spp=3, grid=2),
                    24, 24, 3, strip_clusters=True)
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    def test_cluster_tables_built_for_instanced(self):
        scene = examples.instanced_scene(16, 16, spp=1, grid=2)
        scene.device_update()
        kg = scene.make_kernel_globals()
        assert "cluster_bounds" in kg["dscene"]
        assert int(kg["cluster_tris"]) > 0

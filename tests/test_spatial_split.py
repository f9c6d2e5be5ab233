"""Spatial-split BVH builder (ref: bvh/bvh_split.cpp BVHSpatialSplit,
gate bvh_build.cpp:390). Duplicated clipped references must change the
TREE only — every ray still finds the same (prim, t)."""

import numpy as np
import jax.numpy as jnp

from raytracingproject_tpu.bvh import build as bb


def _rand_tris(n, seed, elongate=0.0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-10, 10, (n, 1, 3))
    edges = rng.normal(size=(n, 2, 3))
    if elongate:
        # long diagonal slivers — the spatial-split payoff case
        edges[:, 0] *= elongate
    v = np.concatenate([base, base + edges[:, :1], base + edges[:, 1:]],
                       axis=1).astype(np.float32)
    return v


class TestClip:
    def test_clip_whole_triangle_inside(self):
        v = np.asarray([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
        lo, hi = bb._clip_tri_slab_bounds(v, 0, -5.0, 5.0)
        np.testing.assert_allclose(lo[0], [0, 0, 0], atol=1e-6)
        np.testing.assert_allclose(hi[0], [1, 1, 0], atol=1e-6)

    def test_clip_half(self):
        v = np.asarray([[[0, 0, 0], [2, 0, 0], [0, 2, 0]]], np.float32)
        lo, hi = bb._clip_tri_slab_bounds(v, 0, 0.0, 1.0)
        # clipped at x=1: polygon (0,0),(1,0),(1,1),(0,2)
        np.testing.assert_allclose(lo[0], [0, 0, 0], atol=1e-6)
        np.testing.assert_allclose(hi[0], [1, 2, 0], atol=1e-6)

    def test_clip_miss(self):
        v = np.asarray([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
        lo, hi = bb._clip_tri_slab_bounds(v, 0, 5.0, 6.0)
        assert (lo[0] > hi[0]).any()


class TestSpatialBuild:
    def _hits_match(self, verts, seed):
        lo = verts.min(1)
        hi = verts.max(1)
        plain = bb.build_bvh(lo, hi, use_native=False)
        spatial = bb.build_bvh_spatial(lo, hi, tri_verts=verts)
        # slivers must actually have produced duplicated references
        rng = np.random.default_rng(seed)
        o = rng.uniform(-15, 15, (64, 3)).astype(np.float32)
        aim = rng.uniform(-8, 8, (64, 3))  # toward the geometry
        d = (aim - o).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        tv_plain = verts[plain.prim_order]
        tv_spatial = verts[spatial.prim_order]
        hits = 0
        for i in range(len(o)):
            tp, pp, _, _ = bb.intersect_ray_np(plain, tv_plain, o[i], d[i])
            ts, ps, _, _ = bb.intersect_ray_np(spatial, tv_spatial,
                                               o[i], d[i])
            assert (pp < 0) == (ps < 0), f"ray {i} hit mask differs"
            if pp >= 0:
                hits += 1
                # same source primitive and same distance
                assert plain.prim_order[pp] == spatial.prim_order[ps], \
                    f"ray {i} prim differs"
                np.testing.assert_allclose(tp, ts, rtol=1e-6)
        return spatial, hits

    def test_slivers_duplicate_and_match(self):
        verts = _rand_tris(256, 3, elongate=12.0)
        spatial, hits = self._hits_match(verts, 4)
        assert len(spatial.prim_order) > 256, \
            "long slivers should produce split references"
        assert hits > 4

    def test_compact_tris_match(self):
        verts = _rand_tris(200, 5)
        spatial, hits = self._hits_match(verts, 6)
        assert hits > 4

    def test_duplication_capped(self):
        verts = _rand_tris(128, 7, elongate=30.0)
        lo, hi = verts.min(1), verts.max(1)
        spatial = bb.build_bvh_spatial(lo, hi, tri_verts=verts,
                                       max_dup_factor=1.5)
        assert len(spatial.prim_order) <= int(1.5 * 128) + 8


class TestSceneLevel:
    def test_spatial_split_render_matches(self):
        from raytracingproject_tpu.app import examples
        from raytracingproject_tpu.ops import integrator as integ
        W = H = 24
        imgs = []
        for flag in (False, True):
            scene = examples.cornell_box(W, H, spp=4, spheres="glossy")
            scene.params.set("bvh_use_spatial_split", flag)
            scene.device_update()
            kg = scene.make_kernel_globals()
            yy, xx = np.mgrid[0:H, 0:W]
            px = jnp.asarray(xx.reshape(-1), jnp.int32)
            py = jnp.asarray(yy.reshape(-1), jnp.int32)
            L, _ = integ.render_samples(kg, px, py, py * W + px,
                                        jnp.uint32(0), 4)
            imgs.append(np.asarray(L).reshape(H, W, 3) / 4)
        assert np.isfinite(imgs[1]).all()
        # same transport, different tree -> same image up to fp noise
        np.testing.assert_allclose(imgs[1], imgs[0], rtol=1e-4, atol=1e-4)

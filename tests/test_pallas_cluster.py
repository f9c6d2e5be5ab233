"""Tile-shared Pallas cluster traversal vs the XLA shortlist path
(ops/pallas_cluster.py vs ops/cluster_intersect.py — same watertight
math, so hits must agree; ref kernel/bvh/bvh_traversal.h:34-229).

Runs the kernel in interpreter mode off-TPU: semantics only; the
compiled path is exercised by the TPU bench."""

import numpy as np
import jax.numpy as jnp
import pytest

from raytracingproject_tpu.app import examples
from raytracingproject_tpu.ops import cluster_intersect as ci
from raytracingproject_tpu.ops import pallas_cluster as pc
from raytracingproject_tpu.models import object as ob


def _cluster_scene(factory="cornell_box", **kw):
    scene = getattr(examples, factory)(64, 64, spp=2, **kw)
    scene.device_update()
    kg = scene.make_kernel_globals()
    ds = kg["dscene"]
    assert "cluster_bounds" in ds, "scene must use the cluster path"
    return kg, ds


def _rand_rays(n, seed, lo=(-300, -300, -300), hi=(900, 900, 900)):
    rng = np.random.default_rng(seed)
    o = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _compare(kg, ds, o, d, shadow=False, seed=0):
    n = o.shape[0]
    tmin = jnp.full((n,), 1e-4, jnp.float32)
    tmax = jnp.full((n,), 1e30, jnp.float32)
    vis = jnp.full((n,), ob.PATH_RAY_CAMERA, jnp.uint32)
    has_inst = bool(kg.get("has_instances", False))
    ref = ci.intersect_clusters(
        ds["cluster_bounds"], ds["cluster_table"],
        int(kg["cluster_tris"]), o, d, tmin, tmax,
        visibility=vis, shadow_any_hit=shadow, has_instances=has_inst)
    got = pc.intersect_clusters_pallas(
        ds["cluster_bounds"], ds["cluster_table"],
        int(kg["cluster_tris"]), o, d, tmin, tmax, vis,
        shadow_any_hit=shadow, has_instances=has_inst, interpret=True)
    ref = {k: np.asarray(v) for k, v in ref.items()}
    got = {k: np.asarray(v) for k, v in got.items()}
    if shadow:
        # any-hit: only blocked-ness is contractual
        np.testing.assert_array_equal(ref["prim"] >= 0, got["prim"] >= 0)
        return ref, got
    np.testing.assert_array_equal(ref["prim"] >= 0, got["prim"] >= 0,
                                  err_msg="hit masks differ")
    np.testing.assert_array_equal(ref["prim"], got["prim"])
    np.testing.assert_array_equal(ref["object"], got["object"])
    # identical watertight math, but the two compilation contexts keep
    # FMA-contraction freedom — t/u/v may drift a few ulps
    np.testing.assert_allclose(ref["t"], got["t"], rtol=1e-5)
    np.testing.assert_allclose(ref["u"], got["u"], atol=1e-5)
    np.testing.assert_allclose(ref["v"], got["v"], atol=1e-5)
    return ref, got


class TestParity:
    def test_glossy_cornell_random_rays(self):
        kg, ds = _cluster_scene(spheres="glossy")
        o, d = _rand_rays(2048, 1)
        ref, _ = _compare(kg, ds, o, d)
        assert (ref["prim"] >= 0).mean() > 0.2  # scene actually hit

    def test_instanced_scene(self):
        kg, ds = _cluster_scene("instanced_scene")
        o, d = _rand_rays(1024, 2, lo=(-20, -20, -20), hi=(20, 20, 20))
        ref, _ = _compare(kg, ds, o, d)
        assert (ref["prim"] >= 0).any()

    def test_shadow_any_hit(self):
        kg, ds = _cluster_scene(spheres="glossy")
        o, d = _rand_rays(1024, 3)
        _compare(kg, ds, o, d, shadow=True)

    def test_nonaligned_lane_count(self):
        kg, ds = _cluster_scene(spheres="glossy")
        o, d = _rand_rays(1000, 4)     # forces padding
        _compare(kg, ds, o, d)

    def test_motion_clusters(self):
        kg, ds = _cluster_scene("dof_motion_scene")
        has_motion = bool(kg.get("cluster_motion", False))
        o, d = _rand_rays(512, 5)
        n = o.shape[0]
        tmin = jnp.full((n,), 1e-4, jnp.float32)
        tmax = jnp.full((n,), 1e30, jnp.float32)
        vis = jnp.full((n,), ob.PATH_RAY_CAMERA, jnp.uint32)
        time = jnp.asarray(
            np.random.default_rng(9).uniform(0, 1, n), jnp.float32)
        ref = ci.intersect_clusters(
            ds["cluster_bounds"], ds["cluster_table"],
            int(kg["cluster_tris"]), o, d, tmin, tmax, visibility=vis,
            has_instances=bool(kg.get("has_instances", False)),
            time=time, has_motion=has_motion)
        got = pc.intersect_clusters_pallas(
            ds["cluster_bounds"], ds["cluster_table"],
            int(kg["cluster_tris"]), o, d, tmin, tmax, vis,
            has_instances=bool(kg.get("has_instances", False)),
            time=time, has_motion=has_motion, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref["t"]),
                                      np.asarray(got["t"]))
        np.testing.assert_array_equal(np.asarray(ref["prim"]),
                                      np.asarray(got["prim"]))


class TestOcclusionDual:
    """Dual-reduction occlusion walk vs the dense sweep
    (ops/pallas_cluster.py occlusion_clusters_pallas vs
    ops/intersect.py intersect_brute_occlusion; ROADMAP 1d)."""

    def _setup(self):
        from raytracingproject_tpu.ops import intersect as isect
        scene = examples.volume_sss_scene(32, 32, spp=2)
        scene.device_update()
        kg = scene.make_kernel_globals()
        ds = kg["dscene"]
        assert "cluster_boundary" in ds
        return kg, ds, isect

    def _dual(self, kg, ds, isect, o, d, tmaxc, tmaxa, seed=0):
        import jax.numpy as jnp
        from raytracingproject_tpu.ops import pallas_cluster as pc2
        n = o.shape[0]
        tmin = jnp.full((n,), 1e-5, jnp.float32)
        ref = isect.intersect_brute_occlusion(
            ds["tri_verts_world"], ds["prim_object_packed"],
            ds["prim_is_boundary"], o, d, tmin,
            tmax_closest=tmaxc, tmax_any=tmaxa,
            visibility_closest=jnp.full((n,), ob.PATH_RAY_CAMERA,
                                        jnp.uint32),
            visibility_any=jnp.full((n,), ob.PATH_RAY_SHADOW,
                                    jnp.uint32),
            object_visibility=ds["object_visibility"])
        got = pc2.occlusion_clusters_pallas(
            ds["cluster_bounds"], ds["cluster_table"],
            ds["cluster_boundary"], int(kg["cluster_tris"]), o, d, tmin,
            tmax_closest=tmaxc, tmax_any=tmaxa,
            vis_closest=int(ob.PATH_RAY_CAMERA),
            vis_any=int(ob.PATH_RAY_SHADOW),
            has_instances=bool(kg.get("has_instances", False)),
            interpret=True)
        return [np.asarray(x) for x in ref], [np.asarray(x) for x in got]

    def test_random_rays_parity(self):
        kg, ds, isect = self._setup()
        o, d = _rand_rays(1024, 11, lo=(-3, -3, -3), hi=(3, 3, 3))
        n = o.shape[0]
        tmaxc = jnp.full((n,), 1e30, jnp.float32)
        tmaxa = jnp.full((n,), 1e30, jnp.float32)
        (rb, ro, rblk), (gb, go, gblk) = self._dual(
            kg, ds, isect, o, d, tmaxc, tmaxa)
        np.testing.assert_array_equal(rblk, gblk)
        # same watertight math; FMA-contraction ulp drift only
        np.testing.assert_allclose(rb, gb, rtol=1e-5)
        np.testing.assert_allclose(ro, go, rtol=1e-5)
        assert (rb < 1e30).any() and (ro < 1e30).any() and rblk.any()

    def test_per_lane_tmax_and_disabled_lanes(self):
        kg, ds, isect = self._setup()
        o, d = _rand_rays(512, 12, lo=(-3, -3, -3), hi=(3, 3, 3))
        n = o.shape[0]
        rng = np.random.default_rng(13)
        # a mix of real ranges and disabled (1e-5) lanes, closest and
        # any-hit ranges differing, exactly as the NEE call site builds
        tmaxc = jnp.asarray(np.where(rng.uniform(size=n) < 0.3, 1e-5,
                                     rng.uniform(0.5, 8.0, n)),
                            jnp.float32)
        tmaxa = jnp.asarray(np.where(rng.uniform(size=n) < 0.3, 1e-5,
                                     rng.uniform(0.5, 8.0, n)),
                            jnp.float32)
        (rb, ro, rblk), (gb, go, gblk) = self._dual(
            kg, ds, isect, o, d, tmaxc, tmaxa)
        np.testing.assert_array_equal(rblk, gblk)
        np.testing.assert_allclose(rb, gb, rtol=1e-5)
        np.testing.assert_allclose(ro, go, rtol=1e-5)

    def test_volume_render_end_to_end_parity(self):
        """Full volume render with the Pallas dual sweep forced vs the
        dense default: images must agree (ulp-level t drift can move
        individual stochastic samples, so compare loosely per pixel
        and tightly in the mean)."""
        import jax
        from raytracingproject_tpu.ops import integrator as integ
        scene = examples.volume_sss_scene(16, 16, spp=4)
        scene.device_update()
        kg = scene.make_kernel_globals()
        yy, xx = np.mgrid[0:16, 0:16]
        px = jnp.asarray(xx.reshape(-1), jnp.int32)
        py = jnp.asarray(yy.reshape(-1), jnp.int32)
        pidx = py * 16 + px

        def render(kg2):
            L, _ = jax.jit(lambda a, b, c: integ.render_samples(
                kg2, a, b, c, 0, 4))(px, py, pidx)
            return np.asarray(L).reshape(16, 16, 3) / 4

        dense = render({**kg, "pallas_occlusion": False})
        pall = render({**kg, "pallas_occlusion": True,
                       "pallas_interpret": True})
        assert np.isfinite(pall).all()
        assert abs(dense.mean() - pall.mean()) < 2e-3 + 0.01 * dense.mean()
        np.testing.assert_allclose(pall, dense, atol=0.02, rtol=0.05)

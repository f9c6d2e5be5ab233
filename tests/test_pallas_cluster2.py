"""Two-level tile-shared cluster traversal (the big-scene walk,
ops/pallas_cluster.py intersect_clusters2_pallas) vs the XLA shortlist
path and brute — same watertight math, hits must agree (ref capability:
kernel/bvh/bvh_traversal.h unbounded walk; VERDICT r2 weak #5).

Interpret mode off-TPU: semantics only; compiled perf is A/B'd on the
chip by tools/cluster2_bench.py / bench.py autotune.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from raytracingproject_tpu.app import examples
from raytracingproject_tpu.bvh import clusters as clm
from raytracingproject_tpu.ops import cluster_intersect as ci
from raytracingproject_tpu.ops import pallas_cluster as pc
from raytracingproject_tpu.models import object as ob


def _cluster_scene(factory="cornell_box", **kw):
    scene = getattr(examples, factory)(64, 64, spp=2, **kw)
    scene.device_update()
    kg = scene.make_kernel_globals()
    ds = kg["dscene"]
    assert "cluster_bounds" in ds
    return kg, ds


def _chunk_groups(cbounds, gmax):
    """Arbitrary consecutive-chunk grouping — valid (bounds are
    conservative unions), just less tight than the tree cut."""
    c = cbounds.shape[0]
    groups = [(k, min(gmax, c - k)) for k in range(0, c, gmax)]
    return jnp.asarray(
        clm.supercluster_bounds(np.asarray(cbounds), groups))


def _rand_rays(n, seed, lo=(-300, -300, -300), hi=(900, 900, 900)):
    rng = np.random.default_rng(seed)
    o = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _compare(kg, ds, o, d, gmax, shadow=False):
    n = o.shape[0]
    tmin = jnp.full((n,), 1e-4, jnp.float32)
    tmax = jnp.full((n,), 1e30, jnp.float32)
    vis = jnp.full((n,), ob.PATH_RAY_CAMERA, jnp.uint32)
    has_inst = bool(kg.get("has_instances", False))
    scb = _chunk_groups(ds["cluster_bounds"], gmax)
    ref = ci.intersect_clusters(
        ds["cluster_bounds"], ds["cluster_table"],
        int(kg["cluster_tris"]), o, d, tmin, tmax,
        visibility=vis, shadow_any_hit=shadow, has_instances=has_inst)
    got = pc.intersect_clusters2_pallas(
        scb, ds["cluster_bounds"], ds["cluster_table"],
        int(kg["cluster_tris"]), gmax, o, d, tmin, tmax, vis,
        shadow_any_hit=shadow, has_instances=has_inst, interpret=True)
    ref = {k: np.asarray(v) for k, v in ref.items()}
    got = {k: np.asarray(v) for k, v in got.items()}
    if shadow:
        np.testing.assert_array_equal(ref["prim"] >= 0, got["prim"] >= 0)
        return ref, got
    np.testing.assert_array_equal(ref["prim"] >= 0, got["prim"] >= 0,
                                  err_msg="hit masks differ")
    np.testing.assert_array_equal(ref["prim"], got["prim"])
    np.testing.assert_array_equal(ref["object"], got["object"])
    np.testing.assert_allclose(ref["t"], got["t"], rtol=1e-5)
    np.testing.assert_allclose(ref["u"], got["u"], atol=1e-5)
    np.testing.assert_allclose(ref["v"], got["v"], atol=1e-5)
    return ref, got


class TestGrouping:
    def test_group_superclusters_nests_tree_cuts(self):
        """Cuts of the same tree at fine/coarse budgets nest; groups
        cover every cluster once, each <= gmax."""
        from raytracingproject_tpu.bvh import build as bvh_build
        rng = np.random.default_rng(7)
        tv = rng.uniform(-5, 5, (3000, 3, 3)).astype(np.float32)
        tv[:, 1] = tv[:, 0] + rng.uniform(-0.1, 0.1, (3000, 3))
        tv[:, 2] = tv[:, 0] + rng.uniform(-0.1, 0.1, (3000, 3))
        b = bvh_build.build_bvh(tv.min(1), tv.max(1))
        fine = clm.cut_clusters(b.children, 16)
        coarse = clm.cut_clusters(b.children, 256)
        groups = clm.group_superclusters(fine, coarse, gmax=8)
        assert all(gc <= 8 for _, gc in groups)
        covered = sorted(
            i for cs, gc in groups for i in range(cs, cs + gc))
        assert covered == list(range(len(fine)))


class TestParity:
    def test_glossy_cornell(self):
        kg, ds = _cluster_scene(spheres="glossy")
        o, d = _rand_rays(2048, 1)
        ref, _ = _compare(kg, ds, o, d, gmax=8)
        assert (ref["prim"] >= 0).mean() > 0.2

    def test_single_group_degenerates_to_level1(self):
        kg, ds = _cluster_scene(spheres="glossy")
        c = int(ds["cluster_bounds"].shape[0])
        o, d = _rand_rays(1024, 2)
        _compare(kg, ds, o, d, gmax=c)

    def test_instanced_scene(self):
        kg, ds = _cluster_scene("instanced_scene")
        o, d = _rand_rays(1024, 3, lo=(-20, -20, -20), hi=(20, 20, 20))
        ref, _ = _compare(kg, ds, o, d, gmax=4)
        assert (ref["prim"] >= 0).any()

    def test_shadow_any_hit(self):
        kg, ds = _cluster_scene(spheres="glossy")
        o, d = _rand_rays(1024, 4)
        _compare(kg, ds, o, d, gmax=8, shadow=True)

    def test_nonaligned_lane_count(self):
        kg, ds = _cluster_scene(spheres="glossy")
        o, d = _rand_rays(1000, 5)
        _compare(kg, ds, o, d, gmax=8)


class TestSceneIntegration:
    """Scene packing + integrator dispatch for the two-level path:
    force it by shrinking the single-level cap, then check the packed
    tables and hit parity against the packed-BVH fallback twin."""

    def _two_level_scene(self, monkeypatch, factory="cornell_box", **kw):
        from raytracingproject_tpu.models import scene as scene_mod
        monkeypatch.setattr(scene_mod, "CLUSTER_MAX_SINGLE_LEVEL", 2)
        monkeypatch.setattr(scene_mod, "CLUSTER2_GROUP_TARGET", 8)
        scene = getattr(examples, factory)(32, 32, spp=2, **kw)
        scene.device_update()
        kg = scene.make_kernel_globals()
        return kg, kg["dscene"]

    def test_packs_sc_bounds(self, monkeypatch):
        kg, ds = self._two_level_scene(monkeypatch, spheres="glossy")
        assert "sc_bounds" in ds
        scb = np.asarray(ds["sc_bounds"])
        assert scb.shape[1] == 8
        assert int(kg["sc_gmax"]) >= 8
        # groups cover every cluster exactly once
        c = int(ds["cluster_bounds"].shape[0])
        covered = sorted(
            i for row in scb
            for i in range(int(row[6]), int(row[6]) + int(row[7])))
        assert covered == list(range(c))
        # union bounds contain their members
        cb = np.asarray(ds["cluster_bounds"])
        for row in scb:
            cs, gc = int(row[6]), int(row[7])
            assert (row[0:3] <= cb[cs:cs + gc, 0:3].min(0) + 1e-6).all()
            assert (row[3:6] >= cb[cs:cs + gc, 3:6].max(0) - 1e-6).all()

    def test_dispatch_parity_vs_packed(self, monkeypatch):
        from raytracingproject_tpu.ops import integrator as integ
        kg, ds = self._two_level_scene(monkeypatch, spheres="glossy")
        o, d = _rand_rays(512, 21)
        n = o.shape[0]
        tmin = jnp.full((n,), 1e-4, jnp.float32)
        tmax = jnp.full((n,), 1e30, jnp.float32)
        vis = jnp.full((n,), ob.PATH_RAY_CAMERA, jnp.uint32)
        kg2 = {**kg, "use_brute": False, "pallas_clusters2": True,
               "pallas_interpret": True}
        got = integ._scene_intersect_tris(kg2, o, d, tmin, tmax, vis)
        kgp = {**kg, "use_brute": False, "pallas_clusters2": False}
        ref = integ._scene_intersect_tris(kgp, o, d, tmin, tmax, vis)
        np.testing.assert_array_equal(np.asarray(ref["prim"]),
                                      np.asarray(got["prim"]))
        np.testing.assert_allclose(np.asarray(ref["t"]),
                                   np.asarray(got["t"]), rtol=1e-5)
        assert (np.asarray(ref["prim"]) >= 0).mean() > 0.2

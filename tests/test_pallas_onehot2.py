"""Two-level one-hot traversal (ops/pallas_onehot.py
intersect_clusters2_onehot) vs the XLA shortlist walk — same watertight
math, hits must agree (round-5 verdict item 6; ref capability:
two-level pack_instances, bvh/bvh.h:117).

Interpret mode off-TPU: semantics only; perf is A/B'd in-context by
bench.py autotune on big_instanced."""

import numpy as np
import jax.numpy as jnp

from raytracingproject_tpu.app import examples
from raytracingproject_tpu.bvh import clusters as clm
from raytracingproject_tpu.ops import cluster_intersect as ci
from raytracingproject_tpu.ops import pallas_onehot as po
from raytracingproject_tpu.models import object as ob


def _cluster_scene(factory="cornell_box", **kw):
    scene = getattr(examples, factory)(64, 64, spp=2, **kw)
    scene.device_update()
    kg = scene.make_kernel_globals()
    ds = kg["dscene"]
    assert "cluster_bounds" in ds
    return kg, ds


def _chunk_tables(ds, kg, gmax):
    c = int(ds["cluster_bounds"].shape[0])
    groups = [(k, min(gmax, c - k)) for k in range(0, c, gmax)]
    scb = clm.supercluster_bounds(np.asarray(ds["cluster_bounds"]),
                                  groups)
    oh2 = po.pack_onehot2_tables(scb, np.asarray(ds["cluster_bounds"]),
                                 np.asarray(ds["cluster_table"]), gmax)
    assert oh2 is not None
    return oh2


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
    oh2 = _chunk_tables(ds, kg, gmax)
    ref = ci.intersect_clusters(
        ds["cluster_bounds"], ds["cluster_table"],
        int(kg["cluster_tris"]), o, d, tmin, tmax,
        visibility=vis, shadow_any_hit=shadow, has_instances=has_inst)
    got = po.intersect_clusters2_onehot(
        oh2["oh2_scb"], oh2["oh2_gcb"], oh2["oh2_hi"], oh2["oh2_mid"],
        oh2["oh2_lo"], int(kg["cluster_tris"]), o, d, tmin, tmax, vis,
        shadow_any_hit=shadow, has_instances=has_inst, interpret=True)
    ref = {k: np.asarray(v) for k, v in ref.items()}
    got = {k: np.asarray(v) for k, v in got.items()}
    if shadow:
        np.testing.assert_array_equal(ref["prim"] >= 0, got["prim"] >= 0)
        return ref, got
    np.testing.assert_array_equal(ref["prim"], got["prim"])
    np.testing.assert_array_equal(ref["object"], got["object"])
    np.testing.assert_allclose(ref["t"], got["t"], rtol=1e-5)
    np.testing.assert_allclose(ref["u"], got["u"], atol=1e-5)
    np.testing.assert_allclose(ref["v"], got["v"], atol=1e-5)
    return ref, got


class TestParity:
    def test_glossy_cornell(self):
        kg, ds = _cluster_scene(spheres="glossy")
        o, d = _rand_rays(2048, 1)
        ref, _ = _compare(kg, ds, o, d, gmax=16)
        assert (ref["prim"] >= 0).mean() > 0.2

    def test_instanced_scene(self):
        kg, ds = _cluster_scene("instanced_scene")
        o, d = _rand_rays(1024, 2, lo=(-20, -20, -20), hi=(20, 20, 20))
        ref, _ = _compare(kg, ds, o, d, gmax=16)
        assert (ref["prim"] >= 0).any()

    def test_shadow_any_hit(self):
        kg, ds = _cluster_scene(spheres="glossy")
        o, d = _rand_rays(1024, 3)
        _compare(kg, ds, o, d, gmax=16, shadow=True)

    def test_scene_packed_oh2_tables(self):
        """A big instanced scene packs oh2_* at sync; the kernel must
        agree with the tile-shared two-level walk on the same rays."""
        from raytracingproject_tpu.ops import pallas_cluster as pc
        kg, ds = _cluster_scene("instanced_scene", grid=8)
        assert "sc_bounds" in ds, "expected the two-level regime"
        if "oh2_scb" not in ds:
            import pytest
            pytest.skip("oh2 declined (VMEM estimate)")
        n = 1024
        o, d = _rand_rays(n, 4, lo=(-30, -30, -30), hi=(30, 30, 30))
        tmin = jnp.full((n,), 1e-4, jnp.float32)
        tmax = jnp.full((n,), 1e30, jnp.float32)
        vis = jnp.full((n,), ob.PATH_RAY_CAMERA, jnp.uint32)
        has_inst = bool(kg.get("has_instances", False))
        ref = pc.intersect_clusters2_pallas(
            ds["sc_bounds"], ds["cluster_bounds"], ds["cluster_table"],
            int(kg["cluster_tris"]), int(kg["sc_gmax"]), o, d, tmin,
            tmax, vis, has_instances=has_inst, interpret=True)
        got = po.intersect_clusters2_onehot(
            ds["oh2_scb"], ds["oh2_gcb"], ds["oh2_hi"], ds["oh2_mid"],
            ds["oh2_lo"],
            int(kg.get("oh2_cluster_tris", 0) or kg["cluster_tris"]),
            o, d, tmin, tmax, vis, has_instances=has_inst,
            interpret=True)
        np.testing.assert_array_equal(np.asarray(ref["prim"]),
                                      np.asarray(got["prim"]))
        np.testing.assert_allclose(np.asarray(ref["t"]),
                                   np.asarray(got["t"]), rtol=1e-5)
        assert (np.asarray(ref["prim"]) >= 0).any()

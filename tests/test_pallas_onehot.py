"""Per-lane one-hot MXU cluster traversal vs the XLA shortlist path
(ops/pallas_onehot.py vs ops/cluster_intersect.py — same watertight
math and same per-lane front-to-back walk, so hits must agree; ref
kernel/bvh/bvh_traversal.h:34-229).

Runs the kernel in interpreter mode off-TPU: semantics only; the
compiled path is exercised by the TPU bench and __graft_entry__."""

import numpy as np
import jax.numpy as jnp

from raytracingproject_tpu.app import examples
from raytracingproject_tpu.ops import cluster_intersect as ci
from raytracingproject_tpu.ops import pallas_onehot as po
from raytracingproject_tpu.models import object as ob


def _cluster_scene(factory="cornell_box", **kw):
    scene = getattr(examples, factory)(64, 64, spp=2, **kw)
    scene.device_update()
    kg = scene.make_kernel_globals()
    ds = kg["dscene"]
    assert "oh_cbounds" in ds, "scene must pack one-hot tables"
    return kg, ds


def _rand_rays(n, seed, lo=(-300, -300, -300), hi=(900, 900, 900)):
    rng = np.random.default_rng(seed)
    o = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _run_both(kg, ds, o, d, shadow=False, vis=None, time=None,
              same_cut=True):
    n = o.shape[0]
    tmin = jnp.full((n,), 1e-4, jnp.float32)
    tmax = jnp.full((n,), 1e30, jnp.float32)
    if vis is None:
        vis = jnp.full((n,), ob.PATH_RAY_CAMERA, jnp.uint32)
    has_inst = bool(kg.get("has_instances", False))
    has_mot = bool(kg.get("cluster_motion", False))
    ref = ci.intersect_clusters(
        ds["cluster_bounds"], ds["cluster_table"],
        int(kg["cluster_tris"]), o, d, tmin, tmax,
        visibility=vis, shadow_any_hit=shadow, has_instances=has_inst,
        time=time, has_motion=has_mot)
    if same_cut:
        # pack one-hot tables from the SAME cluster cut for bit-level
        # parity (the scene packs a coarser merged cut for the walk)
        oh = po.pack_onehot_tables(np.asarray(ds["cluster_bounds"]),
                                   np.asarray(ds["cluster_table"]))
        tabs = (jnp.asarray(oh["oh_cbounds"]),
                jnp.asarray(oh["oh_table_hi"]),
                jnp.asarray(oh["oh_table_mid"]),
                jnp.asarray(oh["oh_table_lo"]))
        ct = int(kg["cluster_tris"])
    else:
        tabs = (ds["oh_cbounds"], ds["oh_table_hi"],
                ds["oh_table_mid"], ds["oh_table_lo"])
        ct = int(kg.get("oh_cluster_tris", 0) or kg["cluster_tris"])
    got = po.intersect_clusters_onehot(
        *tabs, ct, o, d, tmin, tmax,
        vis, shadow_any_hit=shadow, has_instances=has_inst,
        time=time, has_motion=has_mot, tile=1024, interpret=True)
    return ({k: np.asarray(v) for k, v in ref.items()},
            {k: np.asarray(v) for k, v in got.items()})


def _assert_match(ref, got, shadow=False):
    if shadow:
        np.testing.assert_array_equal(ref["prim"] >= 0, got["prim"] >= 0)
        return
    np.testing.assert_array_equal(ref["prim"], got["prim"])
    np.testing.assert_array_equal(ref["object"], got["object"])
    # the fetched rows are bit-exact (bf16x3 one-hot reconstruction),
    # so the watertight tests see identical inputs; FMA-contraction
    # freedom between contexts still allows ulp drift in t/u/v
    np.testing.assert_allclose(ref["t"], got["t"], rtol=1e-5)
    np.testing.assert_allclose(ref["u"], got["u"], atol=1e-5)
    np.testing.assert_allclose(ref["v"], got["v"], atol=1e-5)


class TestParity:
    def test_glossy_cornell_random_rays(self):
        kg, ds = _cluster_scene(spheres="glossy")
        o, d = _rand_rays(2048, 1)
        ref, got = _run_both(kg, ds, o, d)
        _assert_match(ref, got)
        assert (ref["prim"] >= 0).mean() > 0.2

    def test_instanced_scene(self):
        kg, ds = _cluster_scene("instanced_scene")
        o, d = _rand_rays(1024, 2, lo=(-20, -20, -20), hi=(20, 20, 20))
        ref, got = _run_both(kg, ds, o, d)
        _assert_match(ref, got)
        assert (ref["prim"] >= 0).any()

    def test_shadow_any_hit(self):
        kg, ds = _cluster_scene(spheres="glossy")
        o, d = _rand_rays(1024, 3)
        ref, got = _run_both(kg, ds, o, d, shadow=True)
        _assert_match(ref, got, shadow=True)

    def test_nonaligned_lane_count(self):
        kg, ds = _cluster_scene(spheres="glossy")
        o, d = _rand_rays(1000, 4)     # forces padding
        ref, got = _run_both(kg, ds, o, d)
        _assert_match(ref, got)

    def test_scene_packed_tables(self):
        """The tables the scene packs at sync must match the XLA walk
        (same cut; a coarser merged cut was tried in round 4 and
        measured slower in-context — loose union AABBs grow visits)."""
        kg, ds = _cluster_scene(spheres="glossy")
        assert int(kg.get("oh_cluster_tris", 0)) > 0
        o, d = _rand_rays(1024, 14)
        ref, got = _run_both(kg, ds, o, d, same_cut=False)
        _assert_match(ref, got)

    def test_per_lane_visibility(self):
        kg, ds = _cluster_scene(spheres="glossy")
        o, d = _rand_rays(1024, 5)
        rng = np.random.default_rng(6)
        vis = jnp.asarray(rng.integers(1, 8, o.shape[0]), jnp.uint32)
        ref, got = _run_both(kg, ds, o, d, vis=vis)
        _assert_match(ref, got)


class TestSyntheticInstancedMotion:
    """The bench scenes statically merge instancing/motion out of the
    cluster rows — exercise the kernel's w2o-transform and time-lerp
    branches on hand-built tables."""

    def _tables(self, motion):
        rng = np.random.default_rng(7)
        dicts = []
        for i in range(24):
            k = 5
            base = rng.uniform(-4, 4, (1, 1, 3))
            verts = (base + rng.uniform(-0.5, 0.5, (k, 3, 3))
                     ).astype(np.float32)
            ang = rng.uniform(0, 2 * np.pi)
            rot = np.array([[np.cos(ang), -np.sin(ang), 0, 0.3 * i],
                            [np.sin(ang), np.cos(ang), 0, 0.1],
                            [0, 0, 1, -0.2]], np.float32)
            # world bounds of the object-space verts under o2w = inv
            r, t = rot[:, :3], rot[:, 3]
            o2w = np.concatenate([r.T, (-r.T @ t)[:, None]], 1)
            vw = verts @ o2w[:, :3].T + o2w[:, 3]
            d = {"verts": verts,
                 "prim": np.arange(i * k, i * k + k),
                 "obj": np.full(k, i % 3),
                 "vis": np.full(k, 0xFF, np.float32),
                 "w2o": rot, "lo": vw.reshape(-1, 3).min(0),
                 "hi": vw.reshape(-1, 3).max(0)}
            if motion:
                d["verts_t1"] = (verts + rng.uniform(
                    -0.3, 0.3, (k, 1, 3))).astype(np.float32)
                vw1 = d["verts_t1"] @ o2w[:, :3].T + o2w[:, 3]
                d["lo"] = np.minimum(d["lo"], vw1.reshape(-1, 3).min(0))
                d["hi"] = np.maximum(d["hi"], vw1.reshape(-1, 3).max(0))
            dicts.append(d)
        cb, ctab, ct, cmotion = ci.pack_cluster_table(dicts)
        assert cmotion == motion
        return cb, ctab, ct

    def _compare(self, motion, seed):
        cb, ctab, ct = self._tables(motion)
        oh = po.pack_onehot_tables(cb, ctab)
        n = 1024
        rng = np.random.default_rng(seed)
        o = jnp.asarray(rng.uniform(-6, 6, (n, 3)), jnp.float32)
        d = np.asarray(rng.normal(size=(n, 3)), np.float32)
        d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
        tmin = jnp.full((n,), 1e-4, jnp.float32)
        tmax = jnp.full((n,), 1e30, jnp.float32)
        vis = jnp.full((n,), 1, jnp.uint32)
        time = jnp.asarray(rng.uniform(0, 1, n), jnp.float32) \
            if motion else None
        ref = ci.intersect_clusters(
            jnp.asarray(cb), jnp.asarray(ctab), ct, o, d, tmin, tmax,
            visibility=vis, has_instances=True, time=time,
            has_motion=motion)
        got = po.intersect_clusters_onehot(
            jnp.asarray(oh["oh_cbounds"]), jnp.asarray(oh["oh_table_hi"]),
            jnp.asarray(oh["oh_table_mid"]), jnp.asarray(oh["oh_table_lo"]),
            ct, o, d, tmin, tmax, vis, has_instances=True, time=time,
            has_motion=motion, tile=1024, interpret=True)
        ref = {k: np.asarray(v) for k, v in ref.items()}
        got = {k: np.asarray(v) for k, v in got.items()}
        _assert_match(ref, got)
        assert (ref["prim"] >= 0).mean() > 0.01

    def test_instanced_w2o_rows(self):
        self._compare(motion=False, seed=8)

    def test_motion_time_lerp(self):
        self._compare(motion=True, seed=9)


class TestPacking:
    def test_bf16x3_exact(self):
        rng = np.random.default_rng(10)
        x = np.concatenate([
            rng.uniform(-600, 600, 4096).astype(np.float32),
            rng.normal(size=4096).astype(np.float32) * 1e-3,
            np.asarray([0.0, -0.0, 1.0, 16777215.0, 3e38], np.float32)])
        hi, mid, lo = po.split_bf16x3(x)
        rec = (np.asarray(hi, np.float32) + np.asarray(mid, np.float32)
               + np.asarray(lo, np.float32))
        np.testing.assert_array_equal(rec, x)

    def test_capacity_gate(self):
        # C beyond the packed-id capacity must decline, not mispack
        cb = np.zeros((600, 6), np.float32)
        ct = np.zeros((600, 40), np.float32)
        assert po.pack_onehot_tables(cb, ct) is None


class TestIndependentCut:
    """scene.OH_CUT_TRIS re-cuts the BVH independently for the one-hot
    tables (a TRUE subtree re-cut with tight bounds — not the r4
    adjacent-segment merge). Hits must still match the XLA walk on the
    FINE cut: hit selection only depends on exact per-triangle t."""

    def test_recut_parity(self):
        from raytracingproject_tpu.models import scene as scene_mod
        try:
            scene_mod.OH_CUT_TRIS = 48
            kg, ds = _cluster_scene(spheres="glossy")
        finally:
            scene_mod.OH_CUT_TRIS = None
        ohtris = int(kg.get("oh_cluster_tris", 0))
        assert ohtris > int(kg["cluster_tris"])  # coarser cut landed
        o, d = _rand_rays(1536, 21)
        ref, got = _run_both(kg, ds, o, d, same_cut=False)
        np.testing.assert_array_equal(ref["prim"], got["prim"])
        np.testing.assert_array_equal(ref["object"], got["object"])
        np.testing.assert_allclose(ref["t"], got["t"], rtol=1e-5)


class TestDualUnionWalk:
    """intersect_clusters_onehot_dual: the union walk must reproduce a
    closest-hit single walk AND an any-hit single walk exactly — extra
    cross-ray tests are idempotent (strict-t closest, latch-only any)."""

    def _tabs(self, kg, ds):
        return (ds["oh_cbounds"], ds["oh_table_hi"],
                ds["oh_table_mid"], ds["oh_table_lo"]), \
            int(kg.get("oh_cluster_tris", 0) or kg["cluster_tris"])

    def test_parity_vs_two_single_walks(self):
        kg, ds = _cluster_scene(spheres="glossy")
        tabs, ct = self._tabs(kg, ds)
        n = 1536
        o_c, d_c = _rand_rays(n, 31)
        # any rays: from slightly different origins toward one point
        o_a = o_c + 0.05
        tgt = np.array([278.0, 548.0, 279.0], np.float32)
        d_a = jnp.asarray(tgt[None, :] - np.asarray(o_a))
        dist = jnp.linalg.norm(d_a, axis=1)
        d_a = d_a / dist[:, None]
        tmin = jnp.full((n,), 1e-4, jnp.float32)
        tmax_c = jnp.full((n,), 1e30, jnp.float32)
        tmax_a = dist * 0.999
        vis_c = jnp.full((n,), ob.PATH_RAY_CAMERA, jnp.uint32)
        vis_a = jnp.full((n,), ob.PATH_RAY_SHADOW, jnp.uint32)

        ref_c = po.intersect_clusters_onehot(
            *tabs, ct, o_c, d_c, tmin, tmax_c, vis_c, tile=1024,
            interpret=True)
        ref_a = po.intersect_clusters_onehot(
            *tabs, ct, o_a, d_a, tmin, tmax_a, vis_a,
            shadow_any_hit=True, tile=1024, interpret=True)
        got_c, got_blk = po.intersect_clusters_onehot_dual(
            *tabs, ct, o_c, d_c, tmin, tmax_c, vis_c,
            o_a, d_a, tmin, tmax_a, vis_a, tile=1024, interpret=True)

        np.testing.assert_array_equal(np.asarray(ref_c["prim"]),
                                      np.asarray(got_c["prim"]))
        np.testing.assert_array_equal(np.asarray(ref_c["object"]),
                                      np.asarray(got_c["object"]))
        np.testing.assert_allclose(np.asarray(ref_c["t"]),
                                   np.asarray(got_c["t"]), rtol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(ref_a["prim"]) >= 0, np.asarray(got_blk))
        assert np.asarray(got_blk).any()
        assert (np.asarray(got_c["prim"]) >= 0).any()

    def test_empty_windows_disable_rays(self):
        kg, ds = _cluster_scene(spheres="glossy")
        tabs, ct = self._tabs(kg, ds)
        n = 512
        o, d = _rand_rays(n, 32)
        tmin = jnp.full((n,), 1e-4, jnp.float32)
        empty = jnp.full((n,), -1.0, jnp.float32)
        tmax = jnp.full((n,), 1e30, jnp.float32)
        vis = jnp.full((n,), ob.PATH_RAY_CAMERA, jnp.uint32)
        # any-window empty -> never blocked; closest window empty ->
        # no hits
        got_c, blk = po.intersect_clusters_onehot_dual(
            *tabs, ct, o, d, tmin, tmax, vis,
            o, d, tmin, empty, vis, tile=1024, interpret=True)
        assert not np.asarray(blk).any()
        got_c2, blk2 = po.intersect_clusters_onehot_dual(
            *tabs, ct, o, d, tmin, empty, vis,
            o, d, tmin, tmax,
            jnp.full((n,), ob.PATH_RAY_SHADOW, jnp.uint32),
            tile=1024, interpret=True)
        assert (np.asarray(got_c2["prim"]) == -1).all()
        assert np.asarray(blk2).any()

"""Light-tree tests (ops/light_tree.py): build invariants, pick/pdf
twin exactness, flat-vs-tree estimator parity (unbiasedness), and the
many-light variance win the tree exists for.

Reference context: the flat distribution being replaced is
render/light.cpp:277; the MIS identities exercised here mirror
kernel/kernel_emission.h:209-333 with a P-dependent pick pmf.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracingproject_tpu.app import examples
from raytracingproject_tpu.ops import integrator as integ
from raytracingproject_tpu.ops import light_tree as ltree


def render(scene, w, h, spp, seed=None):
    if seed is not None:
        scene.integrator.set("seed", seed)
    scene.device_update()
    kg = scene.make_kernel_globals()
    yy, xx = np.mgrid[0:h, 0:w]
    px = jnp.asarray(xx.reshape(-1), jnp.int32)
    py = jnp.asarray(yy.reshape(-1), jnp.int32)
    pidx = py * w + px
    L, _ = jax.jit(
        lambda a, b, c: integ.render_samples(kg, a, b, c, 0, spp)
    )(px, py, pidx)
    return np.asarray(L).reshape(h, w, 3) / spp


def tree_dscene(scene):
    scene.device_update()
    kg = scene.make_kernel_globals()
    return kg["dscene"], kg["light_tree"]


class TestBuild:
    def test_meta_and_arrays(self):
        s = examples.many_lights_scene(16, 16, grid=4,
                                       use_light_tree=True)
        ds, tree = tree_dscene(s)
        assert tree is not None
        # 16 quads x 2 triangles = 32 finite leaves -> depth 5
        assert tree["depth"] == 5
        assert ds["lt_nodes"].shape == (31, 24)
        assert ds["lt_leaf_entries"].shape == (32, 4)
        # root energy = sum of leaf energies (pads carry zero)
        nodes = np.asarray(ds["lt_nodes"])
        root = np.asarray(ds["lt_root"])
        leaf_e = nodes[16 - 1:, ltree.CL_ENERGY].sum() \
            + nodes[16 - 1:, 12 + ltree.CL_ENERGY].sum()
        np.testing.assert_allclose(root[ltree.CL_ENERGY], leaf_e,
                                   rtol=1e-5)

    def test_single_light_falls_back_to_flat(self):
        s = examples.cornell_box(16, 16, spp=2, light_mode="area")
        s.integrator.set("use_light_tree", True)
        ds, tree = tree_dscene(s)
        assert tree is None          # D < 2: flat CDF, no tree arrays
        img = render(s, 16, 16, 2)
        assert np.isfinite(img).all()

    def test_pmf_normalization_and_twin_walk(self):
        """sum_leaves finite_pmf(P, leaf) + q_inf * sum(inf pmfs) == 1
        at arbitrary P, and pick()'s pmf equals leaf_pmf() bit-exactly
        on the picked leaf (the sample-side / MIS-side twin contract)."""
        s = examples.many_lights_scene(16, 16, grid=4,
                                       use_light_tree=True,
                                       with_infinite=True)
        ds, tree = tree_dscene(s)
        assert tree is not None and tree["inf_energy"] > 0.0
        rng = np.random.default_rng(0)
        P = jnp.asarray(rng.uniform([-5, -5, 0], [25, 25, 8],
                                    (64, 3)).astype(np.float32))
        total = ltree.q_infinite(ds, P, tree["inf_energy"])
        L = int(ds["lt_leaf_entries"].shape[0])
        for leaf in range(L):
            total = total + ltree.finite_pmf(
                ds, tree, P, jnp.full((64,), leaf, jnp.int32))
        np.testing.assert_allclose(np.asarray(total), 1.0, atol=2e-5)

        u = jnp.asarray(rng.uniform(0, 1, 64).astype(np.float32))
        leaf, pmf = ltree.pick(ds, tree["depth"], P, u)
        pmf2 = ltree.leaf_pmf(ds, tree["depth"], P, leaf)
        np.testing.assert_array_equal(np.asarray(pmf), np.asarray(pmf2))

    def test_pick_matches_pmf_distribution(self):
        """Empirical pick frequencies converge to the analytic pmf."""
        s = examples.many_lights_scene(16, 16, grid=4,
                                       use_light_tree=True)
        ds, tree = tree_dscene(s)
        n = 16384
        P = jnp.broadcast_to(jnp.asarray([2.0, 2.0, 0.0]), (n, 3))
        u = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n   # stratified
        leaf, pmf = ltree.pick(ds, tree["depth"], P, u)
        leaf = np.asarray(leaf)
        counts = np.bincount(leaf, minlength=32) / n
        ana = np.asarray(ltree.leaf_pmf(
            ds, tree["depth"], P[:32],
            jnp.arange(32, dtype=jnp.int32)))
        np.testing.assert_allclose(counts, ana, atol=2e-3)
        # the pick is genuinely P-aware: a far corner redistributes
        P2 = jnp.broadcast_to(jnp.asarray([18.0, 18.0, 0.0]), (n, 3))
        ana2 = np.asarray(ltree.leaf_pmf(
            ds, tree["depth"], P2[:32], jnp.arange(32, dtype=jnp.int32)))
        assert np.abs(ana - ana2).max() > 0.01


class TestEstimatorParity:
    """Tree on/off must agree in expectation — the pick pmf cancels in
    the estimator, and every MIS pdf-side twin must match its
    sample-side (errors here show up as energy gain/loss)."""

    def _parity(self, scene_kw, w=24, h=24, spp=24, tol=0.05):
        flat = render(examples.many_lights_scene(
            w, h, use_light_tree=False, **scene_kw), w, h, spp)
        tree = render(examples.many_lights_scene(
            w, h, use_light_tree=True, **scene_kw), w, h, spp)
        assert np.isfinite(tree).all()
        rel = abs(flat.mean() - tree.mean()) / max(flat.mean(), 1e-9)
        assert rel < tol, (flat.mean(), tree.mean())
        return flat, tree

    def test_mesh_lights(self):
        self._parity(dict(grid=4, light_kind="mesh"))

    def test_point_lamps(self):
        self._parity(dict(grid=3, light_kind="point"))

    def test_spot_lamps(self):
        self._parity(dict(grid=3, light_kind="spot"))

    def test_infinite_group(self):
        # distant sun + background join via q_infinite; background MIS
        # must use the per-lane tree pick pmf (bg_pick_pmf)
        self._parity(dict(grid=3, light_kind="mesh",
                          with_infinite=True))

    def test_glossy_mis(self):
        # glossy floor BSDF-samples into the emitters: exercises the
        # forward triangle-hit MIS twin (finite_pmf at P_mis)
        self._parity(dict(grid=4, light_kind="mesh",
                          glossy_floor=True), spp=32, tol=0.06)

    def test_area_lamp_mis_with_tree(self):
        # two entries (area lamp + point) so the tree builds; lamp_hits
        # re-derives the area lamp's pick pmf from its static leaf
        from raytracingproject_tpu.models import Light
        imgs = []
        for use in (False, True):
            s = examples.cornell_box(20, 20, spp=16, light_mode="area")
            s.add_light(Light("fill", light_type="point",
                              co=(278.0, 100.0, 300.0), size=0.0,
                              strength=(2e5, 2e5, 2e5)))
            s.integrator.set("use_light_tree", use)
            if use:
                s.device_update()
                assert s.make_kernel_globals()["light_tree"] is not None
            imgs.append(render(s, 20, 20, 16))
        rel = abs(imgs[0].mean() - imgs[1].mean()) / imgs[0].mean()
        assert rel < 0.05, (imgs[0].mean(), imgs[1].mean())


class TestVarianceWin:
    def test_tree_cuts_many_light_noise(self):
        """The point of the tree: with 128 emitters spanning ~2 orders
        of magnitude in power, the P-aware pick must cut per-pixel
        noise vs the flat CDF at equal spp."""
        def stds(use_tree):
            runs = np.stack([
                render(examples.many_lights_scene(
                    24, 24, grid=8, use_light_tree=use_tree),
                    24, 24, spp=8, seed=seed)
                for seed in (1, 2, 3, 4)])
            return runs.std(0).mean(), runs.mean()
        std_flat, mean_flat = stds(False)
        std_tree, mean_tree = stds(True)
        # unbiasedness guard at higher light count too
        assert abs(mean_flat - mean_tree) / mean_flat < 0.06
        assert std_tree < std_flat * 0.75, (std_tree, std_flat)

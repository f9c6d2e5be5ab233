"""Path-regeneration driver invariants: the multi-sample wavefront
(lanes_per_pixel) must reproduce the single-lane accumulation, and the
light-pick row reuse must be bit-identical to a fresh sample_light call
(ref: the regen queues, kernel_types.h:1592; equiangular light re-eval,
kernel_volume.h:978-1050)."""

import numpy as np
import jax.numpy as jnp

from raytracingproject_tpu.app import examples
from raytracingproject_tpu.ops import integrator as integ
from raytracingproject_tpu.ops import light as light_ops


def _render(scene, W, H, spp, lpp):
    scene.device_update()
    kg = scene.make_kernel_globals()
    yy, xx = np.mgrid[0:H, 0:W]
    px = jnp.asarray(np.tile(xx.reshape(-1), lpp), jnp.int32)
    py = jnp.asarray(np.tile(yy.reshape(-1), lpp), jnp.int32)
    pidx = py * W + px
    L, A = integ.render_samples_regen(kg, px, py, pidx, jnp.uint32(0), spp,
                                      lanes_per_pixel=lpp)
    return np.asarray(L), np.asarray(A)


class TestLanesPerPixel:
    def test_parity_surface_scene(self):
        W = H = 24
        L1, A1 = _render(examples.cornell_box(W, H), W, H, 8, 1)
        L2, A2 = _render(examples.cornell_box(W, H), W, H, 8, 2)
        # same per-sample values, K-way reassociated sum
        np.testing.assert_allclose(L2, L1, rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(A2, A1, rtol=2e-5, atol=2e-5)

    def test_parity_volume_mis_scene(self):
        # exercises the equiangular estimator + light-row reuse path
        W = H = 12
        s1 = examples.smoke_small_light(W, H, method="multiple_importance")
        s2 = examples.smoke_small_light(W, H, method="multiple_importance")
        L1, _ = _render(s1, W, H, 4, 1)
        L2, _ = _render(s2, W, H, 4, 4)
        np.testing.assert_allclose(L2, L1, rtol=2e-5, atol=2e-5)


class TestLightRowReuse:
    def test_resample_bit_identical(self):
        scene = examples.cornell_box(16, 16)
        scene.device_update()
        ds = scene.make_kernel_globals()["dscene"]
        n = 64
        rng = np.random.default_rng(7)
        P = jnp.asarray(rng.uniform(50, 500, (n, 3)), jnp.float32)
        u = jnp.asarray(rng.uniform(0, 1, (3, n)), jnp.float32)
        ls = light_ops.sample_light(ds, P, u[0], u[1], u[2])
        ls2 = light_ops.sample_light(ds, P, u[0], u[1], u[2],
                                     rows=ls["rows"])
        for k in ("valid", "D", "dist", "pdf", "eval", "P_l"):
            np.testing.assert_array_equal(np.asarray(ls[k]),
                                          np.asarray(ls2[k]), err_msg=k)
        # a second observer point: the sampled light POINT is unchanged
        P_b = P + 10.0
        ls3 = light_ops.sample_light(ds, P_b, u[0], u[1], u[2],
                                     rows=ls["rows"])
        np.testing.assert_array_equal(np.asarray(ls["P_l"]),
                                      np.asarray(ls3["P_l"]))
        assert not np.allclose(np.asarray(ls["D"]), np.asarray(ls3["D"]))


class TestRegenAuxPasses:
    """Aux/light passes through the regen driver must reproduce the
    fixed-grid accumulation (same per-sample merge, so bit-exact at
    K=1; K>1 only reassociates the pixel reduction)."""

    def _kg(self, W, H, light=False):
        scene = examples.cornell_box(W, H, spp=4)
        scene.device_update()
        kg = scene.make_kernel_globals()
        kg = dict(kg)
        kg["aux_passes"] = ("normal", "depth", "mist", "object_id")
        kg["mist"] = (0.0, 1.0 / 1000.0, 1.0)  # start, inv_depth, falloff
        if light:
            kg["light_passes"] = True
        return kg

    def _grid(self, W, H, lpp=1):
        yy, xx = np.mgrid[0:H, 0:W]
        px = jnp.asarray(np.tile(xx.reshape(-1), lpp), jnp.int32)
        py = jnp.asarray(np.tile(yy.reshape(-1), lpp), jnp.int32)
        return px, py, py * W + px

    def test_bit_exact_vs_fixed_grid(self):
        W = H = 16
        kg = self._kg(W, H, light=True)
        px, py, pidx = self._grid(W, H)
        Lf, Af, auxf = integ.render_samples(kg, px, py, pidx,
                                            jnp.uint32(0), 4)
        Lr, Ar, auxr = integ.render_samples_regen(kg, px, py, pidx,
                                                  jnp.uint32(0), 4)
        np.testing.assert_array_equal(np.asarray(Lf), np.asarray(Lr))
        np.testing.assert_array_equal(np.asarray(Af), np.asarray(Ar))
        assert set(auxf) == set(auxr) and len(auxf) > 4
        for k in auxf:
            np.testing.assert_array_equal(np.asarray(auxf[k]),
                                          np.asarray(auxr[k]), err_msg=k)

    def test_lanes_per_pixel_reassociates(self):
        W = H = 12
        kg = self._kg(W, H)
        px1, py1, pidx1 = self._grid(W, H)
        L1, A1, aux1 = integ.render_samples_regen(kg, px1, py1, pidx1,
                                                  jnp.uint32(0), 4)
        px4, py4, pidx4 = self._grid(W, H, lpp=4)
        L4, A4, aux4 = integ.render_samples_regen(
            kg, px4, py4, pidx4, jnp.uint32(0), 4, lanes_per_pixel=4)
        np.testing.assert_allclose(np.asarray(L4), np.asarray(L1),
                                   rtol=2e-5, atol=2e-5)
        for k in aux1:
            np.testing.assert_allclose(np.asarray(aux4[k]),
                                       np.asarray(aux1[k]),
                                       rtol=2e-5, atol=2e-5, err_msg=k)

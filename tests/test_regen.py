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

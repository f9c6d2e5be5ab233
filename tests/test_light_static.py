"""Static light-kind specialization (ops/light.py _sample_light_all_tri
via kg["light_kinds"]): on an all-triangle distribution the pruned path
must be BIT-EXACT vs the general path (every lamp select it skips is
all-False there), and renders must be unchanged."""

import numpy as np
import jax.numpy as jnp

from raytracingproject_tpu.app import examples
from raytracingproject_tpu.ops import light as light_ops
from raytracingproject_tpu.ops import integrator as integ


def _kg(W=32, H=32):
    scene = examples.cornell_box(W, H, spp=2, spheres="glossy")
    scene.device_update()
    return scene.make_kernel_globals()


class TestStaticLightKinds:
    def test_kinds_packed(self):
        kg = _kg()
        assert kg["light_kinds"] == ("tri", "tri")

    def test_sample_light_bit_exact(self):
        kg = _kg()
        ds = kg["dscene"]
        rng = np.random.default_rng(5)
        n = 4096
        P = jnp.asarray(rng.uniform(0, 556, (n, 3)), jnp.float32)
        us = [jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
              for _ in range(3)]
        ref = light_ops.sample_light(ds, P, *us)
        got = light_ops.sample_light(ds, P, *us,
                                     static_kinds=kg["light_kinds"])
        for k in ("valid", "delta", "D", "dist", "pdf", "eval", "Ng_l",
                  "is_tri", "tri_prim", "tri_u", "tri_v", "is_bg",
                  "P_l", "pmf"):
            np.testing.assert_array_equal(
                np.asarray(ref[k]), np.asarray(got[k]), err_msg=k)

    def test_render_statistically_unchanged(self):
        # the two kernels are different jit graphs: XLA contracts the
        # surrounding NEE math differently, ulp drift flips russian-
        # roulette decisions and individual SAMPLES diverge chaotically
        # (the le_rows lesson) while both estimators stay correct —
        # compare converged means, not samples
        kg = _kg()
        W = H = 32
        yy, xx = np.mgrid[0:H, 0:W]
        px = jnp.asarray(xx.reshape(-1), jnp.int32)
        py = jnp.asarray(yy.reshape(-1), jnp.int32)
        pidx = py * W + px
        spp = 24
        kg_off = dict(kg, light_kinds=None)
        L0, _ = integ.render_samples_regen(kg_off, px, py, pidx, 0, spp)
        L1, _ = integ.render_samples_regen(kg, px, py, pidx, 0, spp)
        m0 = float(np.asarray(L0).mean()) / spp
        m1 = float(np.asarray(L1).mean()) / spp
        assert m0 > 0.01
        assert abs(m1 - m0) / m0 < 0.03, (m0, m1)

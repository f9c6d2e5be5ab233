"""Fused-NEE mode (one union walk per bounce answering the NEE shadow
any-hit and the next ray's closest hit — ops/integrator.py
_use_fused_nee / _render_samples_regen_fused, round-5 verdict item 2).

Invariants:
- fixed-grid vs regen parity holds BIT-EXACTLY within fused mode (the
  project's correctness pillar applies per mode);
- fused vs unfused agree to float tolerance (identical math, different
  jit graphs — FMA contraction may drift ulps, the le_rows lesson);
- the adaptive chunk driver's fused path reproduces the fused regen
  accumulation.

Runs the dual Pallas kernel in interpret mode off-TPU.
"""

import numpy as np
import jax.numpy as jnp

from raytracingproject_tpu.app import examples
from raytracingproject_tpu.ops import integrator as integ


def _setup(W=32, H=32):
    scene = examples.cornell_box(W, H, spp=2, spheres="glossy")
    scene.device_update()
    kg = scene.make_kernel_globals()
    assert "oh_cbounds" in kg["dscene"]
    kg_f = {**kg, "fused_nee": True, "pallas_interpret": True,
            "pallas_onehot": True}
    assert integ._use_fused_nee(kg_f)
    yy, xx = np.mgrid[0:H, 0:W]
    px = jnp.asarray(xx.reshape(-1), jnp.int32)
    py = jnp.asarray(yy.reshape(-1), jnp.int32)
    pidx = py * W + px
    return kg, kg_f, px, py, pidx


class TestFusedNee:
    def test_fixed_vs_regen_bit_exact_fused(self):
        kg, kg_f, px, py, pidx = _setup()
        spp = 2
        Lf, Af = integ.render_samples(kg_f, px, py, pidx, 0, spp)
        Lr, Ar = integ.render_samples_regen(kg_f, px, py, pidx, 0, spp)
        np.testing.assert_array_equal(np.asarray(Lf), np.asarray(Lr))
        np.testing.assert_array_equal(np.asarray(Af), np.asarray(Ar))

    def test_fused_matches_unfused(self):
        kg, kg_f, px, py, pidx = _setup()
        spp = 2
        L0, A0 = integ.render_samples_regen(kg, px, py, pidx, 0, spp)
        L1, A1 = integ.render_samples_regen(kg_f, px, py, pidx, 0, spp)
        np.testing.assert_allclose(np.asarray(L1), np.asarray(L0),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(A1), np.asarray(A0),
                                   rtol=2e-4, atol=2e-4)
        assert float(np.asarray(L1).mean()) > 0.01

    def test_adaptive_chunk_fused(self):
        kg, kg_f, px, py, pidx = _setup(16, 16)
        n = px.shape[0]
        s0 = jnp.zeros((n,), jnp.uint32)
        L0, A0, E0 = integ.render_samples_adaptive_chunk(
            kg, px, py, pidx, s0, 2)
        L1, A1, E1 = integ.render_samples_adaptive_chunk(
            kg_f, px, py, pidx, s0, 2)
        np.testing.assert_allclose(np.asarray(L1), np.asarray(L0),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(E1), np.asarray(E0),
                                   rtol=2e-4, atol=2e-4)

    def test_lanes_per_pixel_fused(self):
        kg, kg_f, px, py, pidx = _setup(16, 16)
        spp = 4
        K = 2
        pxk = jnp.tile(px, K)
        pyk = jnp.tile(py, K)
        pidxk = jnp.tile(pidx, K)
        L0, A0 = integ.render_samples_regen(kg_f, px, py, pidx, 0, spp)
        L1, A1 = integ.render_samples_regen(kg_f, pxk, pyk, pidxk, 0,
                                            spp, lanes_per_pixel=K)
        np.testing.assert_allclose(np.asarray(L1), np.asarray(L0),
                                   rtol=1e-5, atol=1e-5)

"""Fixed-shape adaptive driver invariants (session/adaptive.py):
with the threshold disabled it must reproduce the regen renderer's
accumulation exactly (same per-(pixel, sample) RNG, reassociated sums);
with a finite threshold it must spend fewer samples than the nominal
budget while staying close to the full-budget image (ref error metric:
kernel_adaptive_sampling.h)."""

import numpy as np
import jax.numpy as jnp

from raytracingproject_tpu.app import examples
from raytracingproject_tpu.ops import integrator as integ
from raytracingproject_tpu.session.adaptive import render_adaptive


def _reference(scene, W, H, spp):
    scene.device_update()
    kg = scene.make_kernel_globals()
    yy, xx = np.mgrid[0:H, 0:W]
    px = jnp.asarray(xx.reshape(-1), jnp.int32)
    py = jnp.asarray(yy.reshape(-1), jnp.int32)
    pidx = py * W + px
    L, A = integ.render_samples_regen(kg, px, py, pidx, jnp.uint32(0), spp)
    return np.asarray(L), np.asarray(A), kg


class TestAdaptiveDriver:
    def test_exact_when_threshold_disabled(self):
        W = H = 16
        spp = 8
        L_ref, A_ref, kg = _reference(examples.cornell_box(W, H), W, H, spp)
        L, A, counts, stats = render_adaptive(
            kg, W, H, spp, threshold=0.0, chunk=2)
        assert (counts == spp).all()
        assert stats["samples_rendered"] == stats["samples_nominal"]
        np.testing.assert_allclose(L, L_ref, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(A, A_ref, rtol=1e-4, atol=1e-4)

    def test_adaptive_saves_samples(self):
        W = H = 16
        spp = 32
        L_ref, _, kg = _reference(examples.cornell_box(W, H), W, H, spp)
        img_ref = L_ref / spp
        L, A, counts, stats = render_adaptive(
            kg, W, H, spp, threshold=0.1, min_samples=4, chunk=2)
        assert stats["samples_rendered"] < stats["samples_nominal"]
        assert counts.min() >= 4
        img = L / counts[:, None]
        # converged-early pixels still estimate the same integral
        assert np.abs(img - img_ref).mean() < 0.05

    def test_wavefront_wider_than_active(self):
        # once actives < lanes, replicas must cover distinct consecutive
        # sample ranges (no double-counting)
        W = H = 8
        spp = 16
        L_ref, _, kg = _reference(examples.cornell_box(W, H), W, H, spp)
        L, A, counts, stats = render_adaptive(
            kg, W, H, spp, threshold=0.0, chunk=2, lanes=4 * W * H)
        assert (counts == spp).all()
        np.testing.assert_allclose(L, L_ref, rtol=1e-4, atol=1e-4)

    def test_surplus_lanes_render_real_work_not_padding(self):
        # round-3 bench regression: milestone caps turned surplus lanes
        # into masked duplicate padding (75% of every dispatch wasted).
        # With lanes = 8x pixels and milestone min_samples=8 < spp=16,
        # the surplus must spill into extra chunks toward spp — zero
        # padded lanes, full budget in ONE dispatch.
        W = H = 8
        spp = 16
        L_ref, _, kg = _reference(examples.cornell_box(W, H), W, H, spp)
        L, A, counts, stats = render_adaptive(
            kg, W, H, spp, threshold=0.0, min_samples=8, chunk=2,
            lanes=8 * W * H)
        assert stats["lanes_wasted"] == 0
        assert stats["dispatches"] == 1
        assert (counts == spp).all()
        np.testing.assert_allclose(L, L_ref, rtol=1e-4, atol=1e-4)


class TestAdaptiveDeviceDriver:
    """Device-resident rounds (session/adaptive.py
    render_adaptive_device): same contract as the host driver with the
    allocation/scatter/error loop fused into one jitted program."""

    def test_exact_when_threshold_disabled(self):
        from raytracingproject_tpu.session.adaptive import (
            render_adaptive_device)
        W = H = 16
        spp = 8
        L_ref, A_ref, kg = _reference(examples.cornell_box(W, H), W, H,
                                      spp)
        L, A, counts, stats = render_adaptive_device(
            kg, W, H, spp, threshold=0.0, chunk=2)
        assert (counts == spp).all()
        assert stats["samples_rendered"] == stats["samples_nominal"]
        np.testing.assert_allclose(L, L_ref, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(A, A_ref, rtol=1e-4, atol=1e-4)

    def test_adaptive_saves_samples(self):
        from raytracingproject_tpu.session.adaptive import (
            render_adaptive_device)
        W = H = 16
        spp = 32
        L_ref, _, kg = _reference(examples.cornell_box(W, H), W, H, spp)
        img_ref = L_ref / spp
        L, A, counts, stats = render_adaptive_device(
            kg, W, H, spp, threshold=0.1, min_samples=4, chunk=2)
        assert stats["samples_rendered"] < stats["samples_nominal"]
        assert counts.min() >= 4
        img = L / counts[:, None]
        assert np.abs(img - img_ref).mean() < 0.05

    def test_wide_wavefront_disjoint_replicas(self):
        from raytracingproject_tpu.session.adaptive import (
            render_adaptive_device)
        W = H = 8
        spp = 16
        L_ref, _, kg = _reference(examples.cornell_box(W, H), W, H, spp)
        L, A, counts, stats = render_adaptive_device(
            kg, W, H, spp, threshold=0.0, chunk=2, lanes=4 * W * H)
        assert (counts == spp).all()
        np.testing.assert_allclose(L, L_ref, rtol=1e-4, atol=1e-4)

    def test_narrow_wavefront_fewer_lanes_than_pixels(self):
        # base == 0 path: more active pixels than lanes; ranks beyond
        # the lane count wait for later rounds — coverage must still
        # complete and match the reference
        from raytracingproject_tpu.session.adaptive import (
            render_adaptive_device)
        W = H = 8
        spp = 4
        L_ref, _, kg = _reference(examples.cornell_box(W, H), W, H, spp)
        L, A, counts, stats = render_adaptive_device(
            kg, W, H, spp, threshold=0.0, chunk=2, lanes=W * H // 4)
        assert (counts == spp).all()
        np.testing.assert_allclose(L, L_ref, rtol=1e-4, atol=1e-4)

"""Learned kernel-predicting denoiser (ops/kpcn.py): structural
invariants that hold for ANY parameters — softmax kernels make the
output a convex combination of observed radiance (no color shift
beyond the neighborhood hull, exact on constant images), and the
trained-weight path slots into denoise_buffers."""

import numpy as np
import jax.numpy as jnp

from raytracingproject_tpu.ops import kpcn


class TestKpcn:
    def test_constant_image_fixed_point(self):
        # convex weights: a constant image denoises to itself exactly
        params = kpcn.init_params(seed=1)
        img = jnp.full((24, 24, 3), 0.37)
        alb = jnp.full((24, 24, 3), 0.5)
        nrm = jnp.full((24, 24, 3), 0.1)
        out = kpcn.kpcn_denoise(img, alb, nrm, params=params)
        np.testing.assert_allclose(np.asarray(out), 0.37, rtol=1e-5)

    def test_output_within_neighborhood_hull(self):
        params = kpcn.init_params(seed=2)
        rng = np.random.default_rng(3)
        img = jnp.asarray(rng.uniform(0, 5, (32, 32, 3)), jnp.float32)
        out = np.asarray(kpcn.kpcn_denoise(img, None, None,
                                           params=params))
        assert out.min() >= float(np.asarray(img).min()) - 1e-4
        assert out.max() <= float(np.asarray(img).max()) + 1e-4

    def test_reduces_noise_after_short_training(self):
        # a few gradient steps on synthetic flat+noise patches must
        # beat the identity: the net learns to average
        import optax
        import jax
        params = kpcn.init_params(seed=4)
        opt = optax.adam(5e-3)
        state = opt.init(params)
        rng = np.random.default_rng(5)

        def loss_fn(p, lo, hi):
            out = kpcn.apply_kernels(
                kpcn.predict_kernels(p, lo, None, None), lo)
            return jnp.mean((out - hi) ** 2)

        @jax.jit
        def step(p, s, lo, hi):
            l, g = jax.value_and_grad(loss_fn)(p, lo, hi)
            up, s = opt.update(g, s)
            return optax.apply_updates(p, up), s, l

        for _ in range(60):
            hi = np.full((24, 24, 3), rng.uniform(0.2, 2.0), np.float32)
            lo = hi + rng.normal(0, 0.3, hi.shape).astype(np.float32)
            params, state, _ = step(params, state, jnp.asarray(lo),
                                    jnp.asarray(hi))
        hi = np.full((24, 24, 3), 1.0, np.float32)
        lo = hi + rng.normal(0, 0.3, hi.shape).astype(np.float32)
        out = np.asarray(kpcn.kpcn_denoise(jnp.asarray(lo), None, None,
                                           params=params))
        assert np.mean((out - hi) ** 2) < 0.5 * np.mean((lo - hi) ** 2)

    def test_save_load_roundtrip(self, tmp_path):
        params = kpcn.init_params(seed=6)
        p = kpcn.save_params(params, str(tmp_path / "w.npz"))
        loaded = kpcn.load_params(p)
        for (w0, b0), (w1, b1) in zip(params, loaded):
            np.testing.assert_array_equal(np.asarray(w0),
                                          np.asarray(w1))
            np.testing.assert_array_equal(np.asarray(b0),
                                          np.asarray(b1))

    def test_denoise_buffers_method_dispatch(self, tmp_path):
        from raytracingproject_tpu.ops import denoise as dn
        params = kpcn.init_params(seed=7)
        path = kpcn.save_params(params, str(tmp_path / "w.npz"))
        kpcn._CACHED = kpcn.load_params(path)
        try:
            rgba = jnp.concatenate(
                [jnp.full((16, 16, 3), 0.25), jnp.ones((16, 16, 1))],
                axis=-1)
            out = dn.denoise_buffers(rgba, method="kpcn")
            assert out.shape == (16, 16, 4)
            np.testing.assert_allclose(out[..., :3], 0.25, rtol=1e-5)
            np.testing.assert_allclose(out[..., 3], 1.0)
        finally:
            kpcn._CACHED = None

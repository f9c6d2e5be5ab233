"""Denoiser tests (ref: denoise test category)."""

import numpy as np
import jax.numpy as jnp

from raytracingproject_tpu.ops import denoise as dn


class TestNLM:
    def _noisy_scene(self, seed=0, h=48, w=48):
        rng = np.random.default_rng(seed)
        # piecewise-constant "render" with two regions + noise
        clean = np.zeros((h, w, 3), np.float32)
        clean[:, : w // 2] = [0.2, 0.4, 0.1]
        clean[:, w // 2:] = [0.7, 0.3, 0.6]
        albedo = clean.copy()
        normal = np.zeros((h, w, 3), np.float32)
        normal[..., 2] = 1.0
        noisy = clean + rng.normal(0, 0.15, clean.shape).astype(np.float32)
        return clean, noisy, albedo, normal

    def test_reduces_noise(self):
        clean, noisy, albedo, normal = self._noisy_scene()
        out = np.asarray(dn.nlm_denoise(jnp.asarray(noisy),
                                        jnp.asarray(albedo),
                                        jnp.asarray(normal)))
        err_in = np.mean((noisy - clean) ** 2)
        err_out = np.mean((out - clean) ** 2)
        assert err_out < err_in * 0.3, (err_in, err_out)

    def test_preserves_feature_edges(self):
        clean, noisy, albedo, normal = self._noisy_scene()
        out = np.asarray(dn.nlm_denoise(jnp.asarray(noisy),
                                        jnp.asarray(albedo),
                                        jnp.asarray(normal)))
        h, w = clean.shape[:2]
        # the albedo edge at w/2 must survive denoising
        left = out[:, w // 2 - 4:w // 2 - 1].mean((0, 1))
        right = out[:, w // 2 + 1:w // 2 + 4].mean((0, 1))
        assert abs(left[0] - 0.2) < 0.1
        assert abs(right[0] - 0.7) < 0.1

    def test_box_filter(self):
        x = jnp.zeros((9, 9, 1)).at[4, 4, 0].set(1.0)
        y = np.asarray(dn._box_filter(x, 1))
        np.testing.assert_allclose(y[3:6, 3:6, 0], 1.0 / 9.0, atol=1e-6)
        np.testing.assert_allclose(y[0, 0, 0], 0.0, atol=1e-6)

    def test_session_denoise(self):
        from raytracingproject_tpu.app import examples
        from raytracingproject_tpu.session import Session, SessionParams
        from raytracingproject_tpu.models import film as fm
        scene = examples.cornell_box(24, 24, spp=4)
        scene.film.set_passes([fm.PASS_COMBINED, fm.PASS_DEPTH,
                               fm.PASS_DENOISING_NORMAL,
                               fm.PASS_DENOISING_ALBEDO])
        sess = Session(scene, SessionParams(samples=4))
        sess.reset()
        noisy = sess.render()
        out = sess.denoise()
        assert out.shape == noisy.shape
        assert np.isfinite(out).all()
        # denoised image is smoother (lower total variation)
        def tv(i):
            return np.abs(np.diff(i[..., :3], axis=0)).mean() \
                + np.abs(np.diff(i[..., :3], axis=1)).mean()
        assert tv(out) < tv(noisy)


class TestTemporal:
    def test_cross_frame_beats_single_frame(self):
        rng = np.random.default_rng(5)
        clean = np.zeros((32, 32, 3), np.float32)
        clean[8:24, 8:24] = (0.8, 0.5, 0.2)
        frames = [clean + rng.normal(0, 0.15, clean.shape
                                     ).astype(np.float32)
                  for _ in range(3)]
        single = np.asarray(dn.nlm_denoise(frames[1], search_radius=3))
        multi = np.asarray(dn.nlm_denoise_temporal(
            frames, 1, search_radius=3))
        e1 = float(((single - clean) ** 2).mean())
        e3 = float(((multi - clean) ** 2).mean())
        assert e3 < e1 * 0.9   # edge bias floors the global MSE gain...
        # ...but in the flat interior (pure noise, no bias) the extra
        # frames cut the residual hard
        f1 = float(((single - clean)[12:20, 12:20] ** 2).mean())
        f3 = float(((multi - clean)[12:20, 12:20] ** 2).mean())
        assert f3 < f1 * 0.6
        e0 = float(((frames[1] - clean) ** 2).mean())
        assert e3 < e0 * 0.6   # global (edge-bias-limited)
        f0 = float(((frames[1] - clean)[12:20, 12:20] ** 2).mean())
        assert f3 < f0 * 0.1   # flat region: order-of-magnitude


class TestTileDenoise:
    def test_per_tile_matches_whole_frame_interior(self):
        from raytracingproject_tpu.app import examples
        from raytracingproject_tpu.session import Session, SessionParams
        from raytracingproject_tpu.models import film as fm
        scene = examples.cornell_box(32, 32, spp=4)
        scene.film.set_passes([fm.PASS_COMBINED, fm.PASS_DEPTH,
                               fm.PASS_NORMAL])
        sess = Session(scene, SessionParams(samples=4))
        sess.reset()
        sess.render()
        whole = sess.denoise().copy()
        sess._denoised = None
        tiles = sess.progress.finished_tiles if hasattr(
            sess.progress, "finished_tiles") else None
        for ty in (0, 16):
            for tx in (0, 16):
                sess.denoise_tile(tx, ty, 16, 16, overscan=16)
        tiled = sess._denoised
        # with overscan >= the NLM search+patch window, per-tile output
        # matches the whole-frame result away from the frame border
        np.testing.assert_allclose(tiled[8:24, 8:24],
                                   whole[8:24, 8:24], atol=2e-3)


class TestHeterogeneousOffload:
    """Parallelism strategy 7: denoise pinned to a secondary device so
    the filter overlaps the next render chunk (ops/denoise.py
    pick_denoise_device; conftest gives 8 virtual CPU devices)."""

    def test_picks_secondary_device(self):
        import jax
        from raytracingproject_tpu.ops import denoise as dn
        dev = dn.pick_denoise_device()
        assert dev is not None
        assert dev == jax.devices()[-1]
        assert dev != jax.devices()[0]

    def test_pinned_result_matches_local(self):
        import jax
        import numpy as np
        from raytracingproject_tpu.ops import denoise as dn
        rng = np.random.default_rng(0)
        img = np.abs(rng.standard_normal((24, 24, 4))).astype(np.float32)
        local = dn.denoise_buffers(img)
        pinned = dn.denoise_buffers(img, device=jax.devices()[-1])
        np.testing.assert_allclose(local, pinned, atol=1e-6)

    def test_nonblocking_returns_inflight_device_array(self):
        import jax
        import numpy as np
        from raytracingproject_tpu.ops import denoise as dn
        rng = np.random.default_rng(1)
        img = np.abs(rng.standard_normal((24, 24, 4))).astype(np.float32)
        dev = jax.devices()[-1]
        out = dn.denoise_buffers(img, device=dev, block=False)
        assert list(out.devices()) == [dev]
        ref = dn.denoise_buffers(img, device=None)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)

    def test_session_denoise_uses_offload_device(self, monkeypatch):
        import jax
        import numpy as np
        from raytracingproject_tpu.app import examples
        from raytracingproject_tpu.session.session import (Session,
                                                           SessionParams)
        from raytracingproject_tpu.ops import denoise as dn
        scene = examples.cornell_box(16, 16, spp=2)
        sess = Session(scene, SessionParams(samples=2))
        sess.reset()
        sess.render()
        seen = {}
        orig = dn.denoise_buffers

        def spy(*a, **kw):
            seen["device"] = kw.get("device")
            return orig(*a, **kw)

        monkeypatch.setattr(dn, "denoise_buffers", spy)
        out = sess.denoise()
        assert seen["device"] == jax.devices()[-1]
        assert np.isfinite(out).all()
        # opt-out pins nothing
        sess.params.denoise_offload = False
        sess.denoise()
        assert seen["device"] is None

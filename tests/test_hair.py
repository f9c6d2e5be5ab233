"""Hair/curve tests (ref category: hair; geometry ref: render/hair.h)."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracingproject_tpu.models.mesh import Hair
from raytracingproject_tpu.models import Object
from raytracingproject_tpu.app import examples
from raytracingproject_tpu.ops import integrator as integ


def make_hair_patch(n_strands=24, seed=0):
    rng = np.random.default_rng(seed)
    hair = Hair("strands")
    for i in range(n_strands):
        x0 = rng.uniform(100, 456)
        y0 = rng.uniform(150, 400)
        nk = 6
        zs = np.linspace(0, 140, nk)
        xs = x0 + np.cumsum(rng.normal(0, 6, nk))
        ys = y0 + np.cumsum(rng.normal(0, 6, nk))
        keys = np.stack([xs, ys, zs], -1)
        hair.add_curve(keys, radius=np.linspace(3.0, 0.6, nk))
    return hair


class TestHair:
    def test_tessellation(self):
        hair = make_hair_patch(8)
        m = hair.tessellate_ribbons()
        assert m.num_triangles == 8 * (6 - 1) * 2
        # ribbons are thin: bounds match the curve bounds closely
        hlo, hhi = hair.compute_bounds()
        mlo, mhi = m.compute_bounds()
        assert (mlo >= hlo - 1e-3).all() and (mhi <= hhi + 1e-3).all()
        uv = m.attribute_get("std_uv")
        assert uv is not None and uv.element == "corner"

    def test_hair_renders_in_cornell(self):
        scene = examples.cornell_box(24, 24, spp=4)
        hair = make_hair_patch(16)
        hair.used_shaders = [examples.diffuse_shader("hairmat",
                                                     (0.4, 0.25, 0.1))]
        scene.add_shader(hair.used_shaders[0])
        scene.add_object(Object("hair", hair))
        scene.device_update()
        kg = scene.make_kernel_globals()
        w = h = 24
        yy, xx = np.mgrid[0:h, 0:w]
        px = jnp.asarray(xx.reshape(-1), jnp.int32)
        py = jnp.asarray(yy.reshape(-1), jnp.int32)
        out = jax.jit(lambda a, b, c: integ.render_samples(
            kg, a, b, c, 0, 4))(px, py, py * w + px)
        img = np.asarray(out[0]).reshape(h, w, 3) / 4
        assert np.isfinite(img).all()
        assert img.mean() > 0.01


class TestPrincipledHairModel:
    """BSDF-level validation of ops/hair.py (Chiang et al. 2016)."""

    def _setup(self, n, beta_m=0.3, beta_n=0.3, sigma=0.0, seed=0):
        from raytracingproject_tpu.ops import hair as hops
        rng = np.random.default_rng(seed)
        T = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (n, 3))
        Z = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
        h = jnp.asarray(rng.uniform(-0.95, 0.95, n), jnp.float32)
        wo = np.stack([rng.uniform(-0.9, 0.9, n),
                       rng.uniform(0.1, 1.0, n),
                       rng.uniform(-1.0, 1.0, n)], -1)
        wo = jnp.asarray(wo / np.linalg.norm(wo, axis=-1, keepdims=True),
                         jnp.float32)
        sig = jnp.full((n, 3), sigma, jnp.float32)
        v = hops.roughness_to_v(jnp.full((n,), beta_m, jnp.float32))
        s = hops.roughness_to_s(jnp.full((n,), beta_n, jnp.float32))
        al = jnp.zeros((n,), jnp.float32)
        eta = jnp.full((n,), 1.55, jnp.float32)
        return hops, T, Z, h, wo, sig, v, s, al, eta

    def test_white_furnace_energy(self):
        """sigma_a = 0: E[f_cos/pdf] over sampled directions == 1 for
        any roughness (attenuations telescope exactly; paper sec. 4)."""
        n = 40000
        rng = np.random.default_rng(3)
        for bm, bn in ((0.1, 0.3), (0.3, 0.3), (0.6, 0.8)):
            hops, T, Z, h, wo, sig, v, s, al, eta = self._setup(
                n, bm, bn, sigma=0.0)
            u1 = jnp.asarray(rng.random(n), jnp.float32)
            u2 = jnp.asarray(rng.random(n), jnp.float32)
            wi, f, pdf, valid = hops.hair_sample(T, Z, h, wo, u1, u2,
                                                 sig, v, s, al, eta)
            est = np.asarray(jnp.where(valid, jnp.mean(f, -1)
                                       / jnp.maximum(pdf, 1e-12), 0.0))
            ok = np.asarray(valid)
            assert ok.mean() > 0.99
            e = est[ok].mean()
            assert abs(e - 1.0) < 0.03, (bm, bn, e)

    def test_absorption_darkens(self):
        """Pigment absorption reduces the sampled albedo below 1."""
        n = 20000
        rng = np.random.default_rng(4)
        hops, T, Z, h, wo, sig, v, s, al, eta = self._setup(
            n, 0.3, 0.3, sigma=0.5)
        u1 = jnp.asarray(rng.random(n), jnp.float32)
        u2 = jnp.asarray(rng.random(n), jnp.float32)
        wi, f, pdf, valid = hops.hair_sample(T, Z, h, wo, u1, u2,
                                             sig, v, s, al, eta)
        est = np.asarray(jnp.where(valid, jnp.mean(f, -1)
                                   / jnp.maximum(pdf, 1e-12), 0.0))
        e = est[np.asarray(valid)].mean()
        assert 0.1 < e < 0.9, e

    def test_eval_matches_at_sampled_direction(self):
        """hair_sample's (f, pdf) must equal hair_eval at the returned
        direction (they share the code path; guards regressions)."""
        n = 1000
        rng = np.random.default_rng(5)
        hops, T, Z, h, wo, sig, v, s, al, eta = self._setup(n, 0.4, 0.4)
        u1 = jnp.asarray(rng.random(n), jnp.float32)
        u2 = jnp.asarray(rng.random(n), jnp.float32)
        wi, f, pdf, valid = hops.hair_sample(T, Z, h, wo, u1, u2,
                                             sig, v, s, al, eta)
        f2, pdf2 = hops.hair_eval(T, Z, h, wo, wi, sig, v, s, al, eta)
        np.testing.assert_allclose(np.asarray(f), np.asarray(f2),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2),
                                   rtol=1e-4, atol=1e-6)

    def test_longitudinal_normalization(self):
        """int Mp(theta_i) cos(theta_i) dtheta_i == 1 (the property the
        furnace relies on)."""
        from raytracingproject_tpu.ops import hair as hops
        th = np.linspace(-np.pi / 2 + 1e-4, np.pi / 2 - 1e-4, 4001)
        for v in (0.02, 0.1, 0.5, 1.0):
            for sto in (0.0, 0.5, -0.8):
                cto = np.sqrt(1 - sto * sto)
                mp = np.asarray(hops._mp(
                    jnp.asarray(np.cos(th), jnp.float32),
                    jnp.float32(cto),
                    jnp.asarray(np.sin(th), jnp.float32),
                    jnp.float32(sto), jnp.float32(v)))
                integral = np.trapezoid(mp * np.cos(th), th)
                assert abs(integral - 1.0) < 0.02, (v, sto, integral)


class TestPrincipledHairRender:
    def test_hair_furnace(self):
        """Non-absorbing principled hair in a unit furnace renders 1:
        end-to-end check of the tangent plumbing + hair lobe pick +
        sample/eval/pdf consistency inside the integrator."""
        scene = examples.hair_patch_scene(20, 20, spp=16, n_strands=60,
                                          furnace=True)
        scene.device_update()
        kg = scene.make_kernel_globals()
        assert kg["features"]["has_hair"]
        w = h = 20
        yy, xx = np.mgrid[0:h, 0:w]
        px = jnp.asarray(xx.reshape(-1), jnp.int32)
        py = jnp.asarray(yy.reshape(-1), jnp.int32)
        out = jax.jit(lambda a, b, c: integ.render_samples(
            kg, a, b, c, 0, 48))(px, py, py * w + px)
        img = np.asarray(out[0]).reshape(h, w, 3) / 48
        assert np.isfinite(img).all()
        assert abs(float(img.mean()) - 1.0) < 0.035, img.mean()

    def test_hair_demo_renders(self):
        """Lit brown-hair patch: finite, non-black, and pigmented
        (red channel above blue, as melanin absorption dictates)."""
        scene = examples.hair_patch_scene(24, 24, spp=8)
        scene.device_update()
        kg = scene.make_kernel_globals()
        w = h = 24
        yy, xx = np.mgrid[0:h, 0:w]
        px = jnp.asarray(xx.reshape(-1), jnp.int32)
        py = jnp.asarray(yy.reshape(-1), jnp.int32)
        out = jax.jit(lambda a, b, c: integ.render_samples(
            kg, a, b, c, 0, 8))(px, py, py * w + px)
        img = np.asarray(out[0]).reshape(h, w, 3) / 8
        assert np.isfinite(img).all()
        assert img.mean() > 0.005
        # hair pixels (bright-ish) carry melanin tint: R > B
        mask = img.mean(-1) > np.percentile(img.mean(-1), 70)
        assert img[mask, 0].mean() > img[mask, 2].mean()

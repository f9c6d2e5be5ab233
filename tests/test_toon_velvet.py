"""Toon + velvet closure tests (ref: kernel/closure/bsdf_toon.h,
bsdf_ashikhmin_velvet.h; nodes render/nodes.h Toon/VelvetBsdfNode).

Correctness style: MC pdf-normalization and sample/eval consistency on
the raw closure stack, plus a toon white furnace (the toon lobe is
normalized so its hemispherical albedo equals its weight, so a
unit-weight toon sphere in a unit furnace must render 1.0)."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracingproject_tpu.app import examples
from raytracingproject_tpu.models import Object
from raytracingproject_tpu.models.mesh import make_sphere_mesh
from raytracingproject_tpu.ops import bsdf as bsdf_ops
from raytracingproject_tpu.ops import closures as cl
from raytracingproject_tpu.utils import math as um


def _closure(n, **kv):
    c = cl.empty_closures((n,))
    for k, v in kv.items():
        val = jnp.asarray(v, jnp.float32)
        c[k] = jnp.broadcast_to(val, c[k].shape)
    return c


def _frame(n, seed=0):
    N = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    I = jnp.broadcast_to(um.normalize(jnp.asarray([0.35, 0.1, 0.93])),
                         (n, 3))
    rng = np.random.default_rng(seed)
    u = [jnp.asarray(rng.random(n).astype(np.float32)) for _ in range(3)]
    return N, I, u


FEAT = {"has_toon": True, "has_sheen": True, "has_glossy": False,
        "has_refraction": False, "has_transparent": False}


class TestPdfNormalization:
    def test_toon_mixture_pdf_integrates_to_one(self):
        """Uniform-sphere MC of the mixture pdf must be ~1 (all lobes
        here are finite, so total pick probability is 1)."""
        n = 200_000
        c = _closure(n, toon_diffuse=(0.4, 0.4, 0.4),
                     toon_diffuse_size=0.35, toon_diffuse_smooth=0.3,
                     toon_glossy=(0.3, 0.3, 0.3), toon_glossy_size=0.2,
                     toon_glossy_smooth=0.1, sheen=(0.3, 0.3, 0.3),
                     sheen_sigma=0.8)
        N, I, _ = _frame(n)
        rng = np.random.default_rng(1)
        z = rng.uniform(-1, 1, n)
        phi = rng.uniform(0, 2 * np.pi, n)
        s = np.sqrt(1 - z * z)
        wi = jnp.asarray(np.stack([s * np.cos(phi), s * np.sin(phi), z],
                                  -1).astype(np.float32))
        _, pdf = bsdf_ops.bsdf_eval(c, N, I, wi, features=FEAT)
        integral = float(jnp.mean(pdf)) * 4 * np.pi
        assert abs(integral - 1.0) < 0.03, integral

    def test_toon_albedo_equals_weight(self):
        """E[f_cos/pdf] over bsdf sampling = hemispherical albedo; the
        toon normalization makes it equal the lobe weight."""
        n = 200_000
        for size, smooth in [(0.5, 0.0), (0.2, 0.4), (0.9, 0.2)]:
            c = _closure(n, toon_diffuse=(0.75, 0.75, 0.75),
                         toon_diffuse_size=size,
                         toon_diffuse_smooth=smooth)
            N, I, u = _frame(n)
            out = bsdf_ops.bsdf_sample(c, N, N, I, u[0], u[1], u[2],
                                       features=FEAT)
            w = jnp.where(out["valid"][:, None],
                          out["f_cos"] / jnp.maximum(
                              out["pdf"][:, None], 1e-12), 0.0)
            albedo = float(jnp.mean(w[:, 0]))
            assert abs(albedo - 0.75) < 0.02, (size, smooth, albedo)

    def test_velvet_albedo_below_one(self):
        n = 100_000
        c = _closure(n, sheen=(1.0, 1.0, 1.0), sheen_sigma=1.0)
        N, I, u = _frame(n)
        out = bsdf_ops.bsdf_sample(c, N, N, I, u[0], u[1], u[2],
                                   features=FEAT)
        w = jnp.where(out["valid"][:, None],
                      out["f_cos"] / jnp.maximum(out["pdf"][:, None],
                                                 1e-12), 0.0)
        albedo = float(jnp.mean(w[:, 0]))
        assert 0.02 < albedo < 1.0, albedo


class TestSampleEvalConsistency:
    def test_sampled_f_pdf_match_eval(self):
        n = 4096
        c = _closure(n, toon_diffuse=(0.3, 0.3, 0.3),
                     toon_diffuse_size=0.4, toon_diffuse_smooth=0.2,
                     toon_glossy=(0.4, 0.2, 0.1), toon_glossy_size=0.25,
                     toon_glossy_smooth=0.05, sheen=(0.2, 0.25, 0.3),
                     sheen_sigma=0.6, diffuse=(0.1, 0.1, 0.1))
        N, I, u = _frame(n, seed=3)
        out = bsdf_ops.bsdf_sample(c, N, N, I, u[0], u[1], u[2],
                                   features=FEAT)
        f2, pdf2 = bsdf_ops.bsdf_eval(c, N, I, out["omega"],
                                      features=FEAT)
        ok = np.asarray(out["valid"])
        np.testing.assert_allclose(np.asarray(out["pdf"])[ok],
                                   np.asarray(pdf2)[ok], rtol=1e-4)
        np.testing.assert_allclose(np.asarray(out["f_cos"])[ok],
                                   np.asarray(f2)[ok], rtol=1e-4,
                                   atol=1e-7)

    def test_toon_glossy_peaks_at_mirror(self):
        n = 1
        c = _closure(n, toon_glossy=(1.0, 1.0, 1.0),
                     toon_glossy_size=0.15, toon_glossy_smooth=0.0)
        N = jnp.asarray([[0.0, 0.0, 1.0]])
        I = um.normalize(jnp.asarray([[0.5, 0.0, 0.8]]))
        mirror = um.normalize(jnp.asarray([[-0.5, 0.0, 0.8]]))
        away = um.normalize(jnp.asarray([[0.0, 0.7, 0.7]]))
        f_m, _ = bsdf_ops.bsdf_eval(c, N, I, mirror, features=FEAT)
        f_a, _ = bsdf_ops.bsdf_eval(c, N, I, away, features=FEAT)
        assert float(f_m[0, 0]) > 0.0
        assert float(f_a[0, 0]) == 0.0


class TestToonFurnace:
    def test_toon_white_furnace(self):
        """Unit-weight toon sphere in a unit furnace renders 1.0 —
        exercises the node -> closure -> sample/eval/MIS chain."""
        from tests.test_render import render
        scene = examples.furnace_scene(24, 24, albedo=1.0, bounces=16)
        mat = examples.toon_shader("toon", (1.0, 1.0, 1.0),
                                   size=0.6, smooth=0.3)
        sph = make_sphere_mesh((0, 0, 0), 1.0, 0, nlat=16, nlon=32)
        sph.set("smooth", np.ones(sph.num_triangles, bool))
        sph.used_shaders = [mat]
        scene.objects = []
        scene.add_shader(mat)
        scene.add_object(Object("toon_sphere", sph))
        img, _ = render(scene, 24, 24, spp=32)
        assert np.isfinite(img).all()
        assert abs(float(img.mean()) - 1.0) < 0.02, img.mean()

    def test_velvet_renders_dimmer_than_furnace(self):
        from tests.test_render import render
        scene = examples.furnace_scene(24, 24, albedo=1.0, bounces=12)
        mat = examples.velvet_shader("velvet", (1.0, 1.0, 1.0), sigma=1.0)
        sph = make_sphere_mesh((0, 0, 0), 1.0, 0, nlat=16, nlon=32)
        sph.set("smooth", np.ones(sph.num_triangles, bool))
        sph.used_shaders = [mat]
        scene.objects = []
        scene.add_shader(mat)
        scene.add_object(Object("velvet_sphere", sph))
        img, _ = render(scene, 24, 24, spp=24)
        assert np.isfinite(img).all()
        center = img[9:15, 9:15]
        # velvet absorbs (albedo < 1) but still reflects visibly
        assert 0.05 < float(center.mean()) < 0.98

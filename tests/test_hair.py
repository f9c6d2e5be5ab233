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

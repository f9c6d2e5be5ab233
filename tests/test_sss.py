"""Random-walk subsurface scattering tests (ref category: sss;
kernel_subsurface.h random walk semantics)."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracingproject_tpu.app import examples
from raytracingproject_tpu.ops import integrator as integ


def render(scene, w, h, spp):
    scene.device_update()
    kg = scene.make_kernel_globals()
    yy, xx = np.mgrid[0:h, 0:w]
    px = jnp.asarray(xx.reshape(-1), jnp.int32)
    py = jnp.asarray(yy.reshape(-1), jnp.int32)
    out = jax.jit(lambda a, b, c: integ.render_samples(
        kg, a, b, c, 0, spp))(px, py, py * w + px)
    return np.asarray(out[0]).reshape(h, w, 3) / spp


class TestSSS:
    def test_sss_furnace(self):
        """Unit-albedo walk conserves energy (value 1 everywhere)."""
        scene = examples.sss_furnace(20, 20, albedo=1.0, radius=0.3)
        img = render(scene, 20, 20, spp=48)
        assert np.isfinite(img).all()
        assert abs(float(img.mean()) - 1.0) < 0.04, img.mean()
        center = img[8:12, 8:12]
        assert abs(float(center.mean()) - 1.0) < 0.08, center.mean()

    def test_sss_color_absorbs(self):
        scene = examples.sss_furnace(16, 16, albedo=0.5, radius=0.3)
        img = render(scene, 16, 16, spp=24)
        center = img[6:10, 6:10]
        assert 0.1 < float(center.mean()) < 0.9

    def test_sss_cornell_renders(self):
        scene = examples.sss_cornell(24, 24, spp=6)
        img = render(scene, 24, 24, 6)
        assert np.isfinite(img).all()
        assert img.mean() > 0.01
        # the sss sphere region shows the reddish wax tint
        mid = img[10:16, 8:16]
        assert mid[..., 0].mean() > mid[..., 2].mean()

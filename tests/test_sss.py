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


class TestBurley:
    def _furnace_mean(self, albedo, falloff, spp=48, radius=0.15):
        scene = examples.sss_furnace(16, 16, albedo=albedo, radius=radius)
        node = next(n for sh in scene.shaders for n in sh.graph.nodes
                    if n.NODE_NAME == "subsurface_scattering")
        node.set("falloff", falloff)
        img = render(scene, 16, 16, spp)
        return float(img[5:11, 5:11].mean())

    def test_remap_formula_values(self):
        """Christensen-Burley albedo inversion fit (ref:
        kernel_subsurface.h remap): spot-check known values."""
        def alpha(A):
            return 1.0 - np.exp(A * (-5.09406 + A * (2.61188
                                                     - 4.31805 * A)))

        def s(A):
            return 1.9 - A + 3.5 * (A - 0.8) ** 2

        assert 0.99 < alpha(0.999) <= 1.0
        assert 0.89 < alpha(0.5) < 0.93
        assert abs(s(0.8) - 1.1) < 1e-6
        # monotone: more diffusion albedo -> more single-scatter albedo
        A = np.linspace(0.05, 0.99, 50)
        assert (np.diff(alpha(A)) > 0).all()

    def test_burley_walk_darkens_with_albedo(self):
        """The walk's per-scatter absorption responds monotonically to
        the requested diffusion albedo (exact A recovery would need a
        semi-infinite slab; a finite sphere transmits extra light)."""
        m25 = self._furnace_mean(0.25, "burley")
        m60 = self._furnace_mean(0.6, "burley")
        m100 = self._furnace_mean(1.0, "burley")
        assert m25 < m60 - 0.05 < m100 - 0.10
        assert m100 > 0.9              # alpha(1) ~ 0.999: near-lossless
        assert m25 < 0.6               # heavy absorption engages

    def test_burley_vs_entry_color_walk(self):
        """Burley saturates color differently from the entry-color walk
        but stays in the same energy ballpark for mid albedos."""
        m_b = self._furnace_mean(0.6, "burley")
        m_rw = self._furnace_mean(0.6, "random_walk")
        assert abs(m_b - m_rw) < 0.3
        assert m_b > m_rw  # finite-thickness transmission bonus

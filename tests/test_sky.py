"""Nishita physical sky tests (capability ref: render/nodes.cpp:708-745
SkyTextureNode type='nishita' + kernel/svm/svm_sky.h — independent
single-scattering implementation, utils/sky.py)."""

import numpy as np
import jax.numpy as jnp

from raytracingproject_tpu.utils import sky
from raytracingproject_tpu.models import Scene, Light, Shader, ShaderGraph
from raytracingproject_tpu.models import shader_nodes as sn
from raytracingproject_tpu.utils import transform as tfm


def _dir(elev_deg, azim_deg=0.0):
    e, a = np.radians(elev_deg), np.radians(azim_deg)
    return np.array([np.cos(e) * np.cos(a), np.cos(e) * np.sin(a),
                     np.sin(e)])


class TestSkyPhysics:
    def test_zenith_is_blue_high_sun(self):
        L = sky.sky_radiance(_dir(90.0), sun_dir=_dir(60.0))
        assert np.all(L > 0)
        assert L[2] > L[0], L  # B > R: Rayleigh scattering

    def test_sunset_is_red_toward_sun(self):
        # near the sun at 2 degrees elevation the transmitted+scattered
        # light has traversed a long air path: R must beat B
        L = sky.sky_radiance(_dir(2.0), sun_dir=_dir(2.0))
        assert L[0] > L[2], L

    def test_earth_shadow_darkens_antisolar_horizon(self):
        near_sun = sky.sky_radiance(_dir(5.0, 0.0), sun_dir=_dir(3.0))
        anti_sun = sky.sky_radiance(_dir(5.0, 180.0), sun_dir=_dir(3.0))
        assert near_sun.sum() > 2 * anti_sun.sum()

    def test_altitude_thins_atmosphere(self):
        lo = sky.sky_radiance(_dir(90.0), sun_dir=_dir(60.0))
        hi = sky.sky_radiance(_dir(90.0), sun_dir=_dir(60.0),
                              altitude=40e3)
        assert hi.sum() < 0.25 * lo.sum()

    def test_dust_brightens_solar_aureole(self):
        clear = sky.sky_radiance(_dir(32.0), sun_dir=_dir(30.0), dust=0.2)
        hazy = sky.sky_radiance(_dir(32.0), sun_dir=_dir(30.0), dust=4.0)
        assert hazy.sum() > clear.sum()

    def test_sun_transmittance_redder_at_horizon(self):
        high = sky.sun_radiance(_dir(60.0))
        low = sky.sun_radiance(_dir(1.0))
        assert low[0] / low[2] > high[0] / high[2]
        assert low.sum() < high.sum()

    def test_image_finite_and_disc_energy(self):
        img = sky.sky_image(128, 64, sun_dir=_dir(30.0), sun_disc=False)
        assert np.isfinite(img).all() and (img >= 0).all()
        img_d = sky.sky_image(128, 64, sun_dir=_dir(30.0), sun_disc=True)
        # the disc splat adds exactly L_sun * disc_sa of irradiance
        dif = (img_d - img)[..., :3]
        py, px = np.unravel_index(np.argmax(dif.sum(-1)), dif.shape[:2])
        v = (py + 0.5) / 64
        pix_sa = (2 * np.pi / 128) * (np.pi / 64) \
            * np.cos(np.pi * (v - 0.5))
        added = dif[py, px] * pix_sa
        disc_sa = 2 * np.pi * (1 - np.cos(np.radians(0.545) / 2))
        want = sky.sun_radiance(_dir(30.0)) * disc_sa
        np.testing.assert_allclose(added, want, rtol=0.15)


class TestSkyNode:
    def _scene(self, **params):
        scene = Scene()
        scene.camera.set("matrix",
                         tfm.look_at((0, 0, 1), (0, 1, 1), (0, 0, 1)))
        scene.camera.set("width", 8)
        scene.camera.set("height", 8)
        g = ShaderGraph()
        t = g.add(sn.SkyTextureNode("sky", sky_type="nishita", **params))
        b = g.add(sn.BackgroundNode("bg", strength=1.0))
        g.connect(t, "color", b, "color")
        g.connect(b, "background", g.output_node, "surface")
        scene.background.shader = Shader("bg", g)
        scene.add_light(Light("bg", light_type="background"))
        return scene, t

    def test_bake_registers_texture_and_renders(self):
        scene, node = self._scene(sun_elevation=float(np.radians(30.0)))
        scene.device_update()
        assert node.slot >= 0
        h, w = scene.image_manager.images[node.slot].shape[:2]
        assert (h, w) == (256, 512)
        # eval through the graph matches a direct bake sample
        from raytracingproject_tpu.ops import shade as shade_ops
        kg = scene.make_kernel_globals()
        d = jnp.asarray(_dir(45.0, 90.0)[None, :], jnp.float32)
        L = shade_ops.eval_background(
            kg["shaders"], kg["background_shader"], d,
            textures=kg["textures"])
        Lr = sky.sky_radiance(np.asarray(d[0]),
                              sun_dir=node.nishita_sun_direction())
        np.testing.assert_allclose(np.asarray(L)[0], Lr, rtol=0.15,
                                   atol=1e-4)

    def test_resync_does_not_duplicate_images(self):
        scene, node = self._scene()
        scene.device_update()
        n0 = len(scene.image_manager.images)
        scene.device_update()
        assert len(scene.image_manager.images) == n0
        # parameter change re-bakes IN PLACE (a fresh slot per edit
        # would grow the packed texture array without bound on
        # interactive re-syncs)
        img_before = np.asarray(scene.image_manager.images[node.slot])
        node.set("sun_elevation", float(np.radians(5.0)))
        scene.device_update()
        assert len(scene.image_manager.images) == n0
        img_after = np.asarray(scene.image_manager.images[node.slot])
        assert not np.allclose(img_before, img_after)

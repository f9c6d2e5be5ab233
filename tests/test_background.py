"""Background importance map tests (ref: light.cpp:530-700,
kernel_light.h background light sampling)."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracingproject_tpu.app import examples
from raytracingproject_tpu.models import Scene, Light, Object, Shader, ShaderGraph
from raytracingproject_tpu.models import shader_nodes as sn
from raytracingproject_tpu.models.mesh import make_plane_mesh
from raytracingproject_tpu.ops import integrator as integ
from raytracingproject_tpu.ops import light as light_ops
from raytracingproject_tpu.utils import transform as tfm


def env_scene(width=24, height=24):
    """Diffuse plane under an env map with one bright region (fake sun)."""
    scene = Scene()
    scene.camera.set("matrix", tfm.look_at((0, -8, 3), (0, 0, 0), (0, 0, 1)))
    scene.camera.set("fov", 0.8)
    scene.camera.set("width", width)
    scene.camera.set("height", height)
    img = np.full((64, 128, 3), 0.02, np.float32)
    img[8:12, 60:68] = 200.0  # small bright "sun" high in the sky
    g = ShaderGraph()
    t = g.add(sn.EnvironmentTextureNode("env", image=img))
    b = g.add(sn.BackgroundNode("bg", strength=1.0))
    g.connect(t, "color", b, "color")
    g.connect(b, "background", g.output_node, "surface")
    scene.background.shader = Shader("bg", g)
    plane = make_plane_mesh((-4, -4, 0), (8, 0, 0), (0, 8, 0))
    plane.used_shaders = [examples.diffuse_shader("ground", (0.8, 0.8, 0.8))]
    scene.add_shader(plane.used_shaders[0])
    scene.add_object(Object("ground", plane))
    scene.add_light(Light("bg", light_type="background"))
    scene.integrator.set("max_bounce", 2)
    return scene


class TestBackgroundMap:
    def test_map_built(self):
        scene = env_scene()
        scene.device_update()
        arrs = scene.dscene["arrays"]
        assert arrs["bg_pdf_map"].shape[0] > 1
        # pdf integrates to ~1 over the sphere
        h, w = arrs["bg_pdf_map"].shape
        v = (np.arange(h) + 0.5) / h
        sin_t = np.cos(np.pi * (v - 0.5))
        domega = (2 * np.pi / w) * (np.pi / h) * sin_t[:, None]
        total = (arrs["bg_pdf_map"] * domega).sum()
        assert abs(total - 1.0) < 0.05, total

    def test_sampling_hits_bright_region(self):
        scene = env_scene()
        scene.device_update()
        kg = scene.make_kernel_globals()
        ds = kg["dscene"]
        n = 4096
        rng = np.random.default_rng(0)
        P = jnp.zeros((n, 3), jnp.float32)
        ls = jax.jit(lambda a, b, c: light_ops.sample_light(
            ds, P, a, b, c))(
                jnp.asarray(rng.random(n), jnp.float32),
                jnp.asarray(rng.random(n), jnp.float32),
                jnp.asarray(rng.random(n), jnp.float32))
        D = np.asarray(ls["D"])
        pdf = np.asarray(ls["pdf"])
        # importance sampling concentrates on the sun region: the sun
        # texels sit at rows 8-12 of 64 -> v ~ 0.84 -> z ~ +0.87
        frac_up = (D[:, 2] > 0.8).mean()
        assert frac_up > 0.5, frac_up
        assert np.isfinite(pdf).all() and (pdf > 0).mean() > 0.9

    def test_render_converges(self):
        scene = env_scene()
        scene.device_update()
        kg = scene.make_kernel_globals()
        w = h = 24
        yy, xx = np.mgrid[0:h, 0:w]
        px = jnp.asarray(xx.reshape(-1), jnp.int32)
        py = jnp.asarray(yy.reshape(-1), jnp.int32)
        out = jax.jit(lambda a, b, c: integ.render_samples(
            kg, a, b, c, 0, 16))(px, py, py * w + px)
        img = np.asarray(out[0]).reshape(h, w, 3) / 16
        assert np.isfinite(img).all()
        # ground plane is lit by the sun (bottom half of the frame)
        ground = img[:10]
        assert ground.mean() > 0.05
        # low relative noise thanks to importance sampling: the plane is
        # flat + uniformly lit -> pixel stddev well below the mean
        # (select plane pixels by brightness; region crosses the horizon)
        plane_px = img[..., 0][img[..., 0] > 0.5]
        assert len(plane_px) > 20
        assert plane_px.std() / plane_px.mean() < 0.5

"""Particle system tests (ref: render/particles.cpp,
kernel/kernel_types.h:1551 KernelParticle, svm_particle_info.h)."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracingproject_tpu.app import examples
from raytracingproject_tpu.models import Scene, Object, Shader, ShaderGraph
from raytracingproject_tpu.models import shader_nodes as sn
from raytracingproject_tpu.models.particles import ParticleSystem
from raytracingproject_tpu.models.mesh import make_sphere_mesh
from raytracingproject_tpu.ops import lookup as lk
from raytracingproject_tpu.utils import transform as tfm


def particle_scene(n_particles=3):
    scene = Scene()
    scene.camera.set("matrix",
                     tfm.look_at((0, -10, 0), (0, 0, 0), (0, 0, 1)))
    scene.camera.set("width", 48)
    scene.camera.set("height", 24)
    ps = ParticleSystem("ps")
    locs = np.array([[-3.0 + 3.0 * i, 0.0, 0.0]
                     for i in range(n_particles)], np.float32)
    ps.set("location", locs)
    ps.set("velocity", np.tile([0.0, 0.0, 2.0], (n_particles, 1)))
    ps.set("age", np.arange(n_particles, dtype=np.float32))
    ps.set("lifetime", np.full(n_particles, 10.0, np.float32))
    ps.set("size", np.linspace(0.5, 1.5, n_particles).astype(np.float32))

    # emission driven by particle age -> each instance a distinct color
    g = ShaderGraph()
    pi = g.add(sn.ParticleInfoNode("pi"))
    em = g.add(sn.EmissionNode("em", color=(1, 1, 1), strength=1.0))
    comb = g.add(sn.CombineRGBNode("crgb"))
    g.connect(pi, "age", comb, "r")
    g.connect(pi, "size", comb, "g")
    g.connect(comb, "image", em, "color")
    g.connect(em, "emission", g.output_node, "surface")
    mat = Shader("pmat", g)
    scene.add_shader(mat)

    geo = make_sphere_mesh((0, 0, 0), 1.0, 0, nlat=8, nlon=12)
    geo.used_shaders = [mat]
    for i in range(n_particles):
        obj = Object(f"p{i}", geo)
        obj.set("transform", tfm.translate(locs[i]))
        obj.particle_system = ps
        obj.particle_index = i
        scene.add_object(obj)
    scene.integrator.set("max_bounce", 0)
    return scene, ps


class TestPacking:
    def test_object_rows_carry_particle_fields(self):
        scene, ps = particle_scene()
        scene.device_update()
        ot = scene.dscene["arrays"]["object_table"]
        p = lk.OT_PARTICLE
        for i in range(3):
            assert ot[i, p] == i                      # index
            assert ot[i, p + 2] == float(i)           # age
            assert ot[i, p + 3] == 10.0               # lifetime
            np.testing.assert_allclose(ot[i, p + 8:p + 11], [0, 0, 2])
        # randoms distinct and in [0,1)
        rnd = ot[:3, p + 1]
        assert len(np.unique(rnd)) == 3
        assert (rnd >= 0).all() and (rnd < 1).all()

    def test_particle_row_clamps_index(self):
        ps = ParticleSystem("ps")
        ps.set("age", np.array([1.0, 2.0], np.float32))
        row = ps.particle_row(7)
        assert row[0] == 7.0 and row[2] == 2.0


class TestRender:
    def test_particle_info_drives_emission(self):
        from tests.test_render import render
        scene, ps = particle_scene()
        img, _ = render(scene, 48, 24, spp=8)
        assert np.isfinite(img).all()
        # the three spheres occupy left/center/right thirds; their
        # emission r-channel equals their age (0, 1, 2) and g equals
        # size (0.5, 1.0, 1.5)
        # partial-coverage edge pixels scale r and g together, so the
        # per-third ratio sum(r)/sum(g) = age/size exactly
        thirds = [img[:, 0:16], img[:, 16:32], img[:, 32:48]]
        ages, sizes = [0.0, 1.0, 2.0], [0.5, 1.0, 1.5]
        for i, sl in enumerate(thirds):
            lit = sl[..., 1] > 0.05     # g>0 wherever a sphere was hit
            assert lit.any()
            ratio = float(sl[..., 0][lit].sum() / sl[..., 1][lit].sum())
            # a few boundary pixels blend neighboring spheres: 1%
            np.testing.assert_allclose(ratio, ages[i] / sizes[i],
                                       atol=0.01)

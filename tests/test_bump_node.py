"""BumpNode tests (ref: render/nodes.h:1424 BumpNode, kernel/svm/
svm_displace.h svm_node_set_bump; bump graph duplication in
render/graph.cpp).

Coverage: analytic surface-gradient math on synthetic differentials,
off-surface pass-through, scene-level effect + direction, and parity
with the displacement-method bump path (eval_bump_normals) — the two
are the same formula through different code, so their renders must
agree."""

import types

import numpy as np
import jax.numpy as jnp

from raytracingproject_tpu.models import Object, Scene
from raytracingproject_tpu.models.mesh import Mesh
from raytracingproject_tpu.models.shader import Shader, ShaderGraph
from raytracingproject_tpu.models import shader_nodes as sn
from raytracingproject_tpu.utils import transform as tfm


def _ctx(n, N=(0, 0, 1)):
    Nv = jnp.broadcast_to(jnp.asarray(N, jnp.float32), (n, 3))
    return types.SimpleNamespace(batch_shape=(n,), N=Nv, Ng=Nv,
                                 object_row=None)


class TestBumpMath:
    def test_pass_through_without_differentials(self):
        """Off-surface contexts (background/volume) have no bump aux:
        the input normal must pass through unchanged."""
        n = 4
        ctx = _ctx(n)
        out = sn.BumpNode("b").eval(
            ctx, {"height": 0.5, "distance": 1.0, "strength": 1.0,
                  "normal": np.zeros(3, np.float32), "__bump__": None})
        np.testing.assert_allclose(np.asarray(out["normal"]),
                                   np.asarray(ctx.N))

    def _aux(self, n, gx, gy):
        """Unit-step differentials in the xy plane: height differences
        (gx, gy) mean the true height gradient is (gx, gy, 0)."""
        z = jnp.zeros((n,), jnp.float32)
        dPdx = jnp.broadcast_to(jnp.asarray([1.0, 0, 0]), (n, 3))
        dPdy = jnp.broadcast_to(jnp.asarray([0, 1.0, 0]), (n, 3))
        return (z, z + gx, z + gy, dPdx, dPdy)

    def test_analytic_gradient(self):
        """N=(0,0,1), grad h=(0.3,-0.2,0), distance 1, strength 1 =>
        n' = normalize((-0.3, 0.2, 1)) (ref formula, svm_displace.h)."""
        n = 4
        ctx = _ctx(n)
        out = sn.BumpNode("b").eval(
            ctx, {"height": 0.0, "distance": 1.0, "strength": 1.0,
                  "normal": np.zeros(3, np.float32),
                  "__bump__": self._aux(n, 0.3, -0.2)})
        exp = np.array([-0.3, 0.2, 1.0])
        exp /= np.linalg.norm(exp)
        np.testing.assert_allclose(np.asarray(out["normal"]),
                                   np.broadcast_to(exp, (n, 3)),
                                   atol=1e-6)

    def test_invert_flips_the_perturbation(self):
        n = 4
        ctx = _ctx(n)
        out = sn.BumpNode("b", invert=True).eval(
            ctx, {"height": 0.0, "distance": 1.0, "strength": 1.0,
                  "normal": np.zeros(3, np.float32),
                  "__bump__": self._aux(n, 0.3, 0.0)})
        exp = np.array([0.3, 0.0, 1.0])
        exp /= np.linalg.norm(exp)
        np.testing.assert_allclose(np.asarray(out["normal"]),
                                   np.broadcast_to(exp, (n, 3)),
                                   atol=1e-6)

    def test_zero_strength_is_identity(self):
        n = 4
        ctx = _ctx(n)
        out = sn.BumpNode("b").eval(
            ctx, {"height": 0.0, "distance": 1.0, "strength": 0.0,
                  "normal": np.zeros(3, np.float32),
                  "__bump__": self._aux(n, 0.7, 0.4)})
        np.testing.assert_allclose(np.asarray(out["normal"]),
                                   np.asarray(ctx.N), atol=1e-6)

    def test_distance_scales_the_slope(self):
        n = 2
        ctx = _ctx(n)
        node = sn.BumpNode("b")
        inp = {"height": 0.0, "strength": 1.0,
               "normal": np.zeros(3, np.float32),
               "__bump__": self._aux(n, 0.5, 0.0)}
        small = np.asarray(node.eval(ctx, {**inp, "distance": 0.1})
                           ["normal"])
        big = np.asarray(node.eval(ctx, {**inp, "distance": 1.0})
                         ["normal"])
        assert abs(small[0, 0]) < abs(big[0, 0])
        np.testing.assert_allclose(small[0, 0], -0.05 / np.hypot(1, .05),
                                   atol=1e-5)


def _quad_scene(shader, w=24, h=24):
    """Unit quad in the xy plane (N = +z), camera above, one emissive
    panel far off to +x so direct lighting is strongly tilt-sensitive."""
    scene = Scene()
    scene.camera.set("matrix",
                     tfm.look_at((0, 0, 5), (0, 0, 0), (0, 1, 0)))
    scene.camera.set("width", w)
    scene.camera.set("height", h)
    m = Mesh("quad")
    verts = np.array([[-1.5, -1.5, 0], [1.5, -1.5, 0],
                      [1.5, 1.5, 0], [-1.5, 1.5, 0]], np.float32)
    tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    m.set_mesh(verts, tris, shader=0)
    m.used_shaders = [shader]
    scene.add_shader(shader)
    scene.add_object(Object("quad", m))

    from raytracingproject_tpu.app import examples
    em = examples.emission_shader("lamp", (1, 1, 1), 40.0)
    lm = Mesh("lamp")
    lv = np.array([[6, -0.5, 3], [6, 0.5, 3],
                   [5.3, 0.5, 3.7], [5.3, -0.5, 3.7]], np.float32)
    lm.set_mesh(lv, tris.copy(), shader=0)
    lm.used_shaders = [em]
    scene.add_shader(em)
    scene.add_object(Object("lamp", lm))
    scene.integrator.set("max_bounce", 1)
    return scene


def _height_subgraph(g, scale=0.15):
    """height = P.x * scale — a linear ramp, so bump tilts the normal
    by a constant angle toward -x."""
    geo = g.add(sn.GeometryNode("geo"))
    sep = g.add(sn.SeparateXYZNode("sep"))
    mul = g.add(sn.MathNode("mul", math_type="multiply", value2=scale))
    g.connect(geo, "position", sep, "vector")
    g.connect(sep, "x", mul, "value1")
    return mul


def _bump_node_shader(distance=1.0, strength=1.0):
    g = ShaderGraph()
    h = _height_subgraph(g)
    bump = g.add(sn.BumpNode("bump", distance=distance,
                             strength=strength))
    bsdf = g.add(sn.DiffuseBsdfNode("d", color=(0.8, 0.8, 0.8)))
    g.connect(h, "value", bump, "height")
    g.connect(bump, "normal", bsdf, "normal")
    g.connect(bsdf, "bsdf", g.output_node, "surface")
    return Shader("bumped", g)


def _displacement_bump_shader():
    """Same height ramp through the displacement-output bump path
    (displacement_method='bump' → ops/shade.eval_bump_normals)."""
    g = ShaderGraph()
    h = _height_subgraph(g)
    comb = g.add(sn.CombineXYZNode("comb"))
    bsdf = g.add(sn.DiffuseBsdfNode("d", color=(0.8, 0.8, 0.8)))
    g.connect(h, "value", comb, "z")  # disp = h * N for N = +z
    g.connect(comb, "vector", g.output_node, "displacement")
    g.connect(bsdf, "bsdf", g.output_node, "surface")
    s = Shader("dispbump", g)
    s.set("displacement_method", "bump")
    return s


def _flat_shader():
    g = ShaderGraph()
    bsdf = g.add(sn.DiffuseBsdfNode("d", color=(0.8, 0.8, 0.8)))
    g.connect(bsdf, "bsdf", g.output_node, "surface")
    return Shader("flat", g)


class TestBumpRender:
    def test_feature_flag_detected(self):
        scene = _quad_scene(_bump_node_shader())
        scene.device_update()
        kg = scene.make_kernel_globals()
        assert kg["features"]["has_custom_normal"]
        scene2 = _quad_scene(_flat_shader())
        scene2.device_update()
        assert not scene2.make_kernel_globals()["features"][
            "has_custom_normal"]

    def test_bump_tilts_toward_the_light(self):
        """The ramp rises toward +x, so bump tilts N toward -x, AWAY
        from the +x lamp: the bumped quad must be darker; inverting
        must be brighter than bumped."""
        from tests.test_render import render
        w = h = 24
        flat, _ = render(_quad_scene(_flat_shader()), w, h, spp=16)
        bumped, _ = render(_quad_scene(_bump_node_shader()), w, h,
                           spp=16)
        box = np.s_[8:16, 8:16]
        assert bumped[box].mean() < 0.92 * flat[box].mean(), \
            (bumped[box].mean(), flat[box].mean())

    def test_parity_with_displacement_bump_path(self):
        """BumpNode (custom_N through the closure stack) and
        displacement-method bump (eval_bump_normals) are the same
        surface-gradient formula — identical-seed renders must agree."""
        from tests.test_render import render
        w = h = 24
        a, _ = render(_quad_scene(_bump_node_shader()), w, h, spp=16)
        b, _ = render(_quad_scene(_displacement_bump_shader()), w, h,
                      spp=16)
        # the quad fills the center; compare there (edges see the lamp)
        box = np.s_[6:18, 6:18]
        np.testing.assert_allclose(a[box], b[box], atol=5e-3)

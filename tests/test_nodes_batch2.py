"""Round-2 utility/texture node batch tests (ref: render/nodes.h
inventory — magic, white-noise, map-range, clamp, curves, wavelength,
attribute, uvmap, tangent, normal, hair-info, light-falloff,
vector-rotate, HSV split/combine, vector displacement)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracingproject_tpu.models import shader_nodes as sn
from raytracingproject_tpu.ops.shade import ShaderData


def ctx(n=64, seed=0):
    rng = np.random.default_rng(seed)
    z = jnp.zeros((n, 3), jnp.float32)
    N = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    return ShaderData(
        P=jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32)),
        N=N, Ng=N, Ns=N, I=N,
        uv=jnp.asarray(rng.random((n, 2)).astype(np.float32)),
        generated=jnp.asarray(rng.random((n, 3)).astype(np.float32)),
        P_object=jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32)),
        time=jnp.zeros(n), ray_length=jnp.full((n,), 2.0),
        ray_depth=jnp.zeros(n, jnp.int32),
        path_flag=jnp.zeros(n, jnp.uint32),
        prim=jnp.zeros(n, jnp.int32), shader=jnp.zeros(n, jnp.int32),
        object_index=jnp.zeros(n, jnp.int32),
        object_color=jnp.asarray(rng.random((n, 3)).astype(np.float32)),
        object_location=z,
        object_random=jnp.asarray(rng.random(n).astype(np.float32)),
        backfacing=jnp.zeros(n, bool),
        dPdu=jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (n, 3)),
        textures=None, batch_shape=(n,))


class TestTextures:
    def test_magic_finite_varying(self):
        c = ctx()
        out = sn.MagicTextureNode("m", depth=3).eval(c, {"vector": None,
                                                         "scale": 5.0,
                                                         "distortion": 1.5})
        col = np.asarray(out["color"])
        assert np.isfinite(col).all()
        assert col.std() > 0.01

    def test_white_noise_deterministic_uniform(self):
        c = ctx(4096)
        node = sn.WhiteNoiseTextureNode("w")
        inp = {"vector": c.generated, "w": 0.0}
        v1 = np.asarray(node.eval(c, inp)["value"])
        v2 = np.asarray(node.eval(c, inp)["value"])
        np.testing.assert_array_equal(v1, v2)
        assert 0.4 < v1.mean() < 0.6
        assert (v1 >= 0).all() and (v1 < 1).all()
        # different positions -> different values
        assert len(np.unique(v1)) > 4000


class TestScalarUtils:
    def test_map_range_linear_and_clamp(self):
        c = ctx(5)
        node = sn.MapRangeNode("mr")
        out = node.eval(c, {"value": jnp.asarray([-1.0, 0.0, 0.5, 1.0, 2.0]),
                            "from_min": 0.0, "from_max": 1.0,
                            "to_min": 10.0, "to_max": 20.0,
                            "steps": 4.0})
        np.testing.assert_allclose(np.asarray(out["result"]),
                                   [10, 10, 15, 20, 20], atol=1e-5)

    def test_map_range_smoothstep(self):
        c = ctx(1)
        node = sn.MapRangeNode("mr", interpolation_type="smoothstep")
        out = node.eval(c, {"value": 0.5, "from_min": 0.0,
                            "from_max": 1.0, "to_min": 0.0,
                            "to_max": 1.0, "steps": 4.0})
        np.testing.assert_allclose(float(out["result"][0]), 0.5, atol=1e-6)

    def test_clamp(self):
        c = ctx(3)
        node = sn.ClampNode("cl")
        out = node.eval(c, {"value": jnp.asarray([-1.0, 0.5, 3.0]),
                            "min": 0.0, "max": 1.0})
        np.testing.assert_allclose(np.asarray(out["result"]), [0, 0.5, 1])

    def test_rgb_curves_invert(self):
        c = ctx(8)
        node = sn.RGBCurvesNode("rc", curves={
            "c": [(0.0, 1.0), (1.0, 0.0)]})   # inverting composite
        col = jnp.asarray(np.random.default_rng(1).random((8, 3)),
                          jnp.float32)
        out = np.asarray(node.eval(c, {"fac": 1.0, "color": col})["color"])
        np.testing.assert_allclose(out, 1.0 - np.asarray(col), atol=1e-6)

    def test_wavelength_colors(self):
        c = ctx(1)
        node = sn.WavelengthNode("wl")
        red = np.asarray(node.eval(c, {"wavelength": 680.0})["color"])[0]
        green = np.asarray(node.eval(c, {"wavelength": 540.0})["color"])[0]
        blue = np.asarray(node.eval(c, {"wavelength": 450.0})["color"])[0]
        assert red[0] > red[2] and red[0] > red[1] * 2
        assert green[1] > green[0] and green[1] > green[2]
        assert blue[2] > blue[0]


class TestGeomNodes:
    def test_attribute_known_and_unknown(self):
        c = ctx()
        out = sn.AttributeNode("a", attribute="generated").eval(c, {})
        np.testing.assert_array_equal(np.asarray(out["vector"]),
                                      np.asarray(c.generated))
        with pytest.raises(ValueError):
            sn.AttributeNode("a", attribute="nope").eval(c, {})

    def test_uvmap(self):
        c = ctx()
        out = sn.UVMapNode("u").eval(c, {})
        np.testing.assert_array_equal(np.asarray(out["uv"])[:, :2],
                                      np.asarray(c.uv))

    def test_tangent_orthogonal_to_normal(self):
        c = ctx()
        for dt in ("radial", "uv_map"):
            out = sn.TangentNode("t", direction_type=dt).eval(c, {})
            t = np.asarray(out["tangent"])
            n = np.asarray(c.N)
            assert np.abs((t * n).sum(-1)).max() < 1e-4

    def test_normal_dot(self):
        c = ctx()
        node = sn.NormalNode("n", direction=(0.0, 0.0, 2.0))
        out = node.eval(c, {"normal": (0.0, 0.0, 1.0)})
        np.testing.assert_allclose(np.asarray(out["dot"]), 1.0,
                                   atol=1e-6)

    def test_hair_info_on_strand(self):
        c = ctx()
        out = sn.HairInfoNode("h").eval(c, {})
        assert np.asarray(out["is_strand"]).all()  # dPdu nonzero
        np.testing.assert_array_equal(np.asarray(out["intercept"]),
                                      np.asarray(c.uv[:, 1]))

    def test_light_falloff(self):
        c = ctx()   # ray_length = 2
        out = sn.LightFalloffNode("lf").eval(
            c, {"strength": 100.0, "smooth": 0.0})
        np.testing.assert_allclose(np.asarray(out["quadratic"]), 25.0,
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(out["linear"]), 50.0,
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(out["constant"]), 100.0,
                                   rtol=1e-5)


class TestVectorNodes:
    def test_vector_rotate_quarter_turn(self):
        c = ctx(1)
        node = sn.VectorRotateNode("vr")
        out = node.eval(c, {"vector": (1.0, 0.0, 0.0),
                            "center": (0.0, 0.0, 0.0),
                            "axis": (0.0, 0.0, 1.0),
                            "angle": float(np.pi / 2)})
        np.testing.assert_allclose(np.asarray(out["vector"])[0],
                                   [0, 1, 0], atol=1e-6)

    def test_hsv_roundtrip(self):
        c = ctx(32)
        col = jnp.asarray(np.random.default_rng(2).random((32, 3)),
                          jnp.float32)
        sep = sn.SeparateHSVNode("s").eval(c, {"color": col})
        comb = sn.CombineHSVNode("c").eval(
            c, {"h": sep["h"], "s": sep["s"], "v": sep["v"]})
        np.testing.assert_allclose(np.asarray(comb["color"]),
                                   np.asarray(col), atol=1e-5)

    def test_vector_displacement_tangent_frame(self):
        c = ctx()
        node = sn.VectorDisplacementNode("vd", space="tangent")
        out = node.eval(c, {"vector": (0.0, 1.0, 0.0),
                            "midlevel": 0.0, "scale": 2.0})
        # y component rides the normal (z up in this ctx)
        np.testing.assert_allclose(np.asarray(out["displacement"]),
                                   np.broadcast_to([0, 0, 2.0], (64, 3)),
                                   atol=1e-5)

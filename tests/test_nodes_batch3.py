"""Round-3 shader-node batch tests (ref: render/nodes.h —
AnisotropicBsdfNode, HairBsdfNode (classic R/TT), VertexColorNode,
VolumeInfoNode, VectorTransformNode, SetNormalNode).

Correctness style follows tests/test_toon_velvet.py: MC pdf
normalization + sample/eval consistency on the raw closure stack, plus
scene-level packing/render checks for the attribute-driven nodes."""

import types

import numpy as np
import jax.numpy as jnp

from raytracingproject_tpu.models import Object, Scene
from raytracingproject_tpu.models.mesh import Mesh
from raytracingproject_tpu.models.shader import Shader, ShaderGraph
from raytracingproject_tpu.models import shader_nodes as sn
from raytracingproject_tpu.ops import bsdf as bsdf_ops
from raytracingproject_tpu.ops import closures as cl
from raytracingproject_tpu.ops import lookup as lk
from raytracingproject_tpu.ops.shade import ShaderData
from raytracingproject_tpu.utils import math as um
from raytracingproject_tpu.utils import transform as tfm


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


def _uniform_sphere(n, seed=1):
    rng = np.random.default_rng(seed)
    z = rng.uniform(-1, 1, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    s = np.sqrt(1 - z * z)
    return jnp.asarray(np.stack([s * np.cos(phi), s * np.sin(phi), z],
                                -1).astype(np.float32))


def _sd(n, tangent=(1.0, 0.0, 0.0)):
    """Minimal ShaderData carrying only the fields the BSDF dispatch
    reads (dPdu for the hair-on-curves gate)."""
    return ShaderData(
        dPdu=jnp.broadcast_to(jnp.asarray(tangent, jnp.float32), (n, 3)),
        batch_shape=(n,))


ANISO_FEAT = {"has_glossy": True, "has_aniso": True,
              "has_refraction": False, "has_transparent": False}
CHAIR_FEAT = {"has_glossy": False, "has_refraction": False,
              "has_transparent": False, "has_classic_hair": True}


class TestAnisotropicGGX:
    def test_iso_limit_matches_isotropic_path(self):
        """anisotropy = 0 with no tangent set must reproduce the
        isotropic GGX lobe exactly (same frame, ax == ay == alpha)."""
        n = 4096
        c = _closure(n, glossy=(0.8, 0.7, 0.6), glossy_roughness=0.35)
        N, I, u = _frame(n, seed=2)
        wi = um.normalize(_uniform_sphere(n, 7)
                          + jnp.asarray([0.0, 0.0, 1.2]))
        f_iso, pdf_iso = bsdf_ops.bsdf_eval(
            c, N, I, wi, features={**ANISO_FEAT, "has_aniso": False})
        f_a, pdf_a = bsdf_ops.bsdf_eval(c, N, I, wi, features=ANISO_FEAT)
        np.testing.assert_allclose(np.asarray(f_a), np.asarray(f_iso),
                                   rtol=1e-4, atol=1e-7)
        np.testing.assert_allclose(np.asarray(pdf_a),
                                   np.asarray(pdf_iso),
                                   rtol=1e-4, atol=1e-7)

    def test_pdf_integrates_to_one(self):
        """VNDF pdf over the sphere is ~1 when the lobe is tight
        enough that the below-horizon reflection mass (which eval
        zeroes) is negligible."""
        n = 400_000
        c = _closure(n, glossy=(1.0, 1.0, 1.0), glossy_roughness=0.25,
                     glossy_aniso=0.5,
                     glossy_tangent=(1.0, 0.0, 0.0))
        N, I, _ = _frame(n)
        wi = _uniform_sphere(n)
        _, pdf = bsdf_ops.bsdf_eval(c, N, I, wi, features=ANISO_FEAT)
        integral = float(jnp.mean(pdf)) * 4 * np.pi
        assert abs(integral - 1.0) < 0.03, integral

    def test_sample_eval_consistency(self):
        n = 4096
        c = _closure(n, glossy=(0.6, 0.5, 0.4), glossy_roughness=0.3,
                     glossy_aniso=-0.6,
                     glossy_tangent=(0.3, 0.9, 0.0))
        N, I, u = _frame(n, seed=5)
        out = bsdf_ops.bsdf_sample(c, N, N, I, u[0], u[1], u[2],
                                   features=ANISO_FEAT)
        f2, pdf2 = bsdf_ops.bsdf_eval(c, N, I, out["omega"],
                                      features=ANISO_FEAT)
        ok = np.asarray(out["valid"])
        assert ok.mean() > 0.95
        np.testing.assert_allclose(np.asarray(out["pdf"])[ok],
                                   np.asarray(pdf2)[ok], rtol=1e-3)
        np.testing.assert_allclose(np.asarray(out["f_cos"])[ok],
                                   np.asarray(f2)[ok], rtol=1e-3,
                                   atol=1e-6)

    def test_tangent_steers_the_highlight(self):
        """With strong anisotropy the lobe is wider along the rough
        axis; rotating the tangent 90 deg must swap the two probe
        directions' densities."""
        N = jnp.asarray([[0.0, 0.0, 1.0]])
        I = jnp.asarray([[0.0, 0.0, 1.0]])
        off_x = um.normalize(jnp.asarray([[0.45, 0.0, 0.9]]))
        off_y = um.normalize(jnp.asarray([[0.0, 0.45, 0.9]]))

        def pdf_at(tangent, wi):
            c = _closure(1, glossy=(1, 1, 1), glossy_roughness=0.4,
                         glossy_aniso=0.8, glossy_tangent=tangent)
            _, p = bsdf_ops.bsdf_eval(c, N, I, wi, features=ANISO_FEAT)
            return float(p[0])

        px_t100 = pdf_at((1, 0, 0), off_x)
        py_t100 = pdf_at((1, 0, 0), off_y)
        px_t010 = pdf_at((0, 1, 0), off_x)
        py_t010 = pdf_at((0, 1, 0), off_y)
        # aniso > 0 -> alpha_x shrinks, alpha_y grows: the lobe is
        # NARROW along the tangent and WIDE across it
        assert py_t100 > 2.0 * px_t100, (px_t100, py_t100)
        assert px_t010 > 2.0 * py_t010, (px_t010, py_t010)
        # 90-deg tangent rotation swaps the probes
        np.testing.assert_allclose(px_t100, py_t010, rtol=1e-4)
        np.testing.assert_allclose(py_t100, px_t010, rtol=1e-4)

    def test_rotation_input_matches_rotated_tangent(self):
        """rotation = 0.25 about N == handing in the 90-deg-rotated
        tangent (ref: node rotation semantics, fraction of 2*pi)."""
        n = 8
        wi = um.normalize(_uniform_sphere(n, 3)
                          + jnp.asarray([0.0, 0.0, 1.5]))
        N = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
        I = jnp.broadcast_to(um.normalize(jnp.asarray([0.2, -0.1, 0.97])),
                             (n, 3))
        g = ShaderGraph()
        node = g.add(sn.AnisotropicBsdfNode(
            "a", roughness=0.4, anisotropy=0.7, rotation=0.25))
        ctx = types.SimpleNamespace(
            batch_shape=(n,), N=N, P_object=jnp.zeros((n, 3)),
            dPdu=None, textures=None)
        out = node.eval(ctx, {"color": (1.0, 1.0, 1.0),
                              "roughness": 0.4, "anisotropy": 0.7,
                              "rotation": 0.25,
                              "normal": (0.0, 0.0, 0.0),
                              "tangent": jnp.broadcast_to(
                                  jnp.asarray([1.0, 0.0, 0.0]), (n, 3))})
        c_rot = out["bsdf"]
        np.testing.assert_allclose(
            np.asarray(c_rot["glossy_tangent"]),
            np.tile([0.0, 1.0, 0.0], (n, 1)), atol=1e-5)


class TestClassicHair:
    def test_r_lobe_pdf_normalization(self):
        """The R lobe's pdf integrates to 1 over the sphere
        (roughness_v <= 0.5 keeps the sampled phi range inside the
        eval's cosphi > 0 support)."""
        n = 400_000
        c = _closure(n, chair_refl=(1, 1, 1), chair_refl_r1=0.15,
                     chair_refl_r2=0.4, chair_refl_off=0.05)
        N, I, _ = _frame(n)
        wi = _uniform_sphere(n, 11)
        _, pdf = bsdf_ops.bsdf_eval(c, N, I, wi, features=CHAIR_FEAT,
                                    sd=_sd(n))
        integral = float(jnp.mean(pdf)) * 4 * np.pi
        assert abs(integral - 1.0) < 0.04, integral

    def test_tt_lobe_pdf_normalization(self):
        n = 400_000
        c = _closure(n, chair_trans=(1, 1, 1), chair_trans_r1=0.2,
                     chair_trans_r2=0.5, chair_trans_off=0.0)
        N, I, _ = _frame(n)
        wi = _uniform_sphere(n, 12)
        _, pdf = bsdf_ops.bsdf_eval(c, N, I, wi, features=CHAIR_FEAT,
                                    sd=_sd(n))
        integral = float(jnp.mean(pdf)) * 4 * np.pi
        assert abs(integral - 1.0) < 0.04, integral

    def test_sample_eval_consistency(self):
        n = 8192
        c = _closure(n, chair_refl=(0.6, 0.4, 0.3), chair_refl_r1=0.2,
                     chair_refl_r2=0.35, chair_refl_off=0.03,
                     chair_trans=(0.3, 0.3, 0.35), chair_trans_r1=0.3,
                     chair_trans_r2=0.4, chair_trans_off=0.0)
        N, I, u = _frame(n, seed=9)
        sd = _sd(n, tangent=(0.8, 0.0, 0.6))
        out = bsdf_ops.bsdf_sample(c, N, N, I, u[0], u[1], u[2],
                                   features=CHAIR_FEAT, sd=sd)
        f2, pdf2 = bsdf_ops.bsdf_eval(c, N, I, out["omega"],
                                      features=CHAIR_FEAT, sd=sd)
        ok = np.asarray(out["valid"])
        assert ok.mean() > 0.9
        np.testing.assert_allclose(np.asarray(out["pdf"])[ok],
                                   np.asarray(pdf2)[ok], rtol=1e-3)
        np.testing.assert_allclose(np.asarray(out["f_cos"])[ok],
                                   np.asarray(f2)[ok], rtol=1e-3,
                                   atol=1e-6)

    def test_r_lobe_peaks_at_mirror_half_angle(self):
        """Zero offset: the Cauchy peaks where theta_i == theta_r,
        i.e. the specular cone around the tangent."""
        sd = _sd(1)
        N = jnp.asarray([[0.0, 0.0, 1.0]])
        I = um.normalize(jnp.asarray([[0.4, 0.0, 0.9]]))
        c = _closure(1, chair_refl=(1, 1, 1), chair_refl_r1=0.1,
                     chair_refl_r2=0.5, chair_refl_off=0.0)
        # mirror about the normal plane of the tangent (x): flip x
        mirror = um.normalize(jnp.asarray([[-0.4, 0.0, 0.9]]))
        away = um.normalize(jnp.asarray([[0.9, 0.0, 0.43]]))
        _, p_mirror = bsdf_ops.bsdf_eval(c, N, I, mirror,
                                         features=CHAIR_FEAT, sd=sd)
        _, p_away = bsdf_ops.bsdf_eval(c, N, I, away,
                                       features=CHAIR_FEAT, sd=sd)
        assert float(p_mirror[0]) > 5.0 * float(p_away[0])

    def test_mesh_fallback_is_diffuse(self):
        """Classic-hair closures on mesh lanes (zero tangent) fall back
        to a diffuse lobe: sampled albedo equals the weight, not 0."""
        n = 100_000
        c = _closure(n, chair_refl=(0.7, 0.7, 0.7), chair_refl_r1=0.2,
                     chair_refl_r2=0.5, chair_refl_off=0.0)
        N, I, u = _frame(n, seed=4)
        sd = _sd(n, tangent=(0.0, 0.0, 0.0))
        out = bsdf_ops.bsdf_sample(c, N, N, I, u[0], u[1], u[2],
                                   features=CHAIR_FEAT, sd=sd)
        w = jnp.where(out["valid"][:, None],
                      out["f_cos"] / jnp.maximum(out["pdf"][:, None],
                                                 1e-12), 0.0)
        albedo = float(jnp.mean(w[:, 0]))
        assert abs(albedo - 0.7) < 0.02, albedo


def _vcol_quad_scene(w=32, h=32):
    """Camera-facing unit quad with per-vertex RGBA colors driving an
    emission shader through VertexColorNode."""
    scene = Scene()
    scene.camera.set("matrix",
                     tfm.look_at((0, -4, 0), (0, 0, 0), (0, 0, 1)))
    scene.camera.set("width", w)
    scene.camera.set("height", h)
    m = Mesh("quad")
    verts = np.array([[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]],
                     np.float32) * 1.6
    tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    m.set_mesh(verts, tris, shader=0)
    vcols = np.array([[1, 0, 0, 1], [0, 1, 0, 1],
                      [0, 0, 1, 1], [1, 1, 0, 0.5]], np.float32)
    m.attribute_set("std_vertex_color", "vertex", vcols)

    g = ShaderGraph()
    vc = g.add(sn.VertexColorNode("vc"))
    em = g.add(sn.EmissionNode("em", color=(1, 1, 1), strength=1.0))
    g.connect(vc, "color", em, "color")
    g.connect(em, "emission", g.output_node, "surface")
    mat = Shader("vmat", g)
    m.used_shaders = [mat]
    scene.add_shader(mat)
    scene.add_object(Object("quad", m))
    scene.integrator.set("max_bounce", 0)
    return scene, vcols


class TestVertexColor:
    def test_packing_gated_on_reader(self):
        """prim_vcol is packed only when some shader reads it — an
        unread color attribute must not cost a per-hit gather."""
        scene, vcols = _vcol_quad_scene()
        scene.device_update()
        assert "prim_vcol" in scene.dscene["arrays"]
        pv = np.asarray(scene.dscene["arrays"]["prim_vcol"])
        assert pv.shape == (2, 12)
        # tri 0 corners = verts 0,1,2
        np.testing.assert_allclose(pv[0].reshape(3, 4), vcols[[0, 1, 2]])

        from raytracingproject_tpu.app import examples
        scene2, _ = _vcol_quad_scene()
        plain = examples.diffuse_shader("plain", (0.5, 0.5, 0.5))
        geo = scene2.objects[0].geometry
        geo.used_shaders = [plain]  # attr still set, but no reader
        scene2.shaders = [s for s in scene2.shaders if s.name != "vmat"]
        scene2.add_shader(plain)
        scene2.device_update()
        assert "prim_vcol" not in scene2.dscene["arrays"]

    def test_render_interpolates_corners(self):
        from tests.test_render import render
        scene, vcols = _vcol_quad_scene()
        img, _ = render(scene, 32, 32, spp=4)
        assert np.isfinite(img).all()
        # measured raster layout: img[3,3] = vert 0 (red),
        # img[3,28] = vert 1 (green), img[28,28] = vert 2 (blue),
        # img[28,3] = vert 3 (yellow)
        red = img[3, 3]
        green = img[3, 28]
        blue = img[28, 28]
        yellow = img[28, 3]
        assert red[0] > 0.55 and red[0] > 2 * max(red[1], red[2]), red
        assert green[1] > 0.55 and green[1] > 2 * max(green[0],
                                                      green[2]), green
        assert blue[2] > 0.55 and blue[2] > 2 * max(blue[0],
                                                    blue[1]), blue
        assert yellow[0] > 0.55 and yellow[1] > 0.55 \
            and yellow[2] < 0.3, yellow

    def test_node_defaults_white_without_attr(self):
        n = 5
        ctx = types.SimpleNamespace(batch_shape=(n,), vcol=None)
        out = sn.VertexColorNode("vc").eval(ctx, {})
        np.testing.assert_allclose(np.asarray(out["color"]), 1.0)
        np.testing.assert_allclose(np.asarray(out["alpha"]), 1.0)


class TestVolumeInfo:
    def test_defaults_without_grids(self):
        n = 7
        ctx = types.SimpleNamespace(batch_shape=(n,),
                                    P_object=jnp.zeros((n, 3)))
        out = sn.VolumeInfoNode("vi").eval(ctx, {})
        np.testing.assert_allclose(np.asarray(out["color"]), 1.0)
        np.testing.assert_allclose(np.asarray(out["density"]), 1.0)
        np.testing.assert_allclose(np.asarray(out["flame"]), 0.0)
        np.testing.assert_allclose(np.asarray(out["temperature"]), 0.0)

    def test_grid_sampling(self):
        r = 8
        zz = np.broadcast_to(np.arange(r, dtype=np.float32)
                             .reshape(1, 1, r), (r, r, r))
        node = sn.VolumeInfoNode("vi")
        node.set_voxel_grid("density", zz, lo=(0, 0, 0), inv=(1, 1, 1))
        # voxel centers: P = (k + 0.5)/r along z
        P = np.stack([np.full(r, 0.5), np.full(r, 0.5),
                      (np.arange(r) + 0.5) / r], -1).astype(np.float32)
        ctx = types.SimpleNamespace(batch_shape=(r,),
                                    P_object=jnp.asarray(P))
        out = node.eval(ctx, {})
        np.testing.assert_allclose(np.asarray(out["density"]),
                                   np.arange(r, dtype=np.float32),
                                   atol=1e-5)
        # color falls back to white, flame to zero
        np.testing.assert_allclose(np.asarray(out["color"]), 1.0)


class TestVectorTransform:
    def _ctx(self, n, M):
        Mi = tfm.inverse(M)
        row = np.zeros((n, lk.OT_COLS), np.float32)
        row[:, lk.OT_TFM:lk.OT_TFM + 12] = np.asarray(M, np.float32) \
            .reshape(-1)
        row[:, lk.OT_ITFM:lk.OT_ITFM + 12] = Mi.reshape(-1)
        return types.SimpleNamespace(
            batch_shape=(n,),
            object_tfm=jnp.broadcast_to(
                jnp.asarray(M, jnp.float32), (n, 3, 4)),
            object_row=jnp.asarray(row),
            textures=None)

    def test_point_world_to_object_round_trip(self):
        n = 16
        rng = np.random.default_rng(0)
        M = tfm.translate((2.0, -1.0, 3.0)) @ tfm.to_4x4(
            tfm.scale((2.0, 1.0, 0.5)))
        M = np.asarray(M, np.float32)[:3]
        ctx = self._ctx(n, M)
        P = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
        fwd = sn.VectorTransformNode("f", transform_type="point",
                                     convert_from="world",
                                     convert_to="object")
        back = sn.VectorTransformNode("b", transform_type="point",
                                      convert_from="object",
                                      convert_to="world")
        po = fwd.eval(ctx, {"vector": P})["vector"]
        pw = back.eval(ctx, {"vector": po})["vector"]
        np.testing.assert_allclose(np.asarray(pw), np.asarray(P),
                                   atol=1e-4)
        # object-space value is the actual inverse transform
        expect = (np.asarray(P) - M[:, 3]) @ np.linalg.inv(M[:, :3]).T
        np.testing.assert_allclose(np.asarray(po), expect, atol=1e-4)

    def test_normal_uses_inverse_transpose(self):
        """Non-uniform scale: normals transform by the inverse
        transpose, not the plain matrix (ref: svm_vector_transform.h
        normal branch)."""
        n = 4
        M = np.array([[3.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0]],
                     np.float32)
        ctx = self._ctx(n, M)
        nrm = um.normalize(jnp.broadcast_to(
            jnp.asarray([1.0, 1.0, 0.0]), (n, 3)))
        node = sn.VectorTransformNode("n", transform_type="normal",
                                      convert_from="object",
                                      convert_to="world")
        out = np.asarray(node.eval(ctx, {"vector": nrm})["vector"])
        # surface z=... plane with normal (1,1,0)/sqrt2 stretched 3x in
        # x: the normal tilts TOWARD y: n' ∝ (1/3, 1, 0)
        expect = np.array([1 / 3, 1.0, 0.0])
        expect /= np.linalg.norm(expect)
        np.testing.assert_allclose(out, np.tile(expect, (n, 1)),
                                   atol=1e-5)

    def test_camera_space(self):
        n = 2
        c2w = np.asarray(tfm.look_at((0, -5, 0), (0, 0, 0), (0, 0, 1)),
                         np.float32)
        ctx = self._ctx(n, np.eye(3, 4, dtype=np.float32))
        ctx.textures = types.SimpleNamespace(cam_to_world=c2w)
        node = sn.VectorTransformNode("c", transform_type="point",
                                      convert_from="camera",
                                      convert_to="world")
        origin = jnp.zeros((n, 3), jnp.float32)
        out = np.asarray(node.eval(ctx, {"vector": origin})["vector"])
        np.testing.assert_allclose(out, np.tile([0, -5, 0], (n, 1)),
                                   atol=1e-5)


class TestSetNormal:
    def test_normalizes(self):
        n = 3
        ctx = types.SimpleNamespace(batch_shape=(n,))
        v = jnp.asarray([[0.0, 0.0, 5.0], [3.0, 0.0, 4.0],
                         [0.0, -2.0, 0.0]], jnp.float32)
        out = np.asarray(sn.SetNormalNode("s").eval(
            ctx, {"direction": v})["normal"])
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0,
                                   atol=1e-6)
        np.testing.assert_allclose(out[1], [0.6, 0.0, 0.8], atol=1e-6)


def _ao_scene(closed, w=16, h=16):
    """Camera at the center of a box (closed => ao = 0) or above an
    open quad (ao = 1); emission = AO output so the pixel IS the ao."""
    from raytracingproject_tpu.models.mesh import make_box_mesh
    scene = Scene()
    scene.camera.set("matrix",
                     tfm.look_at((0, 0, 0), (0, 1, 0), (0, 0, 1)))
    scene.camera.set("width", w)
    scene.camera.set("height", h)
    g = ShaderGraph()
    ao = g.add(sn.AmbientOcclusionNode("ao", distance=100.0, samples=4))
    em = g.add(sn.EmissionNode("em", color=(1, 1, 1), strength=1.0))
    g.connect(ao, "color", em, "color")
    g.connect(em, "emission", g.output_node, "surface")
    mat = Shader("aomat", g)
    scene.add_shader(mat)
    if closed:
        m = make_box_mesh((-2, -2, -2), (2, 2, 2), inside=True)
    else:
        m = Mesh("quad")
        verts = np.array([[-9, 3, -9], [9, 3, -9], [9, 3, 9], [-9, 3, 9]],
                         np.float32)
        m.set_mesh(verts, np.array([[0, 1, 2], [0, 2, 3]], np.int32),
                   shader=0)
    m.used_shaders = [mat]
    scene.add_object(Object("geo", m))
    scene.integrator.set("max_bounce", 0)
    return scene


class TestAmbientOcclusionNode:
    def test_open_quad_is_unoccluded(self):
        from tests.test_render import render
        scene = _ao_scene(closed=False)
        scene.device_update()
        assert scene.make_kernel_globals()["features"]["has_ao_node"]
        img, _ = render(scene, 16, 16, spp=8)
        assert np.isfinite(img).all()
        np.testing.assert_allclose(img[8, 8], 1.0, atol=1e-3)

    def test_closed_box_is_fully_occluded(self):
        from tests.test_render import render
        scene = _ao_scene(closed=True)
        img, _ = render(scene, 16, 16, spp=8)
        assert np.isfinite(img).all()
        np.testing.assert_allclose(img.max(), 0.0, atol=1e-3)


class TestBevelNode:
    def test_flat_surface_returns_shading_normal(self):
        """Probes on a flat quad all see the same normal: bevel_N == N,
        rendered as emission = 0.5 * (N + 1)."""
        from tests.test_render import render
        scene = Scene()
        scene.camera.set("matrix",
                         tfm.look_at((0, -4, 0), (0, 0, 0), (0, 0, 1)))
        scene.camera.set("width", 16)
        scene.camera.set("height", 16)
        g = ShaderGraph()
        bv = g.add(sn.BevelNode("bv", radius=0.3, samples=4))
        mad = g.add(sn.VectorMathNode("enc", math_type="multiply_add"))
        em = g.add(sn.EmissionNode("em", color=(1, 1, 1), strength=1.0))
        g.connect(bv, "normal", mad, "vector1")
        mad.set("vector2", (0.5, 0.5, 0.5))
        mad.set("vector3", (0.5, 0.5, 0.5))
        g.connect(mad, "vector", em, "color")
        g.connect(em, "emission", g.output_node, "surface")
        mat = Shader("bmat", g)
        scene.add_shader(mat)
        m = Mesh("quad")
        verts = np.array([[-3, 0, -3], [3, 0, -3], [3, 0, 3], [-3, 0, 3]],
                         np.float32)
        m.set_mesh(verts, np.array([[0, 1, 2], [0, 2, 3]], np.int32),
                   shader=0)
        m.used_shaders = [mat]
        scene.add_object(Object("quad", m))
        scene.integrator.set("max_bounce", 0)
        scene.device_update()
        assert scene.make_kernel_globals()["features"]["has_bevel_node"]
        img, _ = render(scene, 16, 16, spp=8)
        # quad normal is -y (faces the camera): encoded (0.5, 0.0, 0.5)
        np.testing.assert_allclose(img[8, 8], [0.5, 0.0, 0.5],
                                   atol=2e-2)

    def test_edge_normals_are_rounded(self):
        """On a box edge the beveled normal blends the two faces: the
        encoded render near the vertical edge differs from the face
        normal but stays unit length."""
        from tests.test_render import render
        from raytracingproject_tpu.models.mesh import make_box_mesh
        scene = Scene()
        scene.camera.set("matrix",
                         tfm.look_at((3.0, -3.0, 0.6), (0, 0, 0.4),
                                     (0, 0, 1)))
        scene.camera.set("width", 24)
        scene.camera.set("height", 24)
        g = ShaderGraph()
        bv = g.add(sn.BevelNode("bv", radius=0.35, samples=8))
        mad = g.add(sn.VectorMathNode("enc", math_type="multiply_add"))
        em = g.add(sn.EmissionNode("em", color=(1, 1, 1), strength=1.0))
        g.connect(bv, "normal", mad, "vector1")
        mad.set("vector2", (0.5, 0.5, 0.5))
        mad.set("vector3", (0.5, 0.5, 0.5))
        g.connect(mad, "vector", em, "color")
        g.connect(em, "emission", g.output_node, "surface")
        mat = Shader("bmat", g)
        scene.add_shader(mat)
        m = make_box_mesh((-1, -1, -1), (1, 1, 1))
        m.used_shaders = [mat]
        scene.add_object(Object("box", m))
        scene.integrator.set("max_bounce", 0)
        img, _ = render(scene, 24, 24, spp=16)
        assert np.isfinite(img).all()
        # decode normals; keep INTERIOR box pixels — silhouette pixels
        # average the encoding with the black background, which skews
        # the decoded normal. Erode the coverage mask by one pixel.
        dec = img * 2.0 - 1.0
        lens = np.linalg.norm(dec, axis=-1)
        cov = img.sum(-1) > 0.05
        on_box = cov.copy()
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                on_box &= np.roll(np.roll(cov, dy, 0), dx, 1)
        on_box[0, :] = on_box[-1, :] = False
        on_box[:, 0] = on_box[:, -1] = False
        assert on_box.sum() > 50
        # all decoded normals stay approximately unit
        assert np.all(np.abs(lens[on_box] - 1.0) < 0.15)
        # the visible +x and -y faces give two distinct normals; near
        # the shared vertical edge some pixels must carry a BLEND
        nx = dec[..., 0][on_box]
        ny = dec[..., 1][on_box]
        blended = (nx > 0.25) & (ny < -0.25)
        assert blended.sum() > 3, (nx.max(), ny.min())

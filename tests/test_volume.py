"""Volume rendering tests (ref categories: tests/python volume scenes;
validation via energy conservation instead of golden images)."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracingproject_tpu.app import examples
from raytracingproject_tpu.ops import integrator as integ
from raytracingproject_tpu.ops import volume as vol_ops


def render(scene, w, h, spp):
    scene.device_update()
    kg = scene.make_kernel_globals()
    yy, xx = np.mgrid[0:h, 0:w]
    px = jnp.asarray(xx.reshape(-1), jnp.int32)
    py = jnp.asarray(yy.reshape(-1), jnp.int32)
    out = jax.jit(lambda a, b, c: integ.render_samples(
        kg, a, b, c, 0, spp))(px, py, py * w + px)
    return np.asarray(out[0]).reshape(h, w, 3) / spp


class TestPhase:
    def test_hg_normalization(self):
        """Phase function integrates to 1 over the sphere."""
        rng = np.random.default_rng(0)
        for g in (0.0, 0.4, -0.6):
            mu = jnp.asarray(1.0 - 2.0 * rng.random(20000), jnp.float32)
            vals = vol_ops.hg_phase_eval(mu, jnp.float32(g))
            integral = float(np.mean(np.asarray(vals))) * 4.0 * np.pi
            assert abs(integral - 1.0) < 0.03, (g, integral)

    def test_hg_sample_matches_eval(self):
        """Sampled directions' pdf equals eval at the sampled angle and
        the mean cosine equals g."""
        n = 8192
        rng = np.random.default_rng(1)
        d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
        u1 = jnp.asarray(rng.random(n), jnp.float32)
        u2 = jnp.asarray(rng.random(n), jnp.float32)
        g = jnp.full((n,), 0.5, jnp.float32)
        dirs, pdf = vol_ops.hg_phase_sample(d, g, u1, u2)
        cos_t = np.asarray(dirs)[:, 2]
        np.testing.assert_allclose(
            np.asarray(pdf),
            np.asarray(vol_ops.hg_phase_eval(jnp.asarray(cos_t), g)),
            rtol=1e-3, atol=1e-5)
        assert abs(cos_t.mean() - 0.5) < 0.02  # E[cos] = g

    def test_distance_sampling_unbiased(self):
        """E[weight] over scatter/pass outcomes reconstructs transmittance
        estimator correctly: for sigma_s = sigma_t (albedo 1) and a beam
        of length t, scatter+pass weights average to 1."""
        n = 65536
        rng = np.random.default_rng(2)
        sigma = jnp.full((n, 3), 0.7, jnp.float32)
        thr = jnp.ones((n, 3), jnp.float32)
        tmax = jnp.full((n,), 2.0, jnp.float32)
        res = vol_ops.sample_distance_homogeneous(
            sigma, thr, tmax, jnp.asarray(rng.random(n), jnp.float32),
            jnp.asarray(rng.random(n), jnp.float32))
        w = np.where(np.asarray(res["scatter"])[:, None],
                     np.asarray(res["weight_scatter"]) * 0.7,
                     np.asarray(res["weight_pass"]))
        # E[w] = 1 for a perfectly importance-sampled homogeneous medium
        np.testing.assert_allclose(w.mean(0), 1.0, atol=0.02)


class TestVolumeRender:
    def test_volume_furnace(self):
        """Albedo-1 fog in a unit furnace must stay at 1."""
        scene = examples.volume_furnace(24, 24, density=0.6)
        img = render(scene, 24, 24, spp=48)
        assert np.isfinite(img).all()
        assert abs(float(img.mean()) - 1.0) < 0.03
        center = img[10:14, 10:14]
        assert abs(float(center.mean()) - 1.0) < 0.05

    def test_smoke_cornell_renders(self):
        scene = examples.smoke_cornell(24, 24, spp=8, density=0.004)
        img = render(scene, 24, 24, 8)
        assert np.isfinite(img).all()
        assert img.mean() > 0.01

    def test_absorbing_volume_darkens(self):
        """An absorbing volume in front of the light darkens the image
        vs the same scene without it."""
        base = examples.cornell_box(20, 20, spp=8)
        img0 = render(base, 20, 20, 8)
        withvol = examples.smoke_cornell(20, 20, spp=8, density=0.01)
        # pure absorption: color=0 -> sigma_s = 0
        for s in withvol.shaders:
            if s.name == "smoke":
                for node in s.graph.nodes:
                    if hasattr(node, "NODE_NAME") \
                            and node.NODE_NAME == "principled_volume":
                        node.set("color", (0.0, 0.0, 0.0))
                        node.set("absorption_color", (0.0, 0.0, 0.0))
        img1 = render(withvol, 20, 20, 8)
        assert img1.mean() < img0.mean() * 0.9


class TestEquiangular:
    """Equiangular + multiple-importance volume NEE
    (ref: kernel_volume.h:297-319 equiangular sample, :978-1050 MIS)."""

    def _chunks(self, method, k=8, spp=8, w=20):
        from raytracingproject_tpu.models import object as ob
        scene = examples.smoke_small_light(w, w, spp=spp, method=method)
        # hide the bright quad from camera rays so the variance metric
        # measures volume NEE, not AA flicker at the light silhouette
        for o in scene.objects:
            if o.name == "light":
                o.set("visibility",
                      ob.PATH_RAY_ALL_VISIBILITY & ~ob.PATH_RAY_CAMERA)
        scene.device_update()
        kg = scene.make_kernel_globals()
        yy, xx = np.mgrid[0:w, 0:w]
        px = jnp.asarray(xx.reshape(-1), jnp.int32)
        py = jnp.asarray(yy.reshape(-1), jnp.int32)
        fn = jax.jit(lambda s: integ.render_samples(
            kg, px, py, py * w + px, s, spp))
        return np.stack([
            np.asarray(fn(jnp.uint32(i * spp))[0]).reshape(w, w, 3) / spp
            for i in range(k)])

    def test_method_switches_paths(self):
        """The socket genuinely switches kernels (no silent no-op)."""
        for method, expect in (("distance", False), ("equiangular", True),
                               ("multiple_importance", True)):
            scene = examples.smoke_small_light(8, 8, method=method)
            scene.device_update()
            kg = scene.make_kernel_globals()
            assert kg["features"]["has_equiangular"] == expect, method

    def test_modes_agree_and_equiangular_reduces_variance(self):
        """All three techniques estimate the same transport; equiangular
        cuts per-chunk variance by >3x on the small-light smoke (the
        measured gain is ~6x)."""
        imgs = {m: self._chunks(m) for m in
                ("distance", "equiangular", "multiple_importance")}
        means = {m: float(v.mean()) for m, v in imgs.items()}
        # distance mode is the noisy one: compare against its chunk sd
        sd = imgs["distance"].mean(axis=(1, 2, 3)).std() / np.sqrt(8)
        for m in ("equiangular", "multiple_importance"):
            assert abs(means[m] - means["distance"]) < 4.0 * sd + 0.01, \
                (means, sd)
        var_d = imgs["distance"].var(0).mean()
        for m in ("equiangular", "multiple_importance"):
            var_m = imgs[m].var(0).mean()
            assert var_m < var_d / 3.0, (m, var_m, var_d)


class TestHeterogeneous:
    def test_majorant_estimated(self):
        scene = examples.het_volume_furnace(12, 12)
        scene.device_update()
        kg = scene.make_kernel_globals()
        assert kg["features"]["has_heterogeneous"]
        smax = np.asarray(kg["shader_sigma_max"])
        assert smax.max() > 0.5  # density up to ~1 -> majorant ~2x

    def test_het_furnace_conserves_energy(self):
        """Delta tracking through a noise-density scattering medium in a
        unit furnace must stay at 1 (null collisions + albedo weights)."""
        scene = examples.het_volume_furnace(16, 16, density=1.0)
        img = render(scene, 16, 16, spp=32)
        assert np.isfinite(img).all()
        assert abs(float(img.mean()) - 1.0) < 0.05, img.mean()

    def test_het_denser_darkens_cornell(self):
        base = examples.smoke_cornell(16, 16, spp=8, density=0.004)
        img_h = render(base, 16, 16, 8)
        scene = examples.smoke_cornell(16, 16, spp=8, density=0.004)
        # swap the homogeneous smoke for an absorbing noise volume
        vol = examples.het_volume_shader("smoke2", scale=0.01, density=0.01)
        for s in scene.shaders:
            if s.name == "smoke":
                s.graph = vol.graph
        img = render(scene, 16, 16, 8)
        assert np.isfinite(img).all()
        assert img.mean() > 0.01


class TestNestedVolumes:
    def test_object_inside_fog_restores_medium(self):
        """A ray passing through a transparent box inside fog must be
        back inside the fog after exiting the box (2-level stack)."""
        from raytracingproject_tpu.models import Object, Shader, ShaderGraph
        from raytracingproject_tpu.models import shader_nodes as sn
        from raytracingproject_tpu.models.mesh import make_box_mesh
        scene = examples.volume_furnace(16, 16, density=0.8)
        # transparent box inside the fog
        g = ShaderGraph()
        t = g.add(sn.TransparentBsdfNode("t"))
        g.connect(t, "bsdf", g.output_node, "surface")
        tr = Shader("clear", g)
        scene.add_shader(tr)
        inner = make_box_mesh((-0.4, -0.4, -0.4), (0.4, 0.4, 0.4), 0,
                              "inner")
        inner.used_shaders = [tr]
        scene.add_object(Object("inner", inner))
        img = render(scene, 16, 16, spp=48)
        assert np.isfinite(img).all()
        # pure-scattering albedo-1 fog + lossless transparent box in a
        # unit furnace must still conserve energy
        assert abs(float(img.mean()) - 1.0) < 0.05, img.mean()


class TestNestedStack:
    """K-level volume stack (ref: kernel_types.h:1035 VolumeStack +
    kernel_volume.h stack enter/exit): triple-nested absorbing media
    must attenuate by every enclosing medium, not just the top two."""

    D_IN, D_MID, D_OUT = 0.8, 0.6, 0.4

    def _scene(self, depth):
        from raytracingproject_tpu.app.examples import (
            Scene, Object, volume_shader, make_box_mesh,
            background_shader)
        from raytracingproject_tpu.utils import transform as tfm
        scene = Scene()
        scene.camera.set("matrix",
                         tfm.look_at((0, -6, 0), (0, 0, 0), (0, 0, 1)))
        scene.camera.set("fov", 0.25)
        scene.camera.set("width", 8)
        scene.camera.set("height", 8)
        for nm, half, dens in (("outer", 1.5, self.D_OUT),
                               ("mid", 1.0, self.D_MID),
                               ("inner", 0.5, self.D_IN)):
            # pure absorption: color=0 (no scatter), absorption_color=0
            sh = volume_shader(nm, color=(0, 0, 0), density=dens,
                               absorption=(0, 0, 0))
            scene.add_shader(sh)
            box = make_box_mesh((-half,) * 3, (half,) * 3, 0,
                                nm + "_box")
            box.used_shaders = [sh]
            scene.add_object(Object(nm, box))
        scene.background.shader = background_shader("bg", (1, 1, 1), 1.0)
        scene.integrator.set("max_bounce", 32)
        scene.integrator.set("transparent_max_bounce", 16)
        scene.integrator.set("sample_clamp_indirect", 0.0)
        scene.integrator.set("volume_stack_depth", depth)
        return scene

    def _center(self, depth, spp=128):
        sc = self._scene(depth)
        sc.camera.set("width", 16)
        sc.camera.set("height", 16)
        img = render(sc, 16, 16, spp)
        assert np.isfinite(img).all()
        return float(img[5:11, 5:11].mean())

    def test_triple_nesting_attenuates_all_levels(self):
        # ray path: 1.0 in outer-only, 1.0 in mid-only, 1.0 in inner;
        # absorption is sampled by termination, so the estimate is
        # binomial — 6x6 px * 128 spp puts 1 std at ~0.005
        expect = np.exp(-(self.D_IN + self.D_MID + self.D_OUT))
        wrong = np.exp(-(self.D_IN + self.D_MID + self.D_OUT * 0.5))
        got = self._center(depth=4)
        got2 = self._center(depth=2)
        assert abs(got - expect) < 0.02, (got, expect)
        # with only 2 slots the outer medium is forgotten while inside
        # the inner box, so its back half-thickness goes unattenuated —
        # the regression the K-level stack fixes
        assert abs(got2 - wrong) < 0.02, (got2, wrong)
        assert got2 - got > 0.02, (got2, got)

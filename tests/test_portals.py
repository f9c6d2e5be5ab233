"""Light portals guiding background sampling (ref: kernel_light.h
background portal sampling; light.h is_portal)."""

import numpy as np

from raytracingproject_tpu.models import Scene, Object, Light
from raytracingproject_tpu.models.mesh import make_plane_mesh
from raytracingproject_tpu.session import Session, SessionParams
from raytracingproject_tpu.utils import transform as tfm
from raytracingproject_tpu.app.examples import (diffuse_shader,
                                                background_shader)


def _room(with_portal, w=20, h=20):
    """Closed box with one open wall (the window); constant white sky.
    Camera inside looking at the back wall."""
    scene = Scene()
    scene.camera.set("matrix", tfm.look_at(
        (0, -8, 0), (0, 10, 0), (0, 0, 1)))
    scene.camera.set("fov", 0.9)
    scene.camera.set("width", w)
    scene.camera.set("height", h)
    mat = diffuse_shader("wall", (0.7, 0.7, 0.7))
    scene.add_shader(mat)
    s = 10.0
    walls = [
        make_plane_mesh((-s, -s, -s), (2 * s, 0, 0), (0, 2 * s, 0)),  # floor
        make_plane_mesh((-s, -s, s), (0, 2 * s, 0), (2 * s, 0, 0)),   # ceil
        make_plane_mesh((-s, s, -s), (2 * s, 0, 0), (0, 0, 2 * s)),   # back
        make_plane_mesh((-s, -s, -s), (0, 2 * s, 0), (0, 0, 2 * s)),  # left
        make_plane_mesh((s, -s, -s), (0, 0, 2 * s), (0, 2 * s, 0)),   # right
        # front wall (behind camera) has a 6x6 window hole: 4 strips
        make_plane_mesh((-s, -s, -s), (2 * s, 0, 0), (0, 0, s - 3)),
        make_plane_mesh((-s, -s, 3), (2 * s, 0, 0), (0, 0, s - 3)),
        make_plane_mesh((-s, -s, -3), (s - 3, 0, 0), (0, 0, 6)),
        make_plane_mesh((3, -s, -3), (s - 3, 0, 0), (0, 0, 6)),
    ]
    for i, m in enumerate(walls):
        m.used_shaders = [mat]
        scene.add_object(Object(f"wall{i}", m))
    scene.background.shader = background_shader("sky", (1, 1, 1), 1.0)
    scene.add_light(Light("bg", light_type="background"))
    scene.integrator.set("max_bounce", 3)
    # no firefly clamping: the no-portal estimator has rare huge
    # spikes; clamping them would bias the comparison
    scene.integrator.set("sample_clamp_direct", 0.0)
    scene.integrator.set("sample_clamp_indirect", 0.0)
    if with_portal:
        portal = Light("portal")
        portal.set("light_type", "area")
        portal.set("is_portal", True)
        portal.set("co", (0.0, -10.0, 0.0))
        portal.set("axisu", (1.0, 0.0, 0.0))
        portal.set("axisv", (0.0, 0.0, 1.0))
        portal.set("sizeu", 6.0)
        portal.set("sizev", 6.0)
        scene.add_light(portal)
    return scene


def _render(with_portal, spp, max_bounce=None, size=20):
    scene = _room(with_portal, size, size)
    if max_bounce is not None:
        scene.integrator.set("max_bounce", max_bounce)
        scene.integrator.set("min_bounce", min(max_bounce, 8))
    sess = Session(scene, SessionParams(samples=spp))
    sess.reset()
    return sess.render()[..., :3].mean(-1)


class TestPortals:
    def test_unbiased_at_deep_bounces(self):
        # NEE and BSDF MIS halves truncate asymmetrically at max_bounce
        # (the final bounce keeps only the NEE half), and portals shift
        # energy into the NEE half -- so equality holds only once the
        # tail is negligible: compare at deep max_bounce
        ref_off = _render(False, 1024, max_bounce=12, size=10)
        ref_on = _render(True, 384, max_bounce=12, size=10)
        assert abs(ref_on.mean() - ref_off.mean()) \
            < 0.06 * max(ref_off.mean(), 1e-6)

    def test_lower_variance_at_low_spp(self):
        # each variant against its own converged reference
        ref_off = _render(False, 512)
        ref_on = _render(True, 256)
        lo_off = _render(False, 8)
        lo_on = _render(True, 8)
        e_off = float(((lo_off - ref_off) ** 2).mean())
        e_on = float(((lo_on - ref_on) ** 2).mean())
        assert e_on < e_off * 0.8


class TestPortalBranched:
    def test_branched_lobe_split_unbiased_with_portals(self):
        """Portal-aware branched NEE: lobe_split stratifies the
        placement random lu (which carries the portal-vs-map decision)
        on a Latin-ROTATED branch index — the raw index would lock each
        light's portal decision to the branch bin that picks it. The
        branched estimator must agree with plain path tracing."""
        import jax
        import jax.numpy as jnp
        from raytracingproject_tpu.ops import integrator as integ
        scene = _room(True, 12, 12)
        scene.integrator.set("max_bounce", 4)
        scene.device_update()
        kg = scene.make_kernel_globals()
        yy, xx = np.mgrid[0:12, 0:12]
        px = jnp.asarray(xx.reshape(-1), jnp.int32)
        py = jnp.asarray(yy.reshape(-1), jnp.int32)
        pidx = py * 12 + px
        Lp, _ = jax.jit(lambda a, b, c: integ.render_samples(
            kg, a, b, c, 0, 96))(px, py, pidx)
        Lb, _ = jax.jit(lambda a, b, c: integ.render_samples_branched(
            kg, a, b, c, 0, 24, 4, lobe_split=True))(px, py, pidx)
        imp = float(np.asarray(Lp).mean()) / 96
        imb = float(np.asarray(Lb).mean()) / 96
        assert abs(imp - imb) < 0.06 * max(imp, 1e-6), (imp, imb)

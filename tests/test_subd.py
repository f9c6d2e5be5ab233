"""Adaptive subdivision tests (ref: subd/subd_split.h DiagSplit,
render/mesh_subdivision.cpp; models/subd.py).

Correctness invariants: conforming refinement never creates
T-junctions (every interior edge is shared by exactly 2 triangles),
the split cases preserve area exactly, the dicing metric is honored,
Loop subdivision converges an icosahedron toward the sphere, and the
scene hook dices before displacement."""

import numpy as np

from raytracingproject_tpu.models import subd
from raytracingproject_tpu.models import Scene, Object
from raytracingproject_tpu.models.mesh import Mesh, make_sphere_mesh
from raytracingproject_tpu.utils import transform as tfm


def tri_area_sum(v, t):
    a = v[t[:, 1]] - v[t[:, 0]]
    b = v[t[:, 2]] - v[t[:, 0]]
    return 0.5 * np.linalg.norm(np.cross(a, b), axis=-1).sum()


def edge_use_counts(tris):
    e = np.sort(np.stack([tris, np.roll(tris, -1, axis=1)],
                         -1).reshape(-1, 2), axis=1)
    _, counts = np.unique(e, axis=0, return_counts=True)
    return counts


def grid_mesh(n=4, size=2.0):
    xs = np.linspace(-size / 2, size / 2, n + 1)
    vv, tt = [], []
    for j in range(n + 1):
        for i in range(n + 1):
            vv.append((xs[i], xs[j], 0.0))
    for j in range(n):
        for i in range(n):
            a = j * (n + 1) + i
            b, c, d = a + 1, a + n + 1, a + n + 2
            tt += [(a, b, d), (a, d, c)]
    return np.array(vv, np.float32), np.array(tt, np.int64)


class TestConformingSplit:
    def test_adaptive_split_no_t_junctions_and_area(self):
        v, t = grid_mesh(4)
        area0 = tri_area_sum(v, t)
        # mark edges near the origin only -> mixed split cases
        def mark(edges):
            mid = 0.5 * (v2[edges[:, 0]] + v2[edges[:, 1]])
            return np.linalg.norm(mid, axis=-1) < 0.8
        v2 = v
        uv = np.tile(np.array([[0, 0], [1, 0], [1, 1]], np.float32),
                     (len(t), 1, 1))
        out = subd.split_round(v2, t, mark, uv)
        assert out[4] > 0
        v2_, t2, uv2 = out[0], out[1], out[2]
        counts = edge_use_counts(t2)
        assert counts.max() <= 2, "T-junction or non-manifold edge"
        np.testing.assert_allclose(tri_area_sum(v2_, t2), area0,
                                   rtol=1e-5)
        assert len(uv2) == len(t2)

    def test_all_cases_cover_parent(self):
        # one triangle, every split mask: area conserved
        v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        t = np.array([[0, 1, 2]], np.int64)
        for mask in range(8):
            bits = [(mask >> 2) & 1, (mask >> 1) & 1, mask & 1]
            def mark(edges, bits=bits):
                # edge k connects corners (k, k+1); identify by verts
                out = np.zeros(len(edges), bool)
                pairs = [(0, 1), (1, 2), (0, 2)]
                for k, pr in enumerate(pairs):
                    sel = (edges[:, 0] == pr[0]) & (edges[:, 1] == pr[1])
                    out |= sel & bool(bits[k])
                return out
            out = subd.split_round(v, t, mark)
            t2 = out[1]
            np.testing.assert_allclose(
                tri_area_sum(out[0], t2), 0.5, rtol=1e-6)
            assert len(t2) == 1 + sum(bits)


class TestDicingMetric:
    def test_subdivide_until_target(self):
        v, t = grid_mesh(2, size=4.0)
        cam_pos = np.array([0.0, 0.0, 10.0])
        pixel_angle = 0.002
        v2, t2, _, sh, sm, _, levels = subd.subdivide_mesh(
            v, t, None, np.zeros(len(t), np.int32),
            np.zeros(len(t), bool), "linear", 6, 64.0, cam_pos,
            pixel_angle)
        edges = np.sort(np.stack(
            [t2, np.roll(t2, -1, 1)], -1).reshape(-1, 2), 1)
        edges = np.unique(edges, axis=0)
        px = subd.screen_edge_px(v2[edges[:, 0]], v2[edges[:, 1]],
                                 cam_pos, pixel_angle)
        assert px.max() <= 64.0 + 1e-3
        assert levels >= 2
        assert len(sh) == len(t2) and len(sm) == len(t2)

    def test_level_cap_respected(self):
        v, t = grid_mesh(1, size=100.0)
        v2, t2, _, _, _, _, levels = subd.subdivide_mesh(
            v, t, None, np.zeros(len(t), np.int32),
            np.zeros(len(t), bool), "linear", 2, 0.01,
            np.array([0, 0, 10.0]), 0.001)
        assert levels == 2
        assert len(t2) <= len(t) * 16


class TestLoop:
    def test_icosahedron_rounds_toward_sphere(self):
        # icosahedron vertices
        p = (1 + np.sqrt(5)) / 2
        v = np.array([[-1, p, 0], [1, p, 0], [-1, -p, 0], [1, -p, 0],
                      [0, -1, p], [0, 1, p], [0, -1, -p], [0, 1, -p],
                      [p, 0, -1], [p, 0, 1], [-p, 0, -1], [-p, 0, 1]],
                     np.float32)
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        t = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10],
                      [0, 10, 11], [1, 5, 9], [5, 11, 4], [11, 10, 2],
                      [10, 7, 6], [7, 1, 8], [3, 9, 4], [3, 4, 2],
                      [3, 2, 6], [3, 6, 8], [3, 8, 9], [4, 9, 5],
                      [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
                     np.int64)
        def spread(v, t):
            r = np.linalg.norm(v[np.unique(t)], axis=-1)
            return r.std() / r.mean()
        v1, t1, _, _, _ = subd.loop_subdivide(v, t)
        v2, t2, _, _, _ = subd.loop_subdivide(v1, t1)
        # Loop converges to a smooth limit surface: after two rounds
        # the 162-vertex mesh must be very round (tiny radius spread;
        # naive midpoint splitting would give ~5% chord flattening
        # spread) and must not collapse
        assert spread(v2, t2) < 0.01, spread(v2, t2)
        assert 0.5 < np.linalg.norm(v2, axis=-1).mean() < 1.01
        counts = edge_use_counts(t2)
        assert (counts == 2).all()  # closed manifold stays closed


class TestSceneHook:
    def test_mesh_dices_and_displaces(self):
        from raytracingproject_tpu.app import examples
        from raytracingproject_tpu.models import (Shader, ShaderGraph,
                                                  shader_nodes as sn)
        scene = Scene()
        scene.camera.set("matrix",
                         tfm.look_at((0, -5, 1), (0, 0, 0), (0, 0, 1)))
        scene.camera.set("width", 64)
        scene.camera.set("height", 64)
        m = Mesh("plane")
        m.set_mesh(np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0],
                             [-1, 1, 0]], np.float32),
                   np.array([[0, 1, 2], [0, 2, 3]], np.int32))
        m.set("subdivision_type", "linear")
        m.set("max_subdivisions", 4)
        m.set("dicing_rate", 8.0)
        m.used_shaders = [examples.diffuse_shader("w", (0.8, 0.8, 0.8))]
        scene.add_shader(m.used_shaders[0])
        scene.add_object(Object("plane", m))
        scene.device_update()
        P = scene.dscene["arrays"]["tri_verts"].shape[0]
        assert P > 2 * 4, P  # actually diced
        # re-sync uses the cache (same key -> same refined mesh object)
        refined1 = m._subd_cache[1]
        scene.device_update()
        assert m._subd_cache[1] is refined1

    def test_catmull_clark_smooths_sphere(self):
        scene = Scene()
        scene.camera.set("matrix",
                         tfm.look_at((0, -6, 0), (0, 0, 0), (0, 0, 1)))
        scene.camera.set("width", 128)
        scene.camera.set("height", 128)
        from raytracingproject_tpu.app import examples
        sph = make_sphere_mesh((0, 0, 0), 1.0, 0, nlat=6, nlon=12)
        sph.set("subdivision_type", "catmull_clark")
        sph.set("max_subdivisions", 2)
        sph.set("dicing_rate", 4.0)
        sph.used_shaders = [examples.diffuse_shader("w", (0.8,) * 3)]
        scene.add_shader(sph.used_shaders[0])
        scene.add_object(Object("s", sph))
        scene.device_update()
        tv = scene.dscene["arrays"]["tri_verts"]
        assert tv.shape[0] > sph.num_triangles
        r = np.linalg.norm(tv.reshape(-1, 3), axis=-1)
        assert r.std() / r.mean() < 0.08  # smooth, near-spherical


def quad_grid(n=4, size=2.0, z=None):
    xs = np.linspace(-size / 2, size / 2, n + 1)
    vv = []
    for j in range(n + 1):
        for i in range(n + 1):
            h = 0.0 if z is None else z(xs[i], xs[j])
            vv.append((xs[i], xs[j], h))
    quads = []
    for j in range(n):
        for i in range(n):
            a = j * (n + 1) + i
            quads.append((a, a + 1, a + n + 2, a + n + 1))
    return np.array(vv, np.float64), np.array(quads, np.int64)


def cube_cage():
    v = np.array([(x, y, z) for z in (-1, 1) for y in (-1, 1)
                  for x in (-1, 1)], np.float64)
    quads = np.array([
        (0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
        (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3)], np.int64)
    return v, quads


def naive_cc_round(v, faces):
    """Independent dict-based Catmull-Clark (textbook formulation) used
    as a parity twin for the vectorized catmull_clark_round."""
    v = [np.asarray(p, np.float64) for p in v]
    faces = [list(f) for f in faces]
    fpts = [sum(v[i] for i in f) / len(f) for f in faces]
    efaces, everts = {}, {}
    for fi, f in enumerate(faces):
        for k in range(len(f)):
            e = tuple(sorted((f[k], f[(k + 1) % len(f)])))
            efaces.setdefault(e, []).append(fi)
    epts = {}
    for e, fs in efaces.items():
        a, b = v[e[0]], v[e[1]]
        if len(fs) == 2:
            epts[e] = (a + b + fpts[fs[0]] + fpts[fs[1]]) / 4.0
        else:
            epts[e] = (a + b) / 2.0
    vedges = {}
    vfaces = {}
    for e in efaces:
        for vi in e:
            vedges.setdefault(vi, []).append(e)
    for fi, f in enumerate(faces):
        for vi in f:
            vfaces.setdefault(vi, []).append(fi)
    vnew = []
    for vi in range(len(v)):
        es = vedges.get(vi, [])
        bnd = [e for e in es if len(efaces[e]) == 1]
        if len(bnd) == 0:
            n = len(es)
            F = sum(fpts[fi] for fi in vfaces[vi]) / len(vfaces[vi])
            R = sum((v[e[0]] + v[e[1]]) / 2 for e in es) / n
            vnew.append((F + 2 * R + (n - 3) * v[vi]) / n)
        elif len(bnd) == 2:
            nb = [e[0] if e[1] == vi else e[1] for e in bnd]
            vnew.append(0.75 * v[vi] + 0.125 * (v[nb[0]] + v[nb[1]]))
        else:
            vnew.append(v[vi])
    eid = {e: i for i, e in enumerate(sorted(epts))}
    V, E = len(v), len(epts)
    out_faces = []
    for fi, f in enumerate(faces):
        m = len(f)
        for k in range(m):
            e_out = tuple(sorted((f[k], f[(k + 1) % m])))
            e_in = tuple(sorted((f[(k - 1) % m], f[k])))
            out_faces.append((f[k], V + eid[e_out], V + E + fi,
                              V + eid[e_in]))
    pts = np.array(vnew + [epts[e] for e in sorted(epts)] + fpts)
    return pts, np.array(out_faces, np.int64)


class TestCatmullClarkQuads:
    """True CC on quad cages (ref: render/mesh_subdivision.cpp
    OpenSubdiv path; subd.catmull_clark_round / cc_limit)."""

    def test_round_matches_naive_twin_closed(self):
        v, quads = cube_cage()
        P2, fv2, flen2, parent, _ = subd.catmull_clark_round(
            v, quads.reshape(-1), np.full(len(quads), 4, np.int64))
        ref_pts, ref_faces = naive_cc_round(v, quads)
        assert (flen2 == 4).all()
        # same vertex count and face count
        assert len(P2) == len(ref_pts)
        assert len(flen2) == len(ref_faces)
        # vertex points (first V) must agree exactly in order; edge/face
        # point ORDER may differ, so compare as sorted multisets
        np.testing.assert_allclose(P2[:len(v)], ref_pts[:len(v)],
                                   atol=1e-12)
        a = np.sort(np.round(P2[len(v):], 9).view([('', P2.dtype)] * 3),
                    axis=0)
        b = np.sort(np.round(ref_pts[len(v):], 9).view(
            [('', ref_pts.dtype)] * 3), axis=0)
        assert (a == b).all()

    def test_round_matches_naive_twin_boundary(self):
        # cube missing one face -> boundary ring exercises crease rules
        v, quads = cube_cage()
        quads = quads[:-1]
        rng = np.random.default_rng(7)
        v = v + 0.1 * rng.standard_normal(v.shape)
        P2, fv2, flen2, _, _ = subd.catmull_clark_round(
            v, quads.reshape(-1), np.full(len(quads), 4, np.int64))
        ref_pts, _ = naive_cc_round(v, quads)
        np.testing.assert_allclose(P2[:len(v)], ref_pts[:len(v)],
                                   atol=1e-12)

    def test_ngon_cage_becomes_quads(self):
        # pentagon + triangle sharing an edge
        v = np.array([(0, 0, 0), (2, 0, 0), (2.6, 1.9, 0), (1, 3.1, 0),
                      (-0.6, 1.9, 0), (3.5, 1.0, 0)], np.float64)
        faces = [[0, 1, 2, 3, 4], [1, 5, 2]]
        fv = np.concatenate([np.array(f) for f in faces])
        flen = np.array([5, 3], np.int64)
        P2, fv2, flen2, parent, _ = subd.catmull_clark_round(v, fv, flen)
        assert (flen2 == 4).all()
        assert len(flen2) == 8  # one quad per corner slot
        assert list(parent) == [0] * 5 + [1] * 3

    def test_limit_matches_bspline_in_regular_region(self):
        # in a regular (valence-4, all-quad) region the CC limit equals
        # the bicubic B-spline limit mask (16P + 4 sum(N) + sum(D))/36
        rng = np.random.default_rng(3)
        v, quads = quad_grid(4, z=lambda x, y: 0.0)
        v[:, 2] = 0.3 * rng.standard_normal(len(v))
        lim = subd.cc_limit(v, quads.reshape(-1),
                            np.full(len(quads), 4, np.int64))
        n = 4
        vid = 2 * (n + 1) + 2  # interior vertex, all nbrs interior
        N = [vid - 1, vid + 1, vid - (n + 1), vid + (n + 1)]
        D = [vid - n - 2, vid - n, vid + n, vid + n + 2]
        expect = (16 * v[vid] + 4 * sum(v[i] for i in N)
                  + sum(v[i] for i in D)) / 36.0
        np.testing.assert_allclose(lim[vid], expect, atol=1e-12)

    def test_flat_grid_stays_flat(self):
        v, quads = quad_grid(5)
        out = subd.subdivide_quad_mesh(
            v, quads.reshape(-1), np.full(len(quads), 4, np.int64),
            None, np.zeros(len(quads), np.int32),
            np.ones(len(quads), bool), "catmull_clark", 3, 0.5,
            cam_pos=np.array([0.0, 0.0, 10.0]), pixel_angle=1e-3)
        v2, t2, _, sh2, sm2, _, levels = out
        assert levels >= 1
        assert np.abs(v2[:, 2]).max() < 1e-6          # stays planar
        assert (edge_use_counts(np.asarray(t2, np.int64)) <= 2).all()
        assert len(sh2) == len(t2) and len(sm2) == len(t2)

    def test_closed_cage_stays_watertight_and_shrinks(self):
        v, quads = cube_cage()
        out = subd.subdivide_quad_mesh(
            v, quads.reshape(-1), np.full(len(quads), 4, np.int64),
            None, np.zeros(len(quads), np.int32),
            np.ones(len(quads), bool), "catmull_clark", 3, 0.5,
            cam_pos=np.array([0.0, 0.0, 10.0]), pixel_angle=1e-3)
        v2, t2, _, _, _, _, levels = out
        assert levels == 3
        counts = edge_use_counts(np.asarray(t2, np.int64))
        assert (counts == 2).all()                    # closed surface
        r = np.linalg.norm(v2, axis=1)
        assert r.max() < np.sqrt(3.0)                 # inside the cage
        assert r.min() > 0.5
        # octahedral symmetry of the cube is preserved by CC
        flipped = v2 * np.array([-1.0, 1.0, 1.0])
        d = np.abs(flipped[:, None, :] - v2[None, :, :]).sum(-1).min(1)
        assert d.max() < 1e-5

    def test_uv_continuity_across_quads(self):
        v, quads = quad_grid(3)
        # continuous linear uv over the cage, per corner
        uv = ((v[quads.reshape(-1), :2] + 1.5) / 3.0)
        v2, t2, uv2, _, _, _, levels = subd.subdivide_quad_mesh(
            v, quads.reshape(-1), np.full(len(quads), 4, np.int64),
            uv, np.zeros(len(quads), np.int32), np.ones(len(quads), bool),
            "catmull_clark", 2, 0.5,
            cam_pos=np.array([0.0, 0.0, 10.0]), pixel_angle=1e-3)
        assert levels >= 1 and uv2 is not None
        # corners that share a vertex id must carry identical uv
        flat_ids = np.asarray(t2, np.int64).reshape(-1)
        flat_uv = uv2.reshape(-1, 2)
        order = np.argsort(flat_ids, kind="stable")
        ids_s, uv_s = flat_ids[order], flat_uv[order]
        same = ids_s[1:] == ids_s[:-1]
        assert np.abs(uv_s[1:][same] - uv_s[:-1][same]).max() < 1e-6

    def test_motion_verts_refined_identically(self):
        v, quads = cube_cage()
        shift = np.array([0.3, -0.1, 0.2])
        out_a = subd.subdivide_quad_mesh(
            v, quads.reshape(-1), np.full(len(quads), 4, np.int64),
            None, np.zeros(len(quads), np.int32),
            np.ones(len(quads), bool), "catmull_clark", 2, 0.5,
            cam_pos=np.array([0.0, 0.0, 10.0]), pixel_angle=1e-3,
            extra_verts=(v + shift,))
        v2, _, _, _, _, extra2, _ = out_a
        np.testing.assert_allclose(extra2[0], v2 + shift, atol=1e-5)

    def test_scene_sync_dices_cage(self):
        from raytracingproject_tpu.app import examples
        v, quads = cube_cage()
        m = Mesh("cage")
        m.set_subd_mesh(v, quads)
        m.set("subdivision_type", "catmull_clark")
        m.set("max_subdivisions", 2)
        m.set("dicing_rate", 1.0)
        m.used_shaders = [examples.diffuse_shader("w", (0.8, 0.8, 0.8))]
        scene = Scene()
        scene.camera.set("matrix",
                         tfm.look_at((0, -6, 0), (0, 0, 0), (0, 0, 1)))
        scene.camera.set("width", 64)
        scene.camera.set("height", 64)
        scene.add_shader(m.used_shaders[0])
        scene.add_object(Object("cage", m))
        scene.device_update()
        tv = scene.dscene["arrays"]["tri_verts"]
        assert tv.shape[0] >= len(quads) * 4 * 2  # at least one CC round
        # smooth: diced cube verts pulled inside the cage
        r = np.linalg.norm(tv.reshape(-1, 3), axis=-1)
        assert r.max() < np.sqrt(3.0) - 1e-4


class TestCageUVConventions:
    def test_set_subd_mesh_corner_uv_serves_both_paths(self):
        """Cage UVs live in subd_uv (per cage corner); set_subd_mesh
        derives the matching triangle-corner std_uv for the linear
        fallback, so the two conventions never fight."""
        v, quads = cube_cage()
        uv = np.tile(np.array([[0, 0], [1, 0], [1, 1], [0, 1]],
                              np.float32), (len(quads), 1))
        m = Mesh("cage")
        m.set_subd_mesh(v, quads, corner_uv=uv)
        su = m.attribute_get("subd_uv")
        assert su is not None and len(su.data) == quads.size
        su2 = m.attribute_get("std_uv")
        assert su2 is not None
        # fallback triangulation: 2 tris per quad, 3 corners each
        assert len(np.asarray(su2.data).reshape(-1, 2)) \
            == len(quads) * 2 * 3
        # the cage path picks up subd_uv through scene sync
        m.set("subdivision_type", "catmull_clark")
        m.set("max_subdivisions", 1)
        m.set("dicing_rate", 1.0)
        from raytracingproject_tpu.app import examples
        m.used_shaders = [examples.diffuse_shader("w", (0.8,) * 3)]
        scene = Scene()
        scene.camera.set("matrix",
                         tfm.look_at((0, -6, 0), (0, 0, 0), (0, 0, 1)))
        scene.camera.set("width", 32)
        scene.camera.set("height", 32)
        scene.add_shader(m.used_shaders[0])
        scene.add_object(Object("cage", m))
        scene.device_update()
        tuv = np.asarray(scene.dscene["arrays"]["tri_uv"])
        assert np.isfinite(tuv).all()
        assert tuv.min() >= 0.0 and tuv.max() <= 1.0

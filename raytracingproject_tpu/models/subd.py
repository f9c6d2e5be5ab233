"""Adaptive subdivision (capability ref: subd/subd_split.h:20-24
DiagSplit + subd/subd_dice.* and render/mesh_subdivision.cpp —
redesigned host-side, triangle-native).

The reference splits patches until every edge's screen-space length is
below the dicing rate (DiagSplit), guaranteeing crack-free seams by
assigning tessellation factors to EDGES (shared between patches). This
module keeps exactly that invariant on triangle meshes:

- each round marks EDGES whose projected length exceeds the dicing
  target; a triangle then splits according to how many of its edges are
  marked (1 -> 2, 2 -> 3, 3 -> 4 children). Because the split decision
  lives on the shared edge, neighbors always agree — no T-junctions by
  construction.
- `catmull_clark` smoothing runs Loop subdivision (the triangle-mesh
  analog of the reference's OpenSubdiv Catmull-Clark; quads are not a
  primitive here) in UNIFORM rounds while any edge exceeds the target,
  then a final adaptive linear pass dices the residue.

Runs at scene sync before displacement, so true displacement evaluates
on the diced vertices — the reference's displacement-on-dice pipeline
(render/geometry.cpp displacement step ordering).

Everything is vectorized NumPy; corner attributes (uv) ride the same
case tables, per-tri attributes (shader, smooth) inherit from parents.
"""

from __future__ import annotations

import numpy as np


def screen_edge_px(p0, p1, cam_pos, pixel_angle):
    """Approximate projected edge length in pixels: world length over
    (distance to the edge midpoint x pixel angle). Matches the
    reference's dicing metric to first order without a full raster
    projection (subd_dice.h sd.dicing_rate semantics)."""
    mid = 0.5 * (p0 + p1)
    dist = np.linalg.norm(mid - cam_pos, axis=-1)
    return np.linalg.norm(p1 - p0, axis=-1) / np.maximum(
        dist * pixel_angle, 1e-12)


def _edge_table(tris):
    """Unique undirected edges + per-tri edge ids.

    Returns (edges (E, 2) sorted pairs, tri_edge (T, 3) edge ids) where
    tri edge k connects corners k and (k+1)%3."""
    e = np.stack([tris, np.roll(tris, -1, axis=1)], axis=-1)  # (T,3,2)
    e_sorted = np.sort(e.reshape(-1, 2), axis=1)
    edges, inv = np.unique(e_sorted, axis=0, return_inverse=True)
    return edges, inv.reshape(-1, 3)


# child triangles as corner triples; entries 0-2 are parent corners,
# 3+k is the midpoint of edge k (corners k, k+1). One table per split
# mask (which of the 3 edges are marked), rotated into canonical form.
_SPLIT_CASES = {
    # mask (e0, e1, e2) -> list of child corner triples
    (0, 0, 0): [(0, 1, 2)],
    (1, 0, 0): [(0, 3, 2), (3, 1, 2)],
    (0, 1, 0): [(1, 4, 0), (4, 2, 0)],
    (0, 0, 1): [(2, 5, 1), (5, 0, 1)],
    (1, 1, 0): [(0, 3, 4), (3, 1, 4), (0, 4, 2)],
    (0, 1, 1): [(1, 4, 5), (4, 2, 5), (1, 5, 0)],
    (1, 0, 1): [(2, 5, 3), (5, 0, 3), (2, 3, 1)],
    (1, 1, 1): [(0, 3, 5), (3, 1, 4), (5, 4, 2), (3, 4, 5)],
}


def split_round(v, tris, edge_mark_fn, corner_uv=None, extra_verts=()):
    """One conforming refinement round.

    edge_mark_fn(edges) -> bool (E,) of edges to split. Returns
    (v2, tris2, uv2, extra2, nsplit)."""
    edges, tri_edge = _edge_table(tris)
    mark = edge_mark_fn(edges)
    nsplit = int(mark.sum())
    if nsplit == 0:
        return v, tris, corner_uv, tuple(extra_verts), 0
    # new vertex per marked edge
    new_id = np.full(len(edges), -1, np.int64)
    new_id[mark] = len(v) + np.arange(nsplit)
    mids = 0.5 * (v[edges[mark, 0]] + v[edges[mark, 1]])
    v2 = np.concatenate([v, mids]).astype(np.float32)
    extra2 = tuple(
        np.concatenate([ev, 0.5 * (ev[edges[mark, 0]]
                                   + ev[edges[mark, 1]])]).astype(ev.dtype)
        for ev in extra_verts)

    # per-tri corner index table: parent corners + (possibly -1) mids
    corner6 = np.concatenate([tris, new_id[tri_edge]], axis=1)  # (T, 6)
    masks = (new_id[tri_edge] >= 0)                              # (T, 3)

    out_tris, out_uv, out_parent = [], [], []
    mask_key = masks[:, 0].astype(int) * 4 + masks[:, 1] * 2 + masks[:, 2]
    for key, case in _SPLIT_CASES.items():
        sel = mask_key == (key[0] * 4 + key[1] * 2 + key[2])
        if not sel.any():
            continue
        c6 = corner6[sel]
        for tri_corners in case:
            out_tris.append(np.stack([c6[:, c] for c in tri_corners], 1))
            out_parent.append(np.nonzero(sel)[0])
            if corner_uv is not None:
                uv6 = np.concatenate([
                    corner_uv[sel],
                    0.5 * (corner_uv[sel] + np.roll(corner_uv[sel], -1,
                                                    axis=1))], axis=1)
                out_uv.append(np.stack([uv6[:, c] for c in tri_corners],
                                       1))
    tris2 = np.concatenate(out_tris).astype(tris.dtype)
    parent = np.concatenate(out_parent)
    uv2 = (np.concatenate(out_uv).astype(np.float32)
           if corner_uv is not None else None)
    return v2, tris2, uv2, extra2, nsplit, parent


def loop_subdivide(v, tris, corner_uv=None, extra_verts=()):
    """One uniform Loop round: 4-to-1 split + limit smoothing (the
    triangle analog of Catmull-Clark; standard Loop masks)."""
    edges, tri_edge = _edge_table(tris)
    E = len(edges)
    # edge -> opposite corners (for interior edge mask); boundary edges
    # have exactly one incident triangle
    opp_sum = np.zeros((E, 3))
    opp_cnt = np.zeros(E, np.int64)
    for k in range(3):
        eid = tri_edge[:, k]
        opp = tris[:, (k + 2) % 3]
        np.add.at(opp_sum, eid, v[opp])
        np.add.at(opp_cnt, eid, 1)
    a, b = v[edges[:, 0]], v[edges[:, 1]]
    interior = opp_cnt == 2
    new_pos = np.where(interior[:, None],
                       0.375 * (a + b) + 0.125 * opp_sum,
                       0.5 * (a + b))

    # old-vertex smoothing
    V = len(v)
    nbr_sum = np.zeros((V, 3))
    nbr_cnt = np.zeros(V, np.int64)
    np.add.at(nbr_sum, edges[:, 0], v[edges[:, 1]])
    np.add.at(nbr_sum, edges[:, 1], v[edges[:, 0]])
    np.add.at(nbr_cnt, edges[:, 0], 1)
    np.add.at(nbr_cnt, edges[:, 1], 1)
    n = np.maximum(nbr_cnt, 1)
    beta = (1.0 / n) * (0.625 - (0.375 + 0.25 * np.cos(2 * np.pi / n)) ** 2)
    smoothed = (1.0 - n * beta)[:, None] * v + beta[:, None] * nbr_sum
    # boundary vertices: 3/4 v + 1/8 (two boundary neighbors)
    bnd_edges = edges[~interior]
    if len(bnd_edges):
        bsum = np.zeros((V, 3))
        bcnt = np.zeros(V, np.int64)
        np.add.at(bsum, bnd_edges[:, 0], v[bnd_edges[:, 1]])
        np.add.at(bsum, bnd_edges[:, 1], v[bnd_edges[:, 0]])
        np.add.at(bcnt, bnd_edges[:, 0], 1)
        np.add.at(bcnt, bnd_edges[:, 1], 1)
        on_bnd = bcnt >= 2
        smoothed = np.where(on_bnd[:, None],
                            0.75 * v + 0.125 * bsum, smoothed)

    v2 = np.concatenate([smoothed, new_pos]).astype(np.float32)
    extra2 = tuple(np.concatenate(
        [ev, 0.5 * (ev[edges[:, 0]] + ev[edges[:, 1]])]).astype(ev.dtype)
        for ev in extra_verts)
    mid = V + tri_edge                                  # (T, 3) mid ids
    t0, t1, t2 = tris[:, 0], tris[:, 1], tris[:, 2]
    m0, m1, m2 = mid[:, 0], mid[:, 1], mid[:, 2]
    tris2 = np.concatenate([
        np.stack([t0, m0, m2], 1), np.stack([m0, t1, m1], 1),
        np.stack([m2, m1, t2], 1), np.stack([m0, m1, m2], 1),
    ]).astype(tris.dtype)
    if corner_uv is not None:
        u0, u1, u2 = (corner_uv[:, 0], corner_uv[:, 1], corner_uv[:, 2])
        mu0, mu1, mu2 = (0.5 * (u0 + u1), 0.5 * (u1 + u2),
                         0.5 * (u2 + u0))
        uv2 = np.concatenate([
            np.stack([u0, mu0, mu2], 1), np.stack([mu0, u1, mu1], 1),
            np.stack([mu2, mu1, u2], 1), np.stack([mu0, mu1, mu2], 1),
        ]).astype(np.float32)
    else:
        uv2 = None
    parent = np.tile(np.arange(len(tris)), 4)
    return v2, tris2, uv2, extra2, parent


# ---------------------------------------------------------------------------
# True Catmull-Clark on polygon control cages (ref capability:
# subd/subd_patch_table.cpp + render/mesh_subdivision.cpp OpenSubdiv
# path — redesigned as vectorized uniform refinement + limit stencils;
# quad assets get the genuine CC limit surface instead of the Loop
# stand-in above).
#
# Topology is carried as flat arrays: fv = corner vertex ids
# (sum(flen),), flen = corners per face (F,). The stencils depend only
# on topology, so positions and any extra per-vertex channels (motion
# verts) are stacked into one (V, C) matrix and refined together —
# motion geometry is smoothed bit-identically to rest geometry.
# ---------------------------------------------------------------------------


def _poly_slots(fv, flen):
    """Per corner-slot indexing: face id, next/prev slot in the face."""
    off = np.concatenate([[0], np.cumsum(flen)[:-1]])
    total = int(flen.sum())
    idx = np.arange(total)
    face_id = np.repeat(np.arange(len(flen)), flen)
    local = idx - off[face_id]
    nxt = off[face_id] + (local + 1) % flen[face_id]
    prv = off[face_id] + (local - 1) % flen[face_id]
    return face_id, nxt, prv


def _poly_edges(fv, flen):
    """Unique undirected edges over a polygon soup.

    Returns (edges (E,2), slot_edge (total,) edge id of the edge leaving
    each corner slot, edge_nface (E,) incident face count)."""
    face_id, nxt, _ = _poly_slots(fv, flen)
    pair = np.sort(np.stack([fv, fv[nxt]], axis=1), axis=1)
    edges, slot_edge = np.unique(pair, axis=0, return_inverse=True)
    edge_nface = np.bincount(slot_edge, minlength=len(edges))
    return edges, slot_edge, edge_nface


def catmull_clark_round(P, fv, flen, smooth=True):
    """One uniform Catmull-Clark round on an ngon cage.

    P is (V, C) — positions plus any stacked per-vertex channels.
    smooth=False gives the linear variant (midpoint/centroid insertion,
    old verts unchanged) used for subdivision_type == "linear".

    Returns (P2, quad_fv (F'*4,), quad_flen, parent_face (F',),
             slot_of_quad (F',) original corner slot per output quad)."""
    P = np.asarray(P, np.float64)
    V = len(P)
    F = len(flen)
    face_id, nxt, prv = _poly_slots(fv, flen)
    edges, slot_edge, edge_nface = _poly_edges(fv, flen)
    E = len(edges)

    # face points: centroid of each face
    fsum = np.zeros((F, P.shape[1]))
    np.add.at(fsum, face_id, P[fv])
    fpoint = fsum / flen[:, None]

    # edge points
    emid = 0.5 * (P[edges[:, 0]] + P[edges[:, 1]])
    efsum = np.zeros((E, P.shape[1]))
    np.add.at(efsum, slot_edge, fpoint[face_id])
    interior_e = edge_nface == 2
    if smooth:
        epoint = np.where(interior_e[:, None],
                          0.25 * (P[edges[:, 0]] + P[edges[:, 1]] + efsum),
                          emid)
    else:
        epoint = emid

    if smooth:
        # vertex points: interior (Fa + 2*Ra + (n-3)P)/n with Fa/Ra the
        # averages of adjacent face points / edge midpoints; boundary
        # crease rule 3/4 P + 1/8 (b0 + b1); corners (!=2 boundary
        # edges at a boundary vertex) pinned.
        n_edges = np.zeros(V, np.int64)
        np.add.at(n_edges, edges[:, 0], 1)
        np.add.at(n_edges, edges[:, 1], 1)
        msum = np.zeros((V, P.shape[1]))
        np.add.at(msum, edges[:, 0], emid)
        np.add.at(msum, edges[:, 1], emid)
        fasum = np.zeros((V, P.shape[1]))
        nface_v = np.zeros(V, np.int64)
        np.add.at(fasum, fv, fpoint[face_id])
        np.add.at(nface_v, fv, 1)
        n = np.maximum(n_edges, 1)
        fa = fasum / np.maximum(nface_v, 1)[:, None]
        ra = msum / n[:, None]
        vint = (fa + 2.0 * ra + (n - 3)[:, None] * P) / n[:, None]

        bnd = edges[~interior_e]
        nbnd = np.zeros(V, np.int64)
        bsum = np.zeros((V, P.shape[1]))
        if len(bnd):
            np.add.at(nbnd, bnd[:, 0], 1)
            np.add.at(nbnd, bnd[:, 1], 1)
            np.add.at(bsum, bnd[:, 0], P[bnd[:, 1]])
            np.add.at(bsum, bnd[:, 1], P[bnd[:, 0]])
        vcrease = 0.75 * P + 0.125 * bsum
        vnew = np.where((nbnd == 0)[:, None], vint,
                        np.where((nbnd == 2)[:, None], vcrease, P))
    else:
        vnew = P

    P2 = np.concatenate([vnew, epoint, fpoint])

    # one quad per corner slot: [corner, edge-out, face, edge-in]
    slot = np.arange(len(fv))
    quad = np.stack([fv,
                     V + slot_edge,
                     V + E + face_id,
                     V + slot_edge[prv]], axis=1)
    quad_fv = quad.reshape(-1)
    quad_flen = np.full(len(fv), 4, flen.dtype)
    return P2, quad_fv, quad_flen, face_id.copy(), slot


def catmull_clark_round_uv(uv, fv, flen):
    """Face-varying linear refinement matching catmull_clark_round's
    output quad order. uv is per corner slot (total, K); returns uv per
    corner slot of the refined all-quad mesh (total*4, K) (ref:
    OpenSubdiv FVAR_LINEAR_ALL semantics used for Cycles UVs)."""
    uv = np.asarray(uv, np.float64)
    face_id, nxt, prv = _poly_slots(fv, flen)
    off = np.concatenate([[0], np.cumsum(flen)[:-1]])
    fsum = np.zeros((len(flen), uv.shape[1]))
    np.add.at(fsum, face_id, uv)
    fuv = fsum / flen[:, None]
    e_out = 0.5 * (uv + uv[nxt])
    e_in = 0.5 * (uv[prv] + uv)
    return np.stack([uv, e_out, fuv[face_id], e_in],
                    axis=1).reshape(-1, uv.shape[1])


def cc_limit(P, fv, flen):
    """Project an all-quad cage's vertices to the Catmull-Clark limit
    surface. Interior valence-n mask (n^2 P + 4 sum(edge nbrs) +
    sum(diagonal nbrs)) / (n (n + 5)) — equal to the bicubic B-spline
    limit in the regular (n=4) region; boundary curve limit
    (b0 + 4 P + b1) / 6; corner vertices pinned."""
    P = np.asarray(P, np.float64)
    V = len(P)
    face_id, nxt, prv = _poly_slots(fv, flen)
    if not (flen == 4).all():
        raise ValueError("cc_limit requires an all-quad cage")
    edges, slot_edge, edge_nface = _poly_edges(fv, flen)

    n_edges = np.zeros(V, np.int64)
    np.add.at(n_edges, edges[:, 0], 1)
    np.add.at(n_edges, edges[:, 1], 1)
    esum = np.zeros((V, P.shape[1]))
    np.add.at(esum, edges[:, 0], P[edges[:, 1]])
    np.add.at(esum, edges[:, 1], P[edges[:, 0]])

    # diagonal (face-opposite) corner per slot: slot+2 within the quad
    diag = fv[nxt[nxt]]
    dsum = np.zeros((V, P.shape[1]))
    np.add.at(dsum, fv, P[diag])
    nface_v = np.zeros(V, np.int64)
    np.add.at(nface_v, fv, 1)

    n = np.maximum(n_edges, 1).astype(np.float64)
    lim_int = (n[:, None] ** 2 * P + 4.0 * esum + dsum) / \
        (n * (n + 5.0))[:, None]

    interior_e = edge_nface == 2
    bnd = edges[~interior_e]
    nbnd = np.zeros(V, np.int64)
    bsum = np.zeros((V, P.shape[1]))
    if len(bnd):
        np.add.at(nbnd, bnd[:, 0], 1)
        np.add.at(nbnd, bnd[:, 1], 1)
        np.add.at(bsum, bnd[:, 0], P[bnd[:, 1]])
        np.add.at(bsum, bnd[:, 1], P[bnd[:, 0]])
    lim_bnd = (bsum + 4.0 * P) / 6.0
    return np.where((nbnd == 0)[:, None], lim_int,
                    np.where((nbnd == 2)[:, None], lim_bnd, P))


def subdivide_quad_mesh(v, fv, flen, corner_uv, face_shader, face_smooth,
                        subdivision_type, max_level, dicing_px,
                        cam_pos, pixel_angle, to_world=None,
                        extra_verts=(), use_limit=True):
    """Dice a polygon control cage: uniform Catmull-Clark (or linear)
    rounds while any cage edge exceeds the screen-space dicing target,
    then limit projection, then triangulation for the kernel.

    Returns (v, tris (T,3), corner_uv (T,3,2)|None, shader, smooth,
    extra_verts, levels)."""
    v = np.asarray(v, np.float64).reshape(-1, 3)
    fv = np.asarray(fv, np.int64).reshape(-1)
    flen = np.asarray(flen, np.int64).reshape(-1)
    shader = np.asarray(face_shader, np.int32)
    smooth_f = np.asarray(face_smooth, bool)
    extra = [np.asarray(e, np.float64).reshape(len(v), -1)
             for e in extra_verts]
    widths = [e.shape[1] for e in extra]
    uv = (None if corner_uv is None
          else np.asarray(corner_uv, np.float64).reshape(len(fv), -1))
    smooth_rounds = subdivision_type == "catmull_clark"

    def world(p):
        if to_world is None:
            return p
        return p @ to_world[:3, :3].T + to_world[:3, 3]

    def needs_split(vv, ffv, ffl):
        edges, _, _ = _poly_edges(ffv, ffl)
        px = screen_edge_px(world(vv[edges[:, 0]]), world(vv[edges[:, 1]]),
                            cam_pos, pixel_angle)
        return bool((px > dicing_px).any())

    levels = 0
    while levels < max_level and needs_split(v, fv, flen):
        fv_prev, flen_prev = fv, flen
        Pstack = np.concatenate([v] + extra, axis=1)
        Pstack, fv, flen, parent, slot = catmull_clark_round(
            Pstack, fv, flen, smooth=smooth_rounds)
        if uv is not None:
            uv = catmull_clark_round_uv(uv, fv_prev, flen_prev)
        v, rest = Pstack[:, :3], Pstack[:, 3:]
        extra, c = [], 0
        for w in widths:
            extra.append(rest[:, c:c + w])
            c += w
        shader, smooth_f = shader[parent], smooth_f[parent]
        levels += 1

    if smooth_rounds and use_limit and levels > 0 and (flen == 4).all():
        Pstack = np.concatenate([v] + extra, axis=1)
        Pstack = cc_limit(Pstack, fv, flen)
        v, rest = Pstack[:, :3], Pstack[:, 3:]
        extra, c = [], 0
        for w in widths:
            extra.append(rest[:, c:c + w])
            c += w

    # triangulate: fan for ngons (levels == 0 path), (0,1,2)+(0,2,3)
    # for quads — matches the linear triangulation the kernel expects.
    tris, tri_uv, tri_parent = [], [], []
    off = np.concatenate([[0], np.cumsum(flen)[:-1]])
    for m in np.unique(flen):
        sel = flen == m
        base = off[sel]
        for k in range(int(m) - 2):
            c0, c1, c2 = 0, k + 1, k + 2
            tris.append(np.stack([fv[base + c0], fv[base + c1],
                                  fv[base + c2]], 1))
            tri_parent.append(np.nonzero(sel)[0])
            if uv is not None:
                tri_uv.append(np.stack([uv[base + c0], uv[base + c1],
                                        uv[base + c2]], 1))
    tris = np.concatenate(tris).astype(np.int32)
    parent = np.concatenate(tri_parent)
    uv_out = (np.concatenate(tri_uv).astype(np.float32)
              if uv is not None else None)
    extra_out = tuple(e.astype(np.float32) for e in extra)
    return (v.astype(np.float32), tris, uv_out, shader[parent],
            smooth_f[parent], extra_out, levels)


def subdivide_mesh(v, tris, corner_uv, tri_shader, tri_smooth,
                   subdivision_type, max_level, dicing_px,
                   cam_pos, pixel_angle, to_world=None, extra_verts=()):
    """Full adaptive pipeline. Returns (v, tris, corner_uv, shader,
    smooth, extra_verts, levels_used)."""
    v = np.asarray(v, np.float32)
    tris = np.asarray(tris, np.int64)
    shader = np.asarray(tri_shader, np.int32)
    smooth = np.asarray(tri_smooth, bool)
    extra = tuple(np.asarray(e) for e in extra_verts)

    def world(p):
        if to_world is None:
            return p
        return p @ to_world[:3, :3].T + to_world[:3, 3]

    def mark_fn(edges):
        px = screen_edge_px(world(v[edges[:, 0]]), world(v[edges[:, 1]]),
                            cam_pos, pixel_angle)
        return px > dicing_px

    levels = 0
    if subdivision_type == "catmull_clark":
        while levels < max_level:
            edges, _ = _edge_table(tris)
            if not mark_fn(edges).any():
                break
            v, tris, corner_uv, extra, parent = loop_subdivide(
                v, tris, corner_uv, extra)
            shader, smooth = shader[parent], smooth[parent]
            levels += 1
    else:
        while levels < max_level:
            res = split_round(v, tris, mark_fn, corner_uv, extra)
            if res[4] == 0:
                break
            v, tris, corner_uv, extra, _, parent = res
            shader, smooth = shader[parent], smooth[parent]
            levels += 1
    return (v, tris.astype(np.int32), corner_uv, shader, smooth, extra,
            levels)

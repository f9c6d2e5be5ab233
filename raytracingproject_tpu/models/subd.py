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

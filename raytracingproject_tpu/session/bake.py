"""Texture baking (ref: render/bake.cpp BakeManager, kernel/kernel_bake.h,
blender_python.cpp bake_func).

Pipeline:
1. host-side UV rasterization of the target mesh: each texel covered by
   a UV triangle gets (prim, barycentric) — the analog of the
   reference's bake primitive/differential passes
   (kernel_types.h:399-401);
2. probe rays are aimed at the corresponding world-space surface points
   and fed through the FULL wavefront integrator via the ray-override
   hook (kg["ray_override"]), so combined/diffuse/glossy bakes get real
   NEE + GI; data passes (normal/uv/emission/ao) come from the aux pass
   machinery.
"""

from __future__ import annotations

import numpy as np

from raytracingproject_tpu.utils import transform as tfm


def rasterize_uv(mesh, width, height):
    """Rasterize mesh UV triangles. Returns (prim (H,W) int32 -1=empty,
    bary_u, bary_v (H,W) float32) where bary are the MT-convention
    barycentrics of vertices 1 and 2."""
    tris = mesh.triangles_array
    uv_attr = mesh.attribute_get("std_uv")
    if uv_attr is None:
        raise ValueError("mesh has no uv attribute to bake into")
    if uv_attr.element == "corner":
        uv_c = uv_attr.data.reshape(-1, 3, 2)
    else:
        uv_c = uv_attr.data[tris]
    prim = np.full((height, width), -1, np.int32)
    bu = np.zeros((height, width), np.float32)
    bv = np.zeros((height, width), np.float32)
    for t in range(len(tris)):
        a, b, c = uv_c[t]  # (2,) each in [0,1]
        # texel-space verts (v flips: row 0 = v near 1)
        pa = np.array([a[0] * width, (1.0 - a[1]) * height])
        pb = np.array([b[0] * width, (1.0 - b[1]) * height])
        pc = np.array([c[0] * width, (1.0 - c[1]) * height])
        lo = np.floor(np.minimum(np.minimum(pa, pb), pc)).astype(int)
        hi = np.ceil(np.maximum(np.maximum(pa, pb), pc)).astype(int)
        lo = np.maximum(lo, 0)
        hi = np.minimum(hi, [width, height])
        if (hi <= lo).any():
            continue
        xs = np.arange(lo[0], hi[0]) + 0.5
        ys = np.arange(lo[1], hi[1]) + 0.5
        gx, gy = np.meshgrid(xs, ys)
        # barycentric via edge functions
        d = (pb[1] - pc[1]) * (pa[0] - pc[0]) \
            + (pc[0] - pb[0]) * (pa[1] - pc[1])
        if abs(d) < 1e-12:
            continue
        w0 = ((pb[1] - pc[1]) * (gx - pc[0])
              + (pc[0] - pb[0]) * (gy - pc[1])) / d
        w1 = ((pc[1] - pa[1]) * (gx - pc[0])
              + (pa[0] - pc[0]) * (gy - pc[1])) / d
        w2 = 1.0 - w0 - w1
        inside = (w0 >= -1e-6) & (w1 >= -1e-6) & (w2 >= -1e-6)
        yy, xx = np.nonzero(inside)
        prim[lo[1] + yy, lo[0] + xx] = t
        bu[lo[1] + yy, lo[0] + xx] = w1[yy, xx]
        bv[lo[1] + yy, lo[0] + xx] = w2[yy, xx]
    return prim, bu, bv


def bake(scene, obj, width, height, spp=16, probe_offset=1e-3,
         mode="combined", ao_distance=1e10):
    """Bake `obj` into a (H, W, 4) image (rgb + coverage mask).

    mode (ref: bake.cpp shader type switch / kernel_bake.h):
      "combined" — probe rays through the full integrator (real GI);
      "ao"       — cosine-hemisphere occlusion probes within
                   `ao_distance` (ref: kernel_bake.h AO bake);
      "normal"   — world-space shading normal remapped to [0, 1]
                   (no rays traced).
    """
    import jax
    import jax.numpy as jnp
    from raytracingproject_tpu.ops import integrator as integ

    mesh = obj.geometry
    prim, bu, bv = rasterize_uv(mesh, width, height)
    mask = prim >= 0
    ys, xs = np.nonzero(mask)
    n = len(ys)
    if n == 0:
        raise ValueError("empty uv layout")

    tris = mesh.triangles_array
    verts = mesh.verts_array
    tsel = tris[prim[ys, xs]]
    w = 1.0 - bu[ys, xs] - bv[ys, xs]
    P_obj = (w[:, None] * verts[tsel[:, 0]]
             + bu[ys, xs][:, None] * verts[tsel[:, 1]]
             + bv[ys, xs][:, None] * verts[tsel[:, 2]])
    fn_ = np.cross(verts[tsel[:, 1]] - verts[tsel[:, 0]],
                   verts[tsel[:, 2]] - verts[tsel[:, 0]])
    fn_ /= np.maximum(np.linalg.norm(fn_, axis=-1, keepdims=True), 1e-12)
    t = np.asarray(obj.transform, np.float32)
    P = tfm.transform_point(t, P_obj)
    itt = np.linalg.inv(tfm.to_4x4(t))[:3, :3].T
    N = fn_ @ itt.T
    N /= np.maximum(np.linalg.norm(N, axis=-1, keepdims=True), 1e-12)

    img = np.zeros((height, width, 4), np.float32)
    img[ys, xs, 3] = 1.0
    if mode == "normal":
        img[ys, xs, :3] = N * 0.5 + 0.5
        return img

    # scale-aware probe distance
    lo, hi = mesh.compute_bounds()
    eps = max(float(np.max(hi - lo)), 1.0) * probe_offset

    scene.device_update()
    kg = scene.make_kernel_globals()

    if mode == "ao":
        from raytracingproject_tpu.utils import math as um
        from raytracingproject_tpu.utils import rng as rngu

        o_np = (P + N * eps).astype(np.float32)
        n_np = N.astype(np.float32)

        def ao_fn(o, nrm):
            m = o.shape[0]
            lane = jnp.arange(m, dtype=jnp.uint32)

            def body(i, acc):
                h = rngu.hash_pcg3d(lane, jnp.uint32(i),
                                    jnp.uint32(0x51ED270B))
                u1 = rngu.uint_to_float_01(h)
                u2 = rngu.uint_to_float_01(rngu.hash_pcg(h))
                d, _pdf = um.sample_cos_hemisphere(nrm, u1, u2)
                blocked = integ._shadow_blocked(
                    kg, o, d, jnp.full((m,), 1e-5, jnp.float32),
                    jnp.full((m,), min(float(ao_distance), 1e30),
                             jnp.float32))
                return acc + jnp.where(blocked, 0.0, 1.0)

            acc = jax.lax.fori_loop(
                0, spp, body, jnp.zeros((m,), jnp.float32))
            return acc / spp

        ao = np.asarray(jax.jit(ao_fn)(jnp.asarray(o_np),
                                       jnp.asarray(n_np)))
        img[ys, xs, :3] = ao[:, None]
        return img

    # pad to a lane-friendly multiple
    pad = (-n) % 1024
    o = np.pad(P + N * eps, ((0, pad), (0, 0)))
    d = np.pad(-N, ((0, pad), (0, 0)))
    pidx = np.pad(ys * width + xs, (0, pad))
    kg["ray_override"] = {"o": jnp.asarray(o.astype(np.float32)),
                          "d": jnp.asarray(d.astype(np.float32))}
    m = n + pad
    px = jnp.zeros((m,), jnp.int32)
    py = jnp.zeros((m,), jnp.int32)
    out = jax.jit(lambda a, b, c: integ.render_samples(
        kg, a, b, c, 0, spp))(px, py, jnp.asarray(pidx, jnp.int32))
    L = np.asarray(out[0])[:n] / spp
    img[ys, xs, :3] = L
    return img

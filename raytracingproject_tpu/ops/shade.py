"""Shading-point setup + material dispatch (ref: kernel/kernel_shader.h
shader_setup_from_ray, shader_eval_surface; kernel/geom/geom_triangle.h).

`shader_setup` gathers per-primitive data (verts, per-corner normals/UVs,
object transforms) for an entire hit wavefront and builds the ShaderData
SoA view. `eval_shaders` dispatches the scene's traced shader functions
over the wavefront with per-lane selection masks — the TPU stand-in for
SVM bytecode dispatch; material sorting (ops/sort.py) can pre-group lanes
by shader id so each masked eval is dense.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax.numpy as jnp

from raytracingproject_tpu.utils import math as um
from raytracingproject_tpu.models.object import (
    PATH_RAY_CAMERA,
)


@dataclass
class ShaderData:
    """Per-lane shading context (ref: ShaderData kernel/kernel_types.h:1151)."""
    P: Any = None            # (N, 3) world hit position
    N: Any = None            # (N, 3) shading normal (world, faced forward)
    Ng: Any = None           # (N, 3) geometric normal (world, faced forward)
    Ns: Any = None           # (N, 3) unflipped smooth normal
    I: Any = None            # (N, 3) toward viewer (= -ray dir)
    uv: Any = None           # (N, 2)
    generated: Any = None    # (N, 3) object-space normalized coords
    P_object: Any = None     # (N, 3) object-space position
    time: Any = None
    ray_length: Any = None
    ray_depth: Any = None
    path_flag: Any = None
    prim: Any = None
    shader: Any = None       # (N,) shader slot
    object_index: Any = None
    object_color: Any = None
    object_location: Any = None
    object_random: Any = None
    backfacing: Any = None
    textures: Any = None
    batch_shape: tuple = field(default_factory=tuple)


def shader_setup(dscene, hit, ray_o, ray_d, time=None, ray_depth=None,
                 path_flag=None, textures=None):
    """Build ShaderData for hit lanes (missed lanes carry garbage that
    must stay masked by the caller)."""
    n = ray_o.shape[0]
    prim = jnp.maximum(hit["prim"], 0)
    obj = jnp.maximum(hit["object"], 0)

    tv = dscene["tri_verts"][prim]          # (N, 3, 3) object space
    vn = dscene["tri_vnormal"][prim]        # (N, 3, 3) per-corner normals
    tuv = dscene["tri_uv"][prim]            # (N, 3, 2)
    shader = dscene["prim_shader"][prim]
    smooth = dscene["prim_smooth"][prim]

    otfm = dscene["object_tfm"][obj]        # (N, 3, 4)
    oitfm = dscene["object_itfm"][obj]

    u = hit["u"][:, None]
    v = hit["v"][:, None]
    w = 1.0 - u - v

    # object-space position & normals (barycentric: P = w*v0 + u*v1 + v*v2)
    P_obj = w * tv[:, 0] + u * tv[:, 1] + v * tv[:, 2]
    Ng_obj = um.triangle_normal(tv[:, 0], tv[:, 1], tv[:, 2])
    Ns_obj = um.safe_normalize(w * vn[:, 0] + u * vn[:, 1] + v * vn[:, 2])
    Ns_obj = jnp.where(smooth[:, None], Ns_obj, Ng_obj)

    # to world: P by object tfm; normals by inverse-transpose
    P = (otfm[:, :, :3] @ P_obj[..., None])[..., 0] + otfm[:, :, 3]
    Ng = um.safe_normalize(
        (jnp.swapaxes(oitfm[:, :, :3], -1, -2) @ Ng_obj[..., None])[..., 0])
    Ns = um.safe_normalize(
        (jnp.swapaxes(oitfm[:, :, :3], -1, -2) @ Ns_obj[..., None])[..., 0])

    # use exact ray equation for P to avoid re-transform rounding
    P = ray_o + hit["t"][:, None] * ray_d

    # texture/generated space: always the ORIGINAL object space, even for
    # world-baked merged geometry (object_itfm_gen keeps the pre-merge
    # inverse; ref: ATTR_STD_GENERATED uses undeformed coords)
    gen_itfm = dscene["object_itfm_gen"][obj]
    P_gen = (gen_itfm[:, :, :3] @ P[..., None])[..., 0] + gen_itfm[:, :, 3]

    I = -ray_d
    backfacing = um.dot(Ng, I) < 0.0
    Ngf = jnp.where(backfacing[:, None], -Ng, Ng)
    Nf = jnp.where(um.dot(Ns, I)[:, None] < 0.0, -Ns, Ns)

    uv = w * tuv[:, 0] + u * tuv[:, 1] + v * tuv[:, 2]

    # generated coords: object-space position normalized to geometry
    # bounds (ref: ATTR_STD_GENERATED semantics)
    glo = dscene["object_bounds_lo"][obj]
    ghi = dscene["object_bounds_hi"][obj]
    generated = um.safe_divide(P_gen - glo, jnp.maximum(ghi - glo, 1e-12), 0.5)

    sd = ShaderData(
        P=P, N=Nf, Ng=Ngf, Ns=Ns, I=I, uv=uv, generated=generated,
        P_object=P_gen,
        time=time if time is not None else jnp.zeros(n, jnp.float32),
        ray_length=hit["t"],
        ray_depth=(ray_depth if ray_depth is not None
                   else jnp.zeros(n, jnp.int32)),
        path_flag=(path_flag if path_flag is not None
                   else jnp.full(n, PATH_RAY_CAMERA, jnp.uint32)),
        prim=hit["prim"], shader=shader,
        object_index=hit["object"],
        object_color=dscene["object_color"][obj],
        object_location=otfm[:, :, 3],
        object_random=dscene["object_random"][obj],
        backfacing=backfacing,
        textures=textures,
        batch_shape=(n,),
    )
    return sd


def eval_shaders(shaders, sd, shader_id):
    """Evaluate every scene shader on the wavefront, select per lane.

    shaders: list of models.shader.Shader (slot i == index i).
    Returns the fixed-slot closure union. Cost is O(num_shaders) masked
    evals; keep wavefronts material-sorted for dense lanes.
    """
    from raytracingproject_tpu.ops import closures as cl
    out = cl.empty_closures(sd.batch_shape)
    for slot, shader in enumerate(shaders):
        c = shader.evaluate_surface(sd)
        m = shader_id == slot
        for k in out:
            out[k] = jnp.where(_m(m, out[k]), c[k], out[k])
    return out


def _m(mask, v):
    return mask[..., None] if v.ndim > mask.ndim else mask


def eval_background(shaders, background_shader_slot, ray_d, textures=None,
                    path_flag=None):
    """Evaluate the background shader for missed rays
    (ref: indirect_background, kernel/kernel_emission.h:333)."""
    n = ray_d.shape[0]
    zeros = jnp.zeros((n, 3), jnp.float32)
    if background_shader_slot < 0:
        return zeros
    sd = ShaderData(
        P=zeros, N=-ray_d, Ng=-ray_d, Ns=-ray_d, I=-ray_d,
        uv=jnp.zeros((n, 2), jnp.float32),
        generated=ray_d, P_object=ray_d,
        time=jnp.zeros(n, jnp.float32),
        ray_length=jnp.full(n, um.RAY_TMAX, jnp.float32),
        ray_depth=jnp.zeros(n, jnp.int32),
        path_flag=(path_flag if path_flag is not None
                   else jnp.full(n, PATH_RAY_CAMERA, jnp.uint32)),
        prim=jnp.full(n, -1, jnp.int32),
        shader=jnp.full(n, background_shader_slot, jnp.int32),
        object_index=jnp.full(n, -1, jnp.int32),
        object_color=zeros, object_location=zeros,
        object_random=jnp.zeros(n, jnp.float32),
        backfacing=jnp.zeros(n, bool),
        textures=textures, batch_shape=(n,),
    )
    c = shaders[background_shader_slot].evaluate_surface(sd)
    return c["emission"]

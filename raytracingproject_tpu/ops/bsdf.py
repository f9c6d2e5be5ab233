"""BSDF sampling/evaluation over the closure union
(ref: kernel/closure/bsdf.h bsdf_sample/bsdf_eval dispatch,
kernel/kernel_shader.h shader_bsdf_sample/_shader_bsdf_multi_eval).

Lobes: Lambert diffuse (Oren-Nayar when roughness > 0), GGX microfacet
reflection with VNDF sampling, GGX microfacet refraction, and delta
transparent. Sampling follows the reference's multi-closure scheme:
pick a lobe proportional to its mean weight, sample a direction from
it, then evaluate ALL lobes at that direction and combine pdfs by the
pick probabilities — an unbiased mixture estimator that also yields the
pdf needed for MIS against light sampling.

Delta lobes (roughness ~ 0 and transparent) are flagged SINGULAR: their
contribution never appears in `bsdf_eval` (NEE cannot hit a delta), and
paths continuing through them skip MIS emission weighting, matching
PATH_RAY_SINGULAR semantics (ref: kernel_path_surface.h).

All directions follow the Cycles convention: I points from the surface
toward the viewer, omega_in toward the light.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from raytracingproject_tpu.utils import math as um

# sampled-lobe labels (ref: LABEL_* kernel/kernel_types.h)
LABEL_DIFFUSE = 1
LABEL_GLOSSY = 2
LABEL_TRANSMIT = 4
LABEL_SINGULAR = 8
LABEL_TRANSPARENT = 16
LABEL_VOLUME_SCATTER = 32

SHARP_ROUGHNESS = 1e-4  # below this a lobe is a delta


def _ggx_smith_lambda(cos_t, alpha2):
    c2 = cos_t * cos_t
    t2 = jnp.maximum(1.0 - c2, 0.0) / jnp.maximum(c2, 1e-12)
    return 0.5 * (jnp.sqrt(1.0 + alpha2 * t2) - 1.0)


def _ggx_d(cos_h, alpha2):
    c2 = cos_h * cos_h
    den = c2 * (alpha2 - 1.0) + 1.0
    return alpha2 / jnp.maximum(um.M_PI * den * den, 1e-12)


def _sample_ggx_vndf(v_local, alpha, u1, u2):
    """Heitz 2018 visible-normal GGX sampling; v_local in tangent frame
    (z up), returns half-vector h in tangent frame."""
    vh = um.normalize(jnp.stack([alpha * v_local[..., 0],
                                 alpha * v_local[..., 1],
                                 v_local[..., 2]], -1))
    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    inv = jnp.where(lensq > 1e-12,
                    1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-12)), 0.0)
    t1 = jnp.where(lensq[..., None] > 1e-12,
                   jnp.stack([-vh[..., 1] * inv, vh[..., 0] * inv,
                              jnp.zeros_like(inv)], -1),
                   jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], jnp.float32),
                                    vh.shape))
    t2 = jnp.cross(vh, t1)
    r = jnp.sqrt(u1)
    phi = um.M_2PI * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * um.safe_sqrt(1.0 - p1 * p1) + s * p2
    p3 = um.safe_sqrt(1.0 - p1 * p1 - p2 * p2)
    nh = p1[..., None] * t1 + p2[..., None] * t2 + p3[..., None] * vh
    h = um.normalize(jnp.stack([alpha * nh[..., 0], alpha * nh[..., 1],
                                jnp.maximum(nh[..., 2], 1e-6)], -1))
    return h


def _ggx_reflect_eval(wo, wi, alpha):
    """GGX reflection f*cos and pdf in tangent space (z = normal)."""
    cos_o = wo[..., 2]
    cos_i = wi[..., 2]
    valid = (cos_o > 1e-6) & (cos_i > 1e-6)
    h = um.normalize(wo + wi)
    cos_h = h[..., 2]
    alpha2 = alpha * alpha
    d = _ggx_d(cos_h, alpha2)
    lam_o = _ggx_smith_lambda(cos_o, alpha2)
    lam_i = _ggx_smith_lambda(cos_i, alpha2)
    g = 1.0 / (1.0 + lam_o + lam_i)
    g1_o = 1.0 / (1.0 + lam_o)
    f_cos = jnp.where(valid, d * g / jnp.maximum(4.0 * cos_o, 1e-12), 0.0)
    # VNDF pdf: G1(o) D |o.h| / cos_o / (4 |o.h|) = G1 D / (4 cos_o)
    pdf = jnp.where(valid, g1_o * d / jnp.maximum(4.0 * cos_o, 1e-12), 0.0)
    return f_cos, pdf


def _ggx_refract_eval(wo, wi, alpha, eta):
    """GGX refraction f*cos and pdf; eta = ior_in/ior_out along wo side.
    wo on +z side, wi must be on -z side."""
    cos_o = wo[..., 2]
    cos_i = -wi[..., 2]
    valid = (cos_o > 1e-6) & (cos_i > 1e-6)
    # half vector for refraction
    ht = -(eta[..., None] * wo + wi)
    h = um.normalize(ht)
    h = h * jnp.sign(h[..., 2:3])  # orient to +z
    cos_ho = jnp.sum(wo * h, -1)
    cos_hi = jnp.sum(wi * h, -1)
    alpha2 = alpha * alpha
    d = _ggx_d(h[..., 2], alpha2)
    lam_o = _ggx_smith_lambda(cos_o, alpha2)
    lam_i = _ggx_smith_lambda(cos_i, alpha2)
    g = 1.0 / (1.0 + lam_o + lam_i)
    g1_o = 1.0 / (1.0 + lam_o)
    denom = eta * cos_ho + cos_hi
    denom2 = jnp.maximum(denom * denom, 1e-12)
    jac = jnp.abs(cos_hi) / denom2
    f_cos = jnp.where(valid & (jnp.abs(cos_ho) > 1e-8),
                      (jnp.abs(cos_ho) * jac * d * g
                       / jnp.maximum(cos_o, 1e-12)), 0.0)
    pdf = jnp.where(valid, g1_o * d * jnp.abs(cos_ho) * jac
                    / jnp.maximum(cos_o, 1e-12), 0.0)
    return f_cos, pdf


def _oren_nayar_factor(wo, wi, roughness):
    """Oren-Nayar qualitative model (ref: bsdf_oren_nayar.h), relative to
    Lambert (factor multiplying albedo/pi*cos)."""
    sigma2 = roughness * roughness
    a = 1.0 - 0.5 * sigma2 / (sigma2 + 0.33)
    b = 0.45 * sigma2 / (sigma2 + 0.09)
    cos_o, cos_i = wo[..., 2], wi[..., 2]
    sin_o = um.safe_sqrt(1.0 - cos_o * cos_o)
    sin_i = um.safe_sqrt(1.0 - cos_i * cos_i)
    cos_phi = jnp.where(
        (sin_o > 1e-6) & (sin_i > 1e-6),
        (wo[..., 0] * wi[..., 0] + wo[..., 1] * wi[..., 1])
        / jnp.maximum(sin_o * sin_i, 1e-12), 0.0)
    sin_alpha = jnp.maximum(sin_o, sin_i)
    tan_beta = jnp.minimum(sin_o, sin_i) / jnp.maximum(
        jnp.minimum(cos_o, cos_i), 1e-6)
    return a + b * jnp.maximum(cos_phi, 0.0) * sin_alpha * tan_beta


def _toon_cones(size, smooth):
    """(cos_max, cos_end) of the toon response: full intensity inside
    size*pi/2, linear-in-cos falloff to zero at (size+smooth)*pi/2
    (ref: kernel/closure/bsdf_toon.h angle semantics)."""
    max_angle = jnp.clip(size, 0.0, 1.0) * (um.M_PI * 0.5)
    end_angle = jnp.minimum(max_angle + jnp.clip(smooth, 0.0, 1.0)
                            * (um.M_PI * 0.5), um.M_PI * 0.5)
    return jnp.cos(max_angle), jnp.cos(end_angle)


def _toon_intensity(cos_t, cm, ce):
    """Piecewise response in cos-space: 1 above cm, linear to 0 at ce."""
    band = jnp.where(cm - ce > 1e-6, (cos_t - ce)
                     / jnp.maximum(cm - ce, 1e-6), 0.0)
    return jnp.clip(jnp.where(cos_t >= cm, 1.0, band), 0.0, 1.0)


def _toon_norm(cm, ce):
    """K = 2 pi int_ce^1 i(c) c dc — hemispherical response so
    weight/K makes the lobe's albedo equal its weight."""
    hard = um.M_PI * (1.0 - cm * cm)
    d = jnp.maximum(cm - ce, 1e-6)
    band = um.M_2PI / d * ((cm ** 3 - ce ** 3) / 3.0
                           - ce * (cm * cm - ce * ce) / 2.0)
    return jnp.maximum(hard + jnp.where(cm - ce > 1e-6, band, 0.0), 1e-6)


def _toon_eval(weight, cos_t, cos_i, cm, ce):
    """f*cos of one toon lobe at angle cos_t from its axis."""
    i = _toon_intensity(cos_t, cm, ce)
    return weight * (i / _toon_norm(cm, ce) * jnp.maximum(cos_i, 0.0)
                     )[..., None]


def _toon_cone_pdf(cos_t, ce):
    """Uniform-solid-angle cone pdf for the sampled support."""
    inside = cos_t >= ce - 1e-7
    return jnp.where(inside, 1.0 / jnp.maximum(
        um.M_2PI * (1.0 - ce), 1e-7), 0.0)


def _sample_uniform_cone(axis, ce, u1, u2):
    """Uniform direction within the cone cos >= ce around `axis`
    (any-space unit vectors)."""
    cos_t = 1.0 - u1 * (1.0 - ce)
    sin_t = um.safe_sqrt(1.0 - cos_t * cos_t)
    phi = um.M_2PI * u2
    t, b = um.make_orthonormals(axis)
    return (t * (sin_t * jnp.cos(phi))[..., None]
            + b * (sin_t * jnp.sin(phi))[..., None]
            + axis * cos_t[..., None])


def _velvet_eval(wo, wi, sigma):
    """Ashikhmin velvet f*cos (ref: kernel/closure/
    bsdf_ashikhmin_velvet.h — the classic inverted-Gaussian cotangent
    microfiber distribution, independently implemented from the
    published model)."""
    cos_o = jnp.maximum(wo[..., 2], 1e-4)
    cos_i = jnp.maximum(wi[..., 2], 0.0)
    h = um.normalize(wo + wi)
    cos_nh = jnp.clip(h[..., 2], -1.0, 1.0)
    cos_ho = jnp.maximum(jnp.abs(um.dot(wo, h)), 1e-5)
    inv_s2 = 1.0 / jnp.maximum(sigma * sigma, 1e-4)
    sin_nh2 = jnp.maximum(1.0 - cos_nh * cos_nh, 1e-6)
    cot2 = (cos_nh * cos_nh) / sin_nh2
    D = jnp.exp(-cot2 * inv_s2) * inv_s2 * um.M_1_PI \
        / (sin_nh2 * sin_nh2)
    G = jnp.minimum(1.0, jnp.minimum(
        2.0 * cos_nh * cos_o / cos_ho,
        2.0 * cos_nh * cos_i / cos_ho))
    f = 0.25 * D * jnp.maximum(G, 0.0) / cos_o
    return jnp.where((cos_i > 0.0) & (cos_nh > 0.0), f * cos_i, 0.0)


def _lobe_probs(c, include_sss=True):
    """Lobe pick probabilities from mean closure weights
    (ref: shader_bsdf_pick sample_weight). include_sss=False when the
    random-walk integrator handles the subsurface lobe separately."""
    wd = jnp.mean(jnp.abs(c["diffuse"])
                  + (jnp.abs(c["subsurface"]) if include_sss else 0.0)
                  + jnp.abs(c["sheen"]), -1)
    wg = jnp.mean(jnp.abs(c["glossy"]), -1)
    wr = jnp.mean(jnp.abs(c["refraction"]), -1)
    wt = jnp.mean(jnp.abs(c["transparent"]), -1)
    wh = jnp.mean(jnp.abs(c["hair"]), -1)
    wtd = jnp.mean(jnp.abs(c["toon_diffuse"]), -1)
    wtg = jnp.mean(jnp.abs(c["toon_glossy"]), -1)
    tot = wd + wg + wr + wt + wh + wtd + wtg
    safe = jnp.maximum(tot, 1e-12)
    return (wd / safe, wg / safe, wr / safe, wt / safe, wh / safe,
            wtd / safe, wtg / safe, tot)


def _hair_on_curves_only(c, sd):
    """Principled-hair closures on MESH prims (no packed curve tangent)
    fall back to a diffuse lobe instead of black: the hair lobe is only
    evaluable on curve lanes (is_curve = nonzero tangent), so leaving
    its mixture weight live on mesh lanes allocates pick probability to
    a lobe whose sample is then invalid — energy loss. The reference
    evals hair via dPdu on any prim (bsdf_hair_principled.h); a diffuse
    fallback is the graceful wavefront analog."""
    is_curve = um.dot(sd.dPdu, sd.dPdu) > 0.25
    c = dict(c)
    hw = c["hair"]
    c["diffuse"] = c["diffuse"] + jnp.where(is_curve[..., None], 0.0, hw)
    c["hair"] = jnp.where(is_curve[..., None], hw, 0.0)
    return c


def bsdf_eval(c, N, I, omega_in, features=None, want_components=False,
              sd=None):
    """Evaluate the full closure stack at direction omega_in.

    Returns (f_cos (N,3), pdf (N,)) — f includes |cos|; delta lobes
    contribute nothing (ref: _shader_bsdf_multi_eval).

    `features` (dict of static bools from scene analysis) prunes unused
    lobes at trace time — the TPU analog of the reference's
    feature-specialized kernel builds (device.h:228 get_build_options)."""
    ft = features or {}
    has_glossy = ft.get("has_glossy", True)
    has_refraction = ft.get("has_refraction", True)
    has_diffuse_rough = ft.get("has_diffuse_roughness", True)

    has_sss_walk = ft.get("has_subsurface", False)
    has_hair = ft.get("has_hair", False) and sd is not None
    if has_hair:
        c = _hair_on_curves_only(c, sd)
    t, b = um.make_orthonormals(N)
    wo = um.to_local(I, t, b, N)
    wi = um.to_local(omega_in, t, b, N)

    pd, pg, pr, pt, ph, ptd, ptg, tot = _lobe_probs(
        c, include_sss=not has_sss_walk)

    reflect_side = wi[..., 2] > 0.0

    # diffuse (subsurface folds in as diffuse ONLY when the random walk
    # is not active, ref: the fallback diffuse approximation)
    cos_i = jnp.maximum(wi[..., 2], 0.0)
    if has_diffuse_rough:
        on = jnp.where(c["diffuse_roughness"] > 1e-4,
                       _oren_nayar_factor(wo, wi, c["diffuse_roughness"]), 1.0)
    else:
        on = 1.0
    sss_part = 0.0 if has_sss_walk else c["subsurface"]
    f_diff = (c["diffuse"] + sss_part) * (cos_i * um.M_1_PI * on)[..., None]
    pdf_diff = cos_i * um.M_1_PI

    f_diff_m = f_diff * jnp.where(reflect_side, 1.0, 0.0)[..., None]
    f = f_diff_m
    pdf = pd * jnp.where(reflect_side, pdf_diff, 0.0)
    comp = {"diffuse": f_diff_m} if want_components else None

    if has_glossy:
        alpha_g = jnp.maximum(c["glossy_roughness"] ** 2, 1e-7)
        glossy_delta = c["glossy_roughness"] < SHARP_ROUGHNESS
        fg, pdfg = _ggx_reflect_eval(wo, wi, alpha_g)
        f_gloss = jnp.where((~glossy_delta & reflect_side)[..., None],
                            c["glossy"] * fg[..., None], 0.0)
        pdf_gloss = jnp.where(~glossy_delta & reflect_side, pdfg, 0.0)
        if ft.get("has_multiscatter", False):
            ms_on = (c["glossy_multiscatter"] > 0.0) & ~glossy_delta
            f_ms = ms_compensation_lobe(c, wo[..., 2], wi[..., 2])
            f_gloss = f_gloss + jnp.where(
                (ms_on & reflect_side)[..., None],
                c["glossy"] * f_ms[..., None], 0.0)
        f = f + f_gloss
        pdf = pdf + pg * pdf_gloss
        if want_components:
            comp["glossy"] = f_gloss

    if has_refraction:
        alpha_r = jnp.maximum(c["refraction_roughness"] ** 2, 1e-7)
        refr_delta = c["refraction_roughness"] < SHARP_ROUGHNESS
        eta = jnp.maximum(c["ior"], 1e-5)
        # wo always +z by construction (N flipped to face I); refraction
        # goes to -z side. eta = 1/ior entering, caller flips for exit.
        fr, pdfr = _ggx_refract_eval(wo, wi, alpha_r, 1.0 / eta)
        f_refr = jnp.where((~refr_delta & ~reflect_side)[..., None],
                           c["refraction"] * fr[..., None], 0.0)
        pdf_refr = jnp.where(~refr_delta & ~reflect_side, pdfr, 0.0)
        f = f + f_refr
        pdf = pdf + pr * pdf_refr
        if want_components:
            comp["transmission"] = f_refr

    if ft.get("has_sheen", False):
        # Ashikhmin velvet rides the diffuse (cosine) sampling branch:
        # its weight is folded into pd, so pdf accounting is unchanged
        f_sheen = c["sheen"] * _velvet_eval(wo, wi, c["sheen_sigma"]
                                            )[..., None]
        f_sheen = jnp.where(reflect_side[..., None], f_sheen, 0.0)
        f = f + f_sheen
        if want_components:
            comp["diffuse"] = comp["diffuse"] + f_sheen

    if ft.get("has_toon", False):
        # toon lobes (ref: bsdf_toon.h): constant response inside the
        # size cone, linear falloff across smooth, uniform-cone sampled
        cos_i_s = wi[..., 2]
        cmd, ced = _toon_cones(c["toon_diffuse_size"],
                               c["toon_diffuse_smooth"])
        f_td = _toon_eval(c["toon_diffuse"], cos_i_s, cos_i_s, cmd, ced)
        f_td = jnp.where(reflect_side[..., None], f_td, 0.0)
        r_l = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], -1)
        cmg, ceg = _toon_cones(c["toon_glossy_size"],
                               c["toon_glossy_smooth"])
        cos_r = um.dot(wi, r_l)
        f_tg = _toon_eval(c["toon_glossy"], cos_r, cos_i_s, cmg, ceg)
        f_tg = jnp.where(reflect_side[..., None], f_tg, 0.0)
        f = f + f_td + f_tg
        pdf = pdf + ptd * jnp.where(reflect_side,
                                    _toon_cone_pdf(cos_i_s, ced), 0.0) \
            + ptg * jnp.where(reflect_side,
                              _toon_cone_pdf(cos_r, ceg), 0.0)
        if want_components:
            comp["diffuse"] = comp["diffuse"] + f_td
            comp["glossy"] = comp.get("glossy", 0.0) + f_tg

    if has_hair:
        # principled hair lobe (ops/hair.py; only live on curve prims,
        # flagged by a nonzero packed tangent)
        from raytracingproject_tpu.ops import hair as hair_ops
        is_curve = um.dot(sd.dPdu, sd.dPdu) > 0.25
        h_off = jnp.clip(sd.uv[..., 0] * 2.0 - 1.0, -1.0, 1.0)
        f_h, pdf_h = hair_ops.hair_eval(
            sd.dPdu, sd.Ng, h_off, I, omega_in, c["hair_sigma"],
            jnp.maximum(c["hair_v"], 1e-7),
            jnp.maximum(c["hair_s"], 1e-7),
            c["hair_alpha"], jnp.maximum(c["hair_ior"], 1.01))
        f_hair = jnp.where(is_curve[..., None], c["hair"] * f_h, 0.0)
        f = f + f_hair
        pdf = pdf + ph * jnp.where(is_curve, pdf_h, 0.0)
        if want_components:
            comp["glossy"] = comp.get("glossy", 0.0) + f_hair

    if want_components:
        return f, pdf, comp
    return f, pdf


def bsdf_sample(c, N, Ng, I, u1, u2, u_lobe, features=None, sd=None):
    """Sample an outgoing direction from the closure stack.

    Returns dict(omega (N,3), f_cos (N,3), pdf (N,), label (N,) int32,
    eta (N,) relative ior crossed for refraction lanes, valid mask).
    `features` statically prunes unused lobes (see bsdf_eval).
    """
    ft = features or {}
    has_glossy = ft.get("has_glossy", True)
    has_refraction = ft.get("has_refraction", True)
    has_transparent = ft.get("has_transparent", True)
    has_hair = ft.get("has_hair", False) and sd is not None
    if has_hair:
        c = _hair_on_curves_only(c, sd)

    t, b = um.make_orthonormals(N)
    wo = um.to_local(I, t, b, N)

    has_toon = ft.get("has_toon", False)
    pd, pg, pr, pt, phh, ptd, ptg, tot = _lobe_probs(
        c, include_sss=not ft.get("has_subsurface", False))
    cdf_d = pd
    cdf_g = pd + pg
    cdf_r = pd + pg + pr
    cdf_t = pd + pg + pr + pt
    pick_d = u_lobe < cdf_d
    pick_g = ~pick_d & (u_lobe < cdf_g) if has_glossy \
        else jnp.zeros_like(pick_d)
    pick_r = ~pick_d & ~pick_g & (u_lobe < cdf_r) if has_refraction \
        else jnp.zeros_like(pick_d)
    rest = ~pick_d & ~pick_g & ~pick_r
    zeros_b = jnp.zeros_like(pick_d)
    if has_toon:
        # chain extends past transparent/hair into the toon cones
        cdf_h = cdf_t + phh
        cdf_td = cdf_h + ptd
        pick_t = rest & (u_lobe < cdf_t) if has_transparent else zeros_b
        pick_h = (rest & ~pick_t & (u_lobe < cdf_h)) if has_hair \
            else zeros_b
        pick_td = rest & ~pick_t & ~pick_h & (u_lobe < cdf_td)
        pick_tg = rest & ~pick_t & ~pick_h & ~pick_td
    elif has_hair:
        pick_t = rest & (u_lobe < cdf_t) if has_transparent \
            else jnp.zeros_like(pick_d)
        pick_h = rest & ~pick_t
        pick_td = pick_tg = zeros_b
    else:
        pick_t = rest if has_transparent else jnp.zeros_like(pick_d)
        pick_h = jnp.zeros_like(pick_d)
        pick_td = pick_tg = zeros_b
    if not (has_glossy or has_refraction or has_transparent or has_hair
            or has_toon):
        pick_d = jnp.ones_like(pick_d)

    # --- diffuse: cosine hemisphere ---
    r = jnp.sqrt(u1)
    phi = um.M_2PI * u2
    wi_diff = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi),
                         um.safe_sqrt(1.0 - u1)], -1)
    wi = wi_diff
    label = jnp.full(pick_d.shape, LABEL_DIFFUSE, jnp.int32)

    glossy_delta = c["glossy_roughness"] < SHARP_ROUGHNESS
    refr_delta = c["refraction_roughness"] < SHARP_ROUGHNESS
    eta_f = jnp.maximum(c["ior"], 1e-5)  # ior of medium being entered
    inv_eta = 1.0 / eta_f
    tir = jnp.zeros_like(pick_d)

    if has_glossy:
        # --- glossy: VNDF half-vector, reflect ---
        alpha_g = jnp.maximum(c["glossy_roughness"] ** 2, 1e-7)
        h_g = _sample_ggx_vndf(wo, alpha_g, u1, u2)
        wi_gloss = 2.0 * um.dot3(wo, h_g) * h_g - wo
        wi_gloss_delta = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], -1)
        wi_gloss = jnp.where(glossy_delta[..., None], wi_gloss_delta, wi_gloss)
        wi = jnp.where(pick_g[..., None], wi_gloss, wi)
        label = jnp.where(pick_g, jnp.where(glossy_delta,
                                            LABEL_GLOSSY | LABEL_SINGULAR,
                                            LABEL_GLOSSY), label)

    if has_refraction:
        # --- refraction: VNDF half-vector, refract ---
        alpha_r = jnp.maximum(c["refraction_roughness"] ** 2, 1e-7)
        h_r = _sample_ggx_vndf(wo, alpha_r, u1, u2)
        h_r_eff = jnp.where(refr_delta[..., None],
                            jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0],
                                                         jnp.float32),
                                             h_r.shape),
                            h_r)
        cos_oh = jnp.sum(wo * h_r_eff, -1)
        k = 1.0 - inv_eta * inv_eta * (1.0 - cos_oh * cos_oh)
        tir = k < 0.0
        wi_refr = um.normalize(
            (inv_eta[..., None] * (cos_oh[..., None] * h_r_eff - wo))
            - um.safe_sqrt(k)[..., None] * h_r_eff)
        # TIR: reflect off the half vector instead
        wi_tir = um.normalize(2.0 * cos_oh[..., None] * h_r_eff - wo)
        wi_refr = jnp.where(tir[..., None], wi_tir, wi_refr)
        wi = jnp.where(pick_r[..., None], wi_refr, wi)
        label = jnp.where(pick_r, jnp.where(refr_delta,
                                            LABEL_TRANSMIT | LABEL_SINGULAR,
                                            LABEL_TRANSMIT), label)

    if has_transparent:
        wi = jnp.where(pick_t[..., None], -wo, wi)
        label = jnp.where(pick_t, LABEL_TRANSPARENT | LABEL_SINGULAR, label)

    if has_toon:
        # uniform-cone samples around N (diffuse toon) / the mirror
        # direction (glossy toon); pdf accounted in bsdf_eval
        z_ax = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
                                wi.shape)
        _, ced = _toon_cones(c["toon_diffuse_size"],
                             c["toon_diffuse_smooth"])
        wi_td = _sample_uniform_cone(z_ax, ced, u1, u2)
        wi = jnp.where(pick_td[..., None], wi_td, wi)
        r_l = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], -1)
        _, ceg = _toon_cones(c["toon_glossy_size"],
                             c["toon_glossy_smooth"])
        wi_tg = _sample_uniform_cone(um.normalize(r_l), ceg, u1, u2)
        wi = jnp.where(pick_tg[..., None], wi_tg, wi)
        label = jnp.where(pick_tg, LABEL_GLOSSY, label)

    omega = um.from_local(wi, t, b, N)

    if has_hair:
        # hair samples come back in world space already (its own frame)
        from raytracingproject_tpu.ops import hair as hair_ops
        h_off = jnp.clip(sd.uv[..., 0] * 2.0 - 1.0, -1.0, 1.0)
        omega_h, _fh, _pdfh, valid_h = hair_ops.hair_sample(
            sd.dPdu, sd.Ng, h_off, I, u1, u2, c["hair_sigma"],
            jnp.maximum(c["hair_v"], 1e-7),
            jnp.maximum(c["hair_s"], 1e-7),
            c["hair_alpha"], jnp.maximum(c["hair_ior"], 1.01))
        omega = jnp.where(pick_h[..., None], omega_h, omega)
        label = jnp.where(pick_h, LABEL_GLOSSY, label)

    # --- combine: delta lanes bypass the mixture eval ---
    sampled_delta = ((pick_g & glossy_delta) | (pick_r & refr_delta) | pick_t)

    f_eval, pdf_eval = bsdf_eval(c, N, I, omega, features, sd=sd)
    # delta contributions (weight/pick_prob with pdf treated as 1)
    f_delta = jnp.where(pick_g[..., None], c["glossy"],
                        jnp.where(pick_r[..., None], c["refraction"],
                                  c["transparent"]))
    p_delta = jnp.where(pick_g, pg, jnp.where(pick_r, pr, pt))

    f = jnp.where(sampled_delta[..., None], f_delta, f_eval)
    pdf = jnp.where(sampled_delta, p_delta, pdf_eval)

    valid = (tot > 1e-12) & (pdf > 1e-12)
    if has_hair:
        valid = valid & (~pick_h | valid_h)
    # refraction lanes record relative eta for russian-roulette radiance
    # scaling (ref: kernel_path_surface.h bounce eta_scale)
    eta_cross = jnp.where(pick_r & ~tir, inv_eta, 1.0)
    return {"omega": omega, "f_cos": f, "pdf": pdf, "label": label,
            "valid": valid, "eta": eta_cross}


# ---------------------------------------------------------------------------
# Multiscatter GGX energy compensation
# (ref: kernel/closure/bsdf_microfacet_multi.h — the reference evaluates
# multiple scattering with a stochastic random walk on the microsurface,
# which is wavefront-hostile; redesigned as the Kulla-Conty
# energy-compensation lobe: f_ms = (1-E(o))(1-E(i)) / (pi (1-E_avg)),
# driven by a precomputed directional-albedo table E(mu, roughness).)
# ---------------------------------------------------------------------------

MS_TABLE_MU = 16
MS_TABLE_R = 16
_ms_cache = {}


def _ms_tables_np():
    """E(mu_o, roughness) single-scatter directional albedo of the
    white-Fresnel GGX (same D/G family as _ggx_reflect_eval) plus its
    cosine average E_avg(roughness). Built once per process.

    Uses the VNDF identity: with h ~ visible-normal distribution the
    albedo estimator collapses to E = mean(G2/G1_o over samples with
    wi above the horizon) — exact in expectation and smooth for ALL
    roughness (a fixed wi grid misses the sharp-lobe spike)."""
    if "E" in _ms_cache:
        return _ms_cache["E"], _ms_cache["Eavg"]
    mu = (np.arange(MS_TABLE_MU) + 0.5) / MS_TABLE_MU         # (M,)
    rough = (np.arange(MS_TABLE_R) + 0.5) / MS_TABLE_R        # (R,)
    alpha = rough ** 2
    k = 64                                                     # u grid
    u1 = ((np.arange(k) + 0.5) / k)[:, None]
    u2 = ((np.arange(k) + 0.5) / k)[None, :]
    u1 = np.broadcast_to(u1, (k, k)).reshape(-1)
    u2 = np.broadcast_to(u2, (k, k)).reshape(-1)               # (S,)
    so = np.sqrt(np.maximum(1.0 - mu ** 2, 0.0))
    # shapes (M, R, S)
    a = alpha[None, :, None]
    vx = so[:, None, None] * a
    vz = mu[:, None, None] * np.ones_like(a)
    vn = np.sqrt(vx * vx + vz * vz)
    vhx, vhz = vx / vn, vz / vn                                # (M,R,1)
    # Heitz 2018 VNDF sampling with v in the xz-plane (vy=0):
    lensq = vhx * vhx
    inv = np.where(lensq > 1e-12, 1.0 / np.sqrt(np.maximum(lensq, 1e-12)),
                   0.0)
    # t1 = normalize(-vhy, vhx, 0) = (0, sign-ish, 0) -> (0,1,0) when
    # lensq ~ 0; general: t1 = (-vhy, vhx, 0)/len = (0, vhx, 0)/len
    t1y = np.where(lensq > 1e-12, vhx * inv, 1.0)
    # t2 = vh x t1
    t2x = -vhz * t1y
    t2z = vhx * t1y
    r = np.sqrt(u1)[None, None, :]
    phi = 2.0 * np.pi * u2[None, None, :]
    p1 = r * np.cos(phi)
    p2 = r * np.sin(phi)
    sfac = 0.5 * (1.0 + vhz)
    p2 = (1.0 - sfac) * np.sqrt(np.maximum(1.0 - p1 * p1, 0.0)) \
        + sfac * p2
    p3 = np.sqrt(np.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
    # h_local = p1*t1 + p2*t2 + p3*vh  (t1=(0,t1y,0), t2=(t2x,0,t2z))
    hx = p2 * t2x + p3 * vhx
    hy = p1 * t1y
    hz = p2 * t2z + p3 * vhz
    # unstretch
    hx, hy, hz_ = hx * a, hy * a, np.maximum(hz, 1e-9)
    hn = np.sqrt(hx * hx + hy * hy + hz_ * hz_)
    hx, hy, hz = hx / hn, hy / hn, hz_ / hn
    # wi = reflect(wo, h); wo = (so, 0, mu)
    woh = so[:, None, None] * hx + mu[:, None, None] * hz
    wix = 2.0 * woh * hx - so[:, None, None]
    wiz = 2.0 * woh * hz - mu[:, None, None]
    a2 = a * a

    def lam(c):
        c2 = np.clip(c * c, 1e-12, 1.0)
        t2_ = np.maximum(1.0 - c2, 0.0) / c2
        return 0.5 * (np.sqrt(1.0 + a2 * t2_) - 1.0)

    lam_o = lam(vz)
    g1_o = 1.0 / (1.0 + lam_o)
    g2 = 1.0 / (1.0 + lam_o + lam(np.clip(wiz, 1e-9, 1.0)))
    est = np.where(wiz > 1e-6, g2 / g1_o, 0.0)
    E = np.clip(est.mean(-1), 0.0, 1.0)                        # (M, R)
    Eavg = np.clip(2.0 * np.mean(E * mu[:, None], axis=0), 1e-4, 1.0)
    _ms_cache["E"] = E.astype(np.float32)
    _ms_cache["Eavg"] = Eavg.astype(np.float32)
    return _ms_cache["E"], _ms_cache["Eavg"]


def _ms_energy_lookup(mu, rough):
    """Bilinear E(mu, rough) via one-hot reductions (no dynamic gathers
    — docs/PERF.md). mu, rough: (N,)."""
    E, _ = _ms_tables_np()
    tab = jnp.asarray(E.reshape(-1))                          # (M*R,)
    fm = jnp.clip(mu * MS_TABLE_MU - 0.5, 0.0, MS_TABLE_MU - 1.0)
    fr = jnp.clip(rough * MS_TABLE_R - 0.5, 0.0, MS_TABLE_R - 1.0)
    m0 = jnp.floor(fm).astype(jnp.int32)
    r0 = jnp.floor(fr).astype(jnp.int32)
    m1 = jnp.minimum(m0 + 1, MS_TABLE_MU - 1)
    r1 = jnp.minimum(r0 + 1, MS_TABLE_R - 1)
    wm = fm - m0.astype(jnp.float32)
    wr = fr - r0.astype(jnp.float32)
    cols = jnp.arange(MS_TABLE_MU * MS_TABLE_R, dtype=jnp.int32)

    def fetch(mi, ri):
        idx = mi * MS_TABLE_R + ri
        return jnp.sum(jnp.where(cols[None, :] == idx[:, None],
                                 tab[None, :], 0.0), -1)

    return ((1 - wm) * ((1 - wr) * fetch(m0, r0) + wr * fetch(m0, r1))
            + wm * ((1 - wr) * fetch(m1, r0) + wr * fetch(m1, r1)))


def _ms_eavg_lookup(rough):
    _, Eavg = _ms_tables_np()
    tab = jnp.asarray(Eavg)
    fr = jnp.clip(rough * MS_TABLE_R - 0.5, 0.0, MS_TABLE_R - 1.0)
    r0 = jnp.floor(fr).astype(jnp.int32)
    r1 = jnp.minimum(r0 + 1, MS_TABLE_R - 1)
    wr = fr - r0.astype(jnp.float32)
    cols = jnp.arange(MS_TABLE_R, dtype=jnp.int32)

    def fetch(ri):
        return jnp.sum(jnp.where(cols[None, :] == ri[:, None],
                                 tab[None, :], 0.0), -1)

    return (1 - wr) * fetch(r0) + wr * fetch(r1)


def ms_compensation_lobe(c, cos_o, cos_i):
    """Kulla-Conty multiple-scattering lobe value (x cos_i), white
    albedo scaled by the glossy color (x color per extra bounce is
    approximated by one color factor — matches the reference's
    single-color multi_ggx closure usage)."""
    rough = jnp.clip(c["glossy_roughness"], 0.0, 1.0)
    E_o = _ms_energy_lookup(jnp.clip(cos_o, 1e-4, 1.0), rough)
    E_i = _ms_energy_lookup(jnp.clip(cos_i, 1e-4, 1.0), rough)
    E_avg = _ms_eavg_lookup(rough)
    denom = jnp.maximum(um.M_PI * (1.0 - E_avg), 1e-4)
    return (1.0 - E_o) * (1.0 - E_i) / denom * jnp.maximum(cos_i, 0.0)

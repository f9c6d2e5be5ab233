"""Volume scattering (ref: kernel/kernel_volume.h homogeneous path,
kernel/closure/volume.h Henyey-Greenstein; volume stack ref:
kernel_types.h:1035).

Round-1 scope: homogeneous media with closed-form (analytic) distance
sampling and spectral-channel MIS, Henyey-Greenstein phase sampling, and
single-level volume tracking (one enclosing volume per lane — the
reference's volume stack generalizes this; nested volumes land with the
heterogeneous ray-marcher). All batched over the wavefront and fused
into the bounce loop of ops/integrator.py.
"""

from __future__ import annotations
from raytracingproject_tpu.utils import precision as prec

import jax
import jax.numpy as jnp

from raytracingproject_tpu.utils import math as um


def hg_phase_eval(cos_theta, g):
    """Henyey-Greenstein phase function value == its pdf (perfectly
    importance sampled). ref: volume.h single_peaked_henyey_greenstein."""
    g2 = g * g
    denom = 1.0 + g2 - 2.0 * g * cos_theta
    return (1.0 - g2) / jnp.maximum(
        um.M_4PI * denom * jnp.sqrt(jnp.maximum(denom, 1e-12)), 1e-12)


def hg_phase_sample(d_in, g, u1, u2):
    """Sample a scattered direction around incoming ray dir d_in.
    Returns (dir, pdf). ref: volume.h henyey_greenstein_sample."""
    # cos(theta) inversion; isotropic fallback for tiny g
    iso = jnp.abs(g) < 1e-3
    safe_g = jnp.where(iso, 0.5, g)
    sqr_term = (1.0 - safe_g * safe_g) / (1.0 - safe_g + 2.0 * safe_g * u1)
    cos_t_hg = (1.0 + safe_g * safe_g - sqr_term * sqr_term) / (2.0 * safe_g)
    cos_t = jnp.where(iso, 1.0 - 2.0 * u1, cos_t_hg)
    sin_t = um.safe_sqrt(1.0 - cos_t * cos_t)
    phi = um.M_2PI * u2
    t, b = um.make_orthonormals(d_in)
    dir_out = (sin_t * jnp.cos(phi))[..., None] * t \
        + (sin_t * jnp.sin(phi))[..., None] * b \
        + cos_t[..., None] * d_in
    return um.safe_normalize(dir_out), hg_phase_eval(cos_t, g)


def eval_volume_closures(shaders, shader_has_volume, vol_shader, n, ctx):
    """Masked dispatch of volume shaders over the wavefront.

    vol_shader: (N,) enclosing-volume shader slot (-1 = vacuum).
    Returns the volume closure union with zeros for vacuum lanes."""
    from raytracingproject_tpu.ops import closures as cl
    out = cl.empty_volume_closures((n,))
    for slot, shader in enumerate(shaders):
        if not shader_has_volume[slot]:
            continue
        v = shader.evaluate_volume(ctx)
        if v is None:
            continue
        m = vol_shader == slot
        for k in ("sigma_t", "sigma_s", "v_emission"):
            out[k] = jnp.where(m[:, None], v[k], out[k])
        out["anisotropy"] = jnp.where(m, v["anisotropy"], out["anisotropy"])
    return out


def sample_distance_homogeneous(sigma_t, throughput, t_max, u_dist, u_chan):
    """Closed-form scatter-distance sampling with throughput-weighted
    spectral channel selection + channel MIS
    (ref: kernel_volume.h kernel_volume_integrate_homogeneous).

    Returns dict(scatter (N,) bool candidate, t_scatter (N,),
    weight_scatter (N,3) = T*sigma_t_c-normalized, weight_pass (N,3)).
    """
    # channel pick proportional to throughput (fallback uniform)
    w = jnp.abs(throughput)
    wsum = jnp.sum(w, -1, keepdims=True)
    w = jnp.where(wsum > 1e-12, w / jnp.maximum(wsum, 1e-12),
                  jnp.full_like(w, 1.0 / 3.0))
    c0 = w[..., 0]
    c01 = w[..., 0] + w[..., 1]
    sig_c = jnp.where(u_chan < c0, sigma_t[..., 0],
                      jnp.where(u_chan < c01, sigma_t[..., 1],
                                sigma_t[..., 2]))
    sig_c = jnp.maximum(sig_c, 1e-12)
    t_scatter = -jnp.log(jnp.maximum(1.0 - u_dist, 1e-12)) / sig_c

    scatter = t_scatter < t_max
    t_eff = jnp.minimum(t_scatter, t_max)
    T = jnp.exp(-sigma_t * t_eff[..., None])            # (N, 3)
    # pdf of scattering at t (channel-MIS): sum_c w_c sig_c T_c
    pdf_scatter = jnp.sum(w * sigma_t * T, -1)
    # pdf of passing through: sum_c w_c T_c
    pdf_pass = jnp.sum(w * T, -1)
    weight_scatter = um.safe_divide(T, pdf_scatter[..., None], 0.0)
    weight_pass = um.safe_divide(T, pdf_pass[..., None], 0.0)
    return {"scatter": scatter, "t_scatter": t_scatter,
            "weight_scatter": weight_scatter, "weight_pass": weight_pass,
            "transmittance": T}


def distance_pdf(sigma_t, throughput, t):
    """pdf (per unit length) with which sample_distance_homogeneous
    lands a scatter event at distance t — used as the distance-technique
    density in the equiangular/distance MIS weights
    (ref: kernel_volume.h:978-1050 MIS combine).

    Must mirror sample_distance_homogeneous's channel mixture exactly:
    pdf(t) = sum_c w_c sigma_c exp(-sigma_c t)."""
    w = jnp.abs(throughput)
    wsum = jnp.sum(w, -1, keepdims=True)
    w = jnp.where(wsum > 1e-12, w / jnp.maximum(wsum, 1e-12),
                  jnp.full_like(w, 1.0 / 3.0))
    return jnp.sum(w * sigma_t * jnp.exp(-sigma_t * t[..., None]), -1)


def equiangular_sample(o, d, t_max, light_P, u):
    """Sample a scatter distance along [0, t_max] with pdf proportional
    to 1/(D^2 + (t-delta)^2) — inverse squared distance to a fixed light
    point (ref: kernel_volume.h:297-319 kernel_volume_equiangular_sample,
    "Importance Sampling Techniques for Path Tracing in Participating
    Media", Kulla & Fajardo 2012).

    Returns (t (N,), pdf (N,) per-unit-length, valid (N,)). Lanes where
    the light point lies on the ray axis (D ~ 0) or the span is
    degenerate report valid=False (caller falls back to distance
    sampling for those lanes)."""
    to_l = light_P - o
    delta = um.dot(to_l, d)                       # closest-approach abscissa
    D2 = jnp.maximum(um.dot(to_l, to_l) - delta * delta, 0.0)
    D = jnp.sqrt(D2)
    theta_a = -jnp.arctan2(delta, D)
    theta_b = jnp.arctan2(t_max - delta, D)
    span = theta_b - theta_a
    t_off = D * jnp.tan(theta_a + u * span)
    t = jnp.clip(delta + t_off, 0.0, t_max)
    pdf = um.safe_divide(D, span * (D2 + t_off * t_off), 0.0)
    valid = (D > 1e-6) & (span > 1e-6) & (t_max > 1e-8)
    return t, pdf, valid


def equiangular_pdf(o, d, t_max, light_P, t):
    """Density of equiangular_sample at an externally chosen t (the
    other MIS technique's sample). Zero where equiangular is invalid
    (ref: kernel_volume.h kernel_volume_equiangular_pdf)."""
    to_l = light_P - o
    delta = um.dot(to_l, d)
    D2 = jnp.maximum(um.dot(to_l, to_l) - delta * delta, 0.0)
    D = jnp.sqrt(D2)
    theta_a = -jnp.arctan2(delta, D)
    theta_b = jnp.arctan2(t_max - delta, D)
    span = theta_b - theta_a
    t_off = t - delta
    pdf = um.safe_divide(D, span * (D2 + t_off * t_off), 0.0)
    return jnp.where((D > 1e-6) & (span > 1e-6), pdf, 0.0)


def ratio_tracking(eval_sigma, o, d, t_max, sigma_max, u_seed, steps=32):
    """Unbiased heterogeneous transmittance along [0, t_max] by ratio
    tracking (ref: kernel_volume.h shadow path — redesigned from the
    reference's fixed-step ray marching to the unbiased null-collision
    estimator, which vectorizes as a fixed-iteration wavefront loop).

    eval_sigma(P) -> (sigma_t (N,3), sigma_s) at world positions.
    sigma_max: (N,) per-lane majorant (lanes with ~0 majorant return 1).
    Returns (N,3) transmittance estimate."""
    from raytracingproject_tpu.utils import rng as rngu
    n = o.shape[0]
    active0 = (sigma_max > 1e-9) & (t_max > 1e-8)
    inv_smax = 1.0 / jnp.maximum(sigma_max, 1e-12)

    def body(i, st):
        t, T, done = st
        h = rngu.hash_pcg3d(u_seed, jnp.uint32(i), jnp.uint32(0x68BC21EB))
        u = rngu.uint_to_float_01(h)
        t_new = t + (-jnp.log(jnp.maximum(1.0 - u, 1e-12)) * inv_smax)
        escaped = t_new >= t_max
        P = o + d * t_new[:, None]
        sig_t, _ = eval_sigma(P)
        # clamp keeps a per-channel majorant underestimate safe (the
        # host majorant carries a 2x margin; residual bias ~0)
        f = jnp.clip(1.0 - sig_t * inv_smax[:, None], 0.0, 1.0)
        step_on = (~done) & (~escaped)
        T = jnp.where(step_on[:, None], T * f, T)
        dead = jnp.all(T < 1e-6, -1)
        done = done | escaped | dead
        t = jnp.where(done, t, t_new)
        return (t, T, done)

    init = (jnp.zeros((n,), prec.FT), jnp.ones((n, 3), prec.FT),
            ~active0)
    _t, T, _done = jax.lax.fori_loop(0, steps, body, init)
    return jnp.where(active0[:, None], T, 1.0)


def emission_integral(v_emission, sigma_t, t):
    """Accumulated emission along a homogeneous segment:
    int_0^t e * exp(-sigma_t s) ds (ref: kernel_volume_emission_integrate)."""
    st = jnp.maximum(sigma_t, 1e-12)
    return v_emission * (1.0 - jnp.exp(-sigma_t * t[..., None])) / st


def woodcock_sample(eval_sigma, o, d, t_max, sigma_max, u_seed, steps=32):
    """Delta (Woodcock) tracking for heterogeneous media
    (ref: kernel_volume.h heterogeneous integration — redesigned as
    fixed-iteration null-collision tracking, which is the
    wavefront-friendly unbiased form).

    eval_sigma(P) -> (sigma_t (N,3), sigma_s (N,3)) at world positions.
    sigma_max: (N,) per-lane majorant (host-estimated upper bound of the
    channel-max extinction). u_seed: (N,) uint32 per-lane decorrelation.

    Returns dict(scatter (N,), t (N,), weight (N,3)) where weight folds
    the single-scatter albedo at the accepted point; pass-through lanes
    carry weight 1 (null collisions are free).
    """
    from raytracingproject_tpu.utils import rng as rngu
    n = o.shape[0]
    inv_smax = 1.0 / jnp.maximum(sigma_max, 1e-12)

    def body(i, st):
        t, done, scat, weight, t_hit = st
        h = rngu.hash_pcg3d(u_seed, jnp.uint32(i),
                            jnp.uint32(0x9E3779B9))
        u1 = rngu.uint_to_float_01(h)
        u2 = rngu.uint_to_float_01(rngu.hash_pcg(h))
        step = -jnp.log(jnp.maximum(1.0 - u1, 1e-12)) * inv_smax
        t_new = t + step
        escaped = t_new >= t_max
        P = o + d * t_new[:, None]
        sig_t, sig_s = eval_sigma(P)
        # channel-max extinction for acceptance; color handled in weight
        sig_mag = jnp.max(sig_t, -1)
        p_acc = jnp.clip(sig_mag * inv_smax, 0.0, 1.0)
        tentative = (~done) & (~escaped)
        accept = tentative & (u2 < p_acc)
        null = tentative & ~accept
        # real collision: per-channel weight sigma_s_c / sig_mag
        # (shared monochrome acceptance reweighted per channel)
        w_hit = um.safe_divide(sig_s, jnp.maximum(sig_mag, 1e-12)[:, None],
                               0.0)
        weight = jnp.where(accept[:, None], weight * w_hit, weight)
        # null collision: per-channel (1 - sigma_t_c/smax)/(1 - p_acc)
        # keeps colored extinction unbiased (spectral delta tracking)
        w_null = um.safe_divide(1.0 - sig_t * inv_smax[:, None],
                                jnp.maximum(1.0 - p_acc, 1e-6)[:, None],
                                1.0)
        weight = jnp.where(null[:, None], weight * w_null, weight)
        scat = scat | accept
        done = done | accept | escaped
        t = jnp.where(done, t, t_new)
        t_hit = jnp.where(accept, t_new, t_hit)
        return (t, done, scat, weight, t_hit)

    init = (jnp.zeros((n,), prec.FT), jnp.zeros((n,), bool),
            jnp.zeros((n,), bool), jnp.ones((n, 3), prec.FT),
            jnp.full((n,), um.RAY_TMAX, prec.FT))
    t, done, scat, weight, t_hit = jax.lax.fori_loop(0, steps, body, init)
    # lanes that used all steps without deciding: treat as pass-through
    # (bias bounded by sigma_max * t_max >> steps scenarios; steps is
    # sized from volume_max_steps)
    return {"scatter": scat, "t": t_hit, "weight": weight}

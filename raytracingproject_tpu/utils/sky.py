"""Nishita physical sky: single-scattering atmosphere precompute.

Capability ref: the reference's SkyTextureNode type='nishita'
(render/nodes.cpp:708-745 + kernel/svm/svm_sky.h sky_radiance_nishita),
which path-traces sun light through a spherical Rayleigh/Mie/ozone
atmosphere and bakes the result into a lat-long table at shader compile
time. This is an independent implementation of the same physics
(Nishita 1993 single scattering), redesigned for this renderer:

- NumPy vectorized over all (pixel, segment, sun-segment) triples in
  one pass at scene sync (no per-sample device work), producing an
  equirectangular image consumed by the existing env-texture sampling
  and the background light importance map — so NEE and MIS treat the
  physical sky exactly like any HDRI.
- RGB radiometry (the renderer is tristimulus): scattering/absorption
  coefficients are standard sea-level values for 680/550/440 nm.

Model: viewer at radius Re+altitude. For each direction, march the
view segment to the atmosphere shell (or the ground), accumulating

    L = sum_s  T(eye, s) * T(s, sun) * (beta_R rho_R(s) P_R(mu)
                                      + beta_Ms rho_M(s) P_M(mu)) ds * E

with exponential density profiles for air/aerosols and a tent profile
for the ozone layer. The sun disc is splatted energy-conservingly into
the pixel grid (disc solid angle / pixel solid angle) with limb
darkening, so total sun irradiance is preserved for lighting.
"""

from __future__ import annotations

import numpy as np

EARTH_R = 6360e3          # m
ATMO_R = 6420e3           # m
HR = 8000.0               # Rayleigh scale height
HM = 1200.0               # Mie scale height
OZONE_CENTER = 25e3       # tent profile center
OZONE_HALFWIDTH = 15e3

# sea-level coefficients (m^-1) at (680, 550, 440) nm
BETA_R = np.array([5.802e-6, 13.558e-6, 33.1e-6])
BETA_M_S = np.array([3.996e-6, 3.996e-6, 3.996e-6])
BETA_M_A = BETA_M_S * 1.1
BETA_O = np.array([0.650e-6, 1.881e-6, 0.085e-6])
MIE_G = 0.76

# relative RGB solar irradiance at top of atmosphere (approximately
# flat in RGB bands; the transmitted spectrum gets its color from the
# atmosphere)
SUN_E = np.array([1.0, 0.98, 0.95]) * 20.0

VIEW_SEGMENTS = 32
SUN_SEGMENTS = 8


def _densities(h, air, dust, ozone):
    """h (...,) meters above ground -> (rho_R, rho_M, rho_O)."""
    h = np.maximum(h, 0.0)
    rho_r = air * np.exp(-h / HR)
    rho_m = dust * np.exp(-h / HM)
    rho_o = ozone * np.maximum(
        0.0, 1.0 - np.abs(h - OZONE_CENTER) / OZONE_HALFWIDTH)
    return rho_r, rho_m, rho_o


def _sigma_t(rho_r, rho_m, rho_o):
    """(..., 3) extinction from densities (...,)."""
    return (rho_r[..., None] * BETA_R
            + rho_m[..., None] * (BETA_M_S + BETA_M_A)
            + rho_o[..., None] * BETA_O)


def _sphere_exit(o_z, d_z, radius):
    """Distance along (0,0,o_z)+t*d to |p|=radius (far root).

    o_z: scalar viewer radius; d_z (...,) = d·ẑ_viewer (cos of angle
    from up). Viewer assumed inside the sphere."""
    b = o_z * d_z
    c = o_z * o_z - radius * radius
    disc = np.maximum(b * b - c, 0.0)
    return -b + np.sqrt(disc)


def _sphere_entry(o_z, d_z, radius):
    """Near-root distance to |p|=radius, inf when missed (viewer
    outside the sphere)."""
    b = o_z * d_z
    c = o_z * o_z - radius * radius
    disc = b * b - c
    hit = (disc >= 0.0) & (-b - np.sqrt(np.maximum(disc, 0.0)) > 0.0)
    t = -b - np.sqrt(np.maximum(disc, 0.0))
    return np.where(hit, t, np.inf)


def _sun_transmittance(p, sun_dir, air, dust, ozone):
    """Transmittance from points p (..., 3) to the sun. Zero when the
    earth shadows the point (sun below the local horizon)."""
    r = np.linalg.norm(p, axis=-1)
    mu = np.sum(p * sun_dir, axis=-1) / np.maximum(r, 1.0)
    # earth shadow: the ray toward the sun enters the ground sphere
    b = r * mu
    disc = b * b - (r * r - EARTH_R * EARTH_R)
    shadowed = (disc > 0.0) & (-b - np.sqrt(np.maximum(disc, 0.0)) > 0.0)
    # exit distance from the atmosphere shell
    t_exit = -b + np.sqrt(np.maximum(b * b - (r * r - ATMO_R * ATMO_R),
                                     0.0))
    tau = np.zeros(p.shape[:-1] + (3,))
    dt = t_exit / SUN_SEGMENTS
    for i in range(SUN_SEGMENTS):
        t_mid = (i + 0.5) * dt
        q = p + t_mid[..., None] * sun_dir
        h = np.linalg.norm(q, axis=-1) - EARTH_R
        tau += _sigma_t(*_densities(h, air, dust, ozone)) * dt[..., None]
    return np.where(shadowed[..., None], 0.0, np.exp(-tau))


def sky_radiance(dirs, sun_dir, air=1.0, dust=1.0, ozone=1.0,
                 altitude=0.0, sun_intensity=1.0,
                 ground_albedo=0.3):
    """Single-scattered sky radiance for unit directions (..., 3).

    Directions below the horizon return sun-lit ground (lambertian
    earth disk approximation, like the reference's dark earth)."""
    shape = dirs.shape[:-1]
    dirs = dirs.reshape(-1, 3).astype(np.float64)
    sun_dir = np.asarray(sun_dir, np.float64)
    sun_dir = sun_dir / np.linalg.norm(sun_dir)
    o_r = EARTH_R + max(float(altitude), 1.0)
    d_z = dirs[..., 2]

    t_ground = _sphere_entry(o_r, d_z, EARTH_R)
    t_atmo = _sphere_exit(o_r, d_z, ATMO_R)
    t_end = np.minimum(t_ground, t_atmo)

    mu = dirs @ sun_dir
    phase_r = 3.0 / (16.0 * np.pi) * (1.0 + mu * mu)
    g = MIE_G
    phase_m = (3.0 / (8.0 * np.pi) * (1.0 - g * g) * (1.0 + mu * mu)
               / ((2.0 + g * g)
                  * np.power(1.0 + g * g - 2.0 * g * mu, 1.5)))

    E = SUN_E * float(sun_intensity)
    L = np.zeros((dirs.shape[0], 3))
    tau_acc = np.zeros((dirs.shape[0], 3))
    dt = t_end / VIEW_SEGMENTS
    viewer = np.array([0.0, 0.0, o_r])
    for i in range(VIEW_SEGMENTS):
        t_mid = (i + 0.5) * dt
        p = viewer + t_mid[..., None] * dirs
        h = np.linalg.norm(p, axis=-1) - EARTH_R
        rho_r, rho_m, rho_o = _densities(h, air, dust, ozone)
        seg_tau = _sigma_t(rho_r, rho_m, rho_o) * dt[..., None]
        t_view = np.exp(-(tau_acc + 0.5 * seg_tau))
        t_sun = _sun_transmittance(p, sun_dir, air, dust, ozone)
        scatter = (rho_r[..., None] * BETA_R * phase_r[..., None]
                   + rho_m[..., None] * BETA_M_S * phase_m[..., None])
        L += t_view * t_sun * scatter * dt[..., None] * E
        tau_acc += seg_tau

    # ground: lambertian earth lit by the transmitted sun, seen through
    # the accumulated view transmittance (in addition to the in-scatter
    # already integrated along the view segment)
    hit_ground = np.isfinite(t_ground) & (t_ground <= t_atmo)
    if np.any(hit_ground):
        tg = np.where(hit_ground, t_ground, 0.0)
        pg = viewer + tg[..., None] * dirs
        ng = pg / np.linalg.norm(pg, axis=-1, keepdims=True)
        cos_sun = np.maximum(ng @ sun_dir, 0.0)
        t_sun_g = _sun_transmittance(pg, sun_dir, air, dust, ozone)
        ground = (ground_albedo / np.pi) * cos_sun[..., None] \
            * t_sun_g * E
        L = np.where(hit_ground[..., None],
                     L + np.exp(-tau_acc) * ground, L)
    return L.reshape(shape + (3,)).astype(np.float32)


def sun_radiance(sun_dir, air=1.0, dust=1.0, ozone=1.0, altitude=0.0,
                 sun_intensity=1.0, sun_size=np.radians(0.545) / 2):
    """Mean radiance of the sun disc seen from the viewer (3,)."""
    sun_dir = np.asarray(sun_dir, np.float64)
    sun_dir = sun_dir / np.linalg.norm(sun_dir)
    o_r = EARTH_R + max(float(altitude), 1.0)
    p = np.array([[0.0, 0.0, o_r]])
    t = _sun_transmittance(p, sun_dir, air, dust, ozone)[0]
    solid_angle = 2.0 * np.pi * (1.0 - np.cos(sun_size))
    E = SUN_E * float(sun_intensity)
    return (E * t / max(solid_angle, 1e-12)).astype(np.float32)


def sky_image(width=512, height=256, sun_dir=(0.0, 0.0, 1.0),
              air=1.0, dust=1.0, ozone=1.0, altitude=0.0,
              sun_intensity=1.0, sun_disc=True,
              sun_size=np.radians(0.545) / 2, ground_albedo=0.3):
    """Equirectangular (H, W, 4) sky map in the renderer's env mapping
    convention (utils/math.py equirectangular_to_direction)."""
    u = (np.arange(width) + 0.5) / width
    # image rows are stored top-down (sample_image maps v=0 -> bottom
    # row), so row 0 carries v=1 (straight up)
    v = 1.0 - (np.arange(height) + 0.5) / height
    uu, vv = np.meshgrid(u, v)
    phi = np.pi * (1.0 - 2.0 * uu)
    theta = np.pi * (vv - 0.5)
    ct = np.cos(theta)
    dirs = np.stack([ct * np.cos(phi), ct * np.sin(phi),
                     np.sin(theta)], axis=-1)
    img = sky_radiance(dirs, sun_dir, air, dust, ozone, altitude,
                       sun_intensity, ground_albedo)
    if sun_disc:
        sdir = np.asarray(sun_dir, np.float64)
        sdir = sdir / np.linalg.norm(sdir)
        # splat the disc into its pixel, scaled by solid-angle ratio so
        # total irradiance is exact even though the disc is sub-pixel
        su = -np.arctan2(sdir[1], sdir[0]) / (2 * np.pi) + 0.5
        sv = np.arctan2(sdir[2], np.hypot(sdir[0], sdir[1])) / np.pi + 0.5
        px = min(int(su * width), width - 1)
        py = min(int((1.0 - sv) * height), height - 1)  # rows top-down
        pix_sa = (2 * np.pi / width) * (np.pi / height) \
            * max(np.cos(np.pi * (sv - 0.5)), 1e-4)
        disc_sa = 2.0 * np.pi * (1.0 - np.cos(sun_size))
        L_sun = sun_radiance(sun_dir, air, dust, ozone, altitude,
                             sun_intensity, sun_size)
        img[py, px] += L_sun * (disc_sa / pix_sa)
    rgba = np.concatenate([img, np.ones_like(img[..., :1])], axis=-1)
    return rgba.astype(np.float32)

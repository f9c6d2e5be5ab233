"""Programmatic example scenes for tests + benchmarks.

The Cornell box mirrors the classic configuration used by the
reference's example/benchmark scenes (BASELINE.json configs).
"""

from __future__ import annotations

import numpy as np

from raytracingproject_tpu.models import (
    Scene, Camera, Light, Object, Shader, ShaderGraph)
from raytracingproject_tpu.models import shader_nodes as sn
from raytracingproject_tpu.models.mesh import (
    make_plane_mesh, make_box_mesh, make_sphere_mesh)
from raytracingproject_tpu.utils import transform as tfm


def diffuse_shader(name, color):
    g = ShaderGraph()
    d = g.add(sn.DiffuseBsdfNode(name + "_bsdf", color=color))
    g.connect(d, "bsdf", g.output_node, "surface")
    return Shader(name, g)


def toon_shader(name, color, component="diffuse", size=0.5, smooth=0.0):
    g = ShaderGraph()
    t = g.add(sn.ToonBsdfNode(name + "_bsdf", color=color,
                              component=component, size=size,
                              smooth=smooth))
    g.connect(t, "bsdf", g.output_node, "surface")
    return Shader(name, g)


def velvet_shader(name, color, sigma=1.0):
    g = ShaderGraph()
    v = g.add(sn.VelvetBsdfNode(name + "_bsdf", color=color, sigma=sigma))
    g.connect(v, "bsdf", g.output_node, "surface")
    return Shader(name, g)


def glossy_shader(name, color, roughness=0.1):
    g = ShaderGraph()
    d = g.add(sn.GlossyBsdfNode(name + "_bsdf", color=color,
                                roughness=roughness))
    g.connect(d, "bsdf", g.output_node, "surface")
    return Shader(name, g)


def glass_shader(name, color=(1, 1, 1), ior=1.45, roughness=0.0):
    g = ShaderGraph()
    d = g.add(sn.GlassBsdfNode(name + "_bsdf", color=color, ior=ior,
                               roughness=roughness))
    g.connect(d, "bsdf", g.output_node, "surface")
    return Shader(name, g)


def emission_shader(name, color, strength):
    g = ShaderGraph()
    e = g.add(sn.EmissionNode(name + "_emit", color=color, strength=strength))
    g.connect(e, "emission", g.output_node, "surface")
    return Shader(name, g)


def background_shader(name, color, strength=1.0):
    g = ShaderGraph()
    b = g.add(sn.BackgroundNode(name + "_bg", color=color, strength=strength))
    g.connect(b, "background", g.output_node, "surface")
    return Shader(name, g)


def cornell_box(width=256, height=256, spp=64, light_mode="mesh",
                spheres=None):
    """Classic Cornell box. light_mode: 'mesh' (emissive quad geometry)
    or 'area' (area lamp). spheres: None | 'diffuse' | 'glossy' | 'glass'."""
    scene = Scene()
    scene.camera.set("matrix", tfm.look_at((278, -800, 273), (278, 0, 273),
                                           (0, 0, 1)))
    scene.camera.set("fov", 2.0 * np.arctan(0.5 * 0.025 / 0.035))
    scene.camera.set("fov", 0.686)
    scene.camera.set("width", width)
    scene.camera.set("height", height)

    white = diffuse_shader("white", (0.73, 0.73, 0.73))
    red = diffuse_shader("red", (0.65, 0.05, 0.05))
    green = diffuse_shader("green", (0.12, 0.45, 0.15))
    for s in (white, red, green):
        scene.add_shader(s)

    def add_mesh(mesh, shaders, name):
        mesh.used_shaders = shaders
        obj = Object(name, mesh)
        scene.add_object(obj)
        return obj

    # box interior: floor/ceiling/back white, left red(+x? classic: left
    # red, right green), using z-up coords, camera along -y
    floor = make_plane_mesh((0, 0, 0), (556, 0, 0), (0, 556, 0), 0, "floor")
    ceil = make_plane_mesh((0, 0, 548.8), (0, 556, 0), (556, 0, 0), 0, "ceil")
    back = make_plane_mesh((0, 556, 0), (556, 0, 0), (0, 0, 548.8), 0, "back")
    right = make_plane_mesh((0, 0, 0), (0, 556, 0), (0, 0, 548.8), 0, "right")
    left = make_plane_mesh((556, 0, 0), (0, 0, 548.8), (0, 556, 0), 0, "left")
    add_mesh(floor, [white], "floor")
    add_mesh(ceil, [white], "ceil")
    add_mesh(back, [white], "back")
    add_mesh(right, [green], "right")
    add_mesh(left, [red], "left")

    # two boxes (classic short + tall) or spheres
    if spheres is None:
        short = make_box_mesh((130, 65, 0), (295, 230, 165), 0, "short")
        tall = make_box_mesh((265, 296, 0), (430, 461, 330), 0, "tall")
        add_mesh(short, [white], "short_box")
        add_mesh(tall, [white], "tall_box")
    else:
        mat1 = {"diffuse": white,
                "glossy": glossy_shader("mirror", (0.95, 0.95, 0.95), 0.05),
                "glass": glass_shader("glass")}[spheres]
        scene.add_shader(mat1)
        s1 = make_sphere_mesh((185, 170, 90), 90, 0, name="sphere1")
        s2 = make_sphere_mesh((370, 350, 90), 90, 0, name="sphere2")
        s1.set("smooth", np.ones(s1.num_triangles, bool))
        s2.set("smooth", np.ones(s2.num_triangles, bool))
        add_mesh(s1, [mat1], "sphere1")
        add_mesh(s2, [white], "sphere2")

    # light
    if light_mode == "mesh":
        lshader = emission_shader("light", (1.0, 0.88, 0.68), 18.0)
        scene.add_shader(lshader)
        lm = make_plane_mesh((213, 227, 548.7), (130, 0, 0), (0, 105, 0), 0,
                             "light")
        add_mesh(lm, [lshader], "light")
    else:
        light = Light("key", light_type="area",
                      co=(278, 279.5, 548.7),
                      axisu=(1, 0, 0), sizeu=130.0,
                      axisv=(0, 1, 0), sizev=105.0,
                      strength=(18.0, 15.8, 12.2))
        # area lamp dir faces -z (down into the box)
        light.set("dir", (0, 0, -1))
        # swap axes so cross(axisu, axisv) == -z
        light.set("axisu", (0, 1, 0))
        light.set("axisv", (1, 0, 0))
        light.set("sizeu", 105.0)
        light.set("sizev", 130.0)
        scene.add_light(light)

    scene.integrator.set("aa_samples", spp)
    scene.integrator.set("max_bounce", 4)
    scene.background.shader = None
    return scene


def checker_shader(name, scale=4.0, c1=(0.8, 0.8, 0.8), c2=(0.15, 0.15, 0.4)):
    g = ShaderGraph()
    t = g.add(sn.CheckerTextureNode(name + "_tex", scale=scale,
                                    color1=c1, color2=c2))
    d = g.add(sn.DiffuseBsdfNode(name + "_bsdf"))
    g.connect(t, "color", d, "color")
    g.connect(d, "bsdf", g.output_node, "surface")
    return Shader(name, g)


def image_texture_shader(name, image):
    g = ShaderGraph()
    t = g.add(sn.ImageTextureNode(name + "_tex", image=image))
    d = g.add(sn.DiffuseBsdfNode(name + "_bsdf"))
    g.connect(t, "color", d, "color")
    g.connect(d, "bsdf", g.output_node, "surface")
    return Shader(name, g)


def instanced_scene(width=256, height=256, spp=32, grid=4, nlat=12,
                    nlon=24):
    """Textured mesh scene with instancing — two-level TLAS/BLAS path
    (BASELINE config 3). One sphere geometry instanced grid x grid times
    over a checkered ground plane, UV image texture on the spheres."""
    scene = Scene()
    scene.camera.set("matrix", tfm.look_at((14, -18, 10), (0, 0, 1),
                                           (0, 0, 1)))
    scene.camera.set("fov", 0.7)
    scene.camera.set("width", width)
    scene.camera.set("height", height)

    ground = checker_shader("ground")
    scene.add_shader(ground)
    plane = make_plane_mesh((-30, -30, 0), (60, 0, 0), (0, 60, 0), 0,
                            "ground")
    plane.used_shaders = [ground]
    scene.add_object(Object("ground", plane))

    # procedural uv-image for the spheres
    img = np.zeros((64, 64, 3), np.float32)
    yy, xx = np.mgrid[0:64, 0:64]
    img[..., 0] = 0.5 + 0.5 * np.sin(xx * 0.4)
    img[..., 1] = 0.5 + 0.5 * np.cos(yy * 0.3)
    img[..., 2] = 0.6
    mat = image_texture_shader("spheremat", img)
    scene.add_shader(mat)

    sphere = make_sphere_mesh((0, 0, 0), 1.0, 0, nlat=nlat, nlon=nlon)
    sphere.set("smooth", np.ones(sphere.num_triangles, bool))
    # uv attribute from spherical coords for the image texture
    sphere.used_shaders = [mat]
    for i in range(grid):
        for j in range(grid):
            t = tfm.compose(
                tfm.translate((i - grid / 2 + 0.5) * 4.0,
                              (j - grid / 2 + 0.5) * 4.0, 1.0),
                tfm.rotate(0.3 * (i + j), (0, 0, 1)))
            scene.add_object(Object(f"inst_{i}_{j}", sphere, transform=t))

    light = Light("sun", light_type="distant", dir=(-0.3, 0.4, -0.85),
                  strength=(3.0, 2.9, 2.6), angle=0.05)
    scene.add_light(light)
    scene.background.shader = background_shader("sky", (0.4, 0.6, 0.9), 0.6)
    scene.integrator.set("aa_samples", spp)
    scene.integrator.set("max_bounce", 4)
    return scene


def many_lights_scene(width=128, height=128, spp=16, grid=8,
                      light_kind="mesh", seed=3, with_infinite=False,
                      use_light_tree=False, glossy_floor=False):
    """Many-light stress scene for the hierarchical light tree
    (ops/light_tree.py): a grid x grid array of small emitters with
    power varying over ~2 orders of magnitude above a large floor.
    Each floor point is dominated by its nearest bright panel, so the
    flat power-CDF pick wastes most samples on far lights while the
    P-aware tree pick concentrates — the variance-ratio test in
    tests/test_light_tree.py measures exactly that.

    light_kind: 'mesh' (emissive quads), 'point', or 'spot' (pointing
    down). with_infinite adds a distant sun + constant background (the
    tree's infinite group)."""
    rng = np.random.default_rng(seed)
    scene = Scene()
    scene.camera.set("matrix", tfm.look_at((10, -9, 9), (10, 10, 0),
                                           (0, 0, 1)))
    scene.camera.set("fov", 0.85)
    scene.camera.set("width", width)
    scene.camera.set("height", height)

    floor_sh = (glossy_shader("ml_floor", (0.8, 0.8, 0.8), 0.25)
                if glossy_floor else diffuse_shader("ml_floor",
                                                    (0.7, 0.7, 0.7)))
    scene.add_shader(floor_sh)
    plane = make_plane_mesh((0, 0, 0), (20, 0, 0), (0, 20, 0), 0,
                            "ml_floor")
    plane.used_shaders = [floor_sh]
    scene.add_object(Object("ml_floor", plane))

    for i in range(grid):
        for j in range(grid):
            power = float(rng.uniform(0.5, 1.0)
                          * (40.0 if (i + j) % 3 == 0 else 0.5))
            color = (1.0, float(rng.uniform(0.4, 1.0)),
                     float(rng.uniform(0.2, 0.9)))
            cx = (i + 0.5) * 20.0 / grid
            cy = (j + 0.5) * 20.0 / grid
            if light_kind == "mesh":
                sh = emission_shader(f"ml_e{i}_{j}", color, power)
                scene.add_shader(sh)
                quad = make_plane_mesh((cx - 0.4, cy - 0.4, 4.0),
                                       (0.8, 0, 0), (0, 0.8, 0), 0,
                                       f"ml_q{i}_{j}")
                quad.used_shaders = [sh]
                scene.add_object(Object(f"ml_q{i}_{j}", quad))
            elif light_kind == "point":
                scene.add_light(Light(
                    f"ml_p{i}_{j}", light_type="point",
                    co=(cx, cy, 4.0), size=0.05,
                    strength=tuple(np.asarray(color) * power)))
            else:  # spot, pointing down
                sp = Light(f"ml_s{i}_{j}", light_type="spot",
                           co=(cx, cy, 4.0),
                           strength=tuple(np.asarray(color) * power))
                sp.set("dir", (0, 0, -1))
                sp.set("spot_angle", 1.1)
                sp.set("spot_smooth", 0.15)
                scene.add_light(sp)
    if with_infinite:
        scene.add_light(Light("ml_sun", light_type="distant",
                              dir=(-0.3, 0.4, -0.85),
                              strength=(1.5, 1.4, 1.2), angle=0.05))
        scene.background.shader = background_shader(
            "ml_sky", (0.2, 0.3, 0.45), 0.4)
    else:
        scene.background.shader = None
    scene.integrator.set("aa_samples", spp)
    scene.integrator.set("max_bounce", 3)
    scene.integrator.set("use_light_tree", bool(use_light_tree))
    return scene


def dof_motion_scene(width=256, height=256, spp=32):
    """DoF + camera motion blur + adaptive sampling (BASELINE config 4)."""
    scene = cornell_box(width, height, spp, spheres="glossy")
    scene.camera.set("aperturesize", 12.0)
    scene.camera.set("focaldistance", 900.0)
    scene.camera.set("blades", 6)
    scene.camera.set("use_motion", True)
    base = np.asarray(scene.camera.matrix, np.float32)
    shift = tfm.compose(tfm.translate(25, 0, 0), base)
    scene.camera.set("motion_start", base)
    scene.camera.set("motion_end", shift)
    scene.integrator.set("adaptive_threshold", 0.02)
    scene.integrator.set("adaptive_min_samples", max(spp // 4, 4))
    return scene


def principled_hair_shader(name, melanin=0.3, roughness=0.3,
                           radial_roughness=0.3, parametrization="melanin",
                           absorption=(0.0, 0.0, 0.0)):
    """Principled hair material (ops/hair.py Chiang et al. model)."""
    g = ShaderGraph()
    hn = g.add(sn.PrincipledHairBsdfNode(
        name + "_hair", melanin=melanin, roughness=roughness,
        radial_roughness=radial_roughness,
        absorption_coefficient=absorption))
    hn.set("parametrization", parametrization)
    g.connect(hn, "bsdf", g.output_node, "surface")
    return Shader(name, g)


def hair_patch_scene(width=128, height=128, spp=16, n_strands=220,
                     seed=0, shader=None, furnace=False):
    """A patch of flowing strands; principled hair by default. With
    furnace=True the strands are non-absorbing inside a unit-radiance
    background (hair energy conservation end-to-end)."""
    from raytracingproject_tpu.models.mesh import Hair
    rng = np.random.default_rng(seed)
    scene = Scene()
    scene.camera.set("matrix", tfm.look_at((0, -3.2, 0.7), (0, 0, 0.25),
                                           (0, 0, 1)))
    scene.camera.set("fov", 0.7)
    scene.camera.set("width", width)
    scene.camera.set("height", height)
    if shader is None:
        if furnace:
            shader = principled_hair_shader(
                "hair_white", parametrization="absorption",
                absorption=(0.0, 0.0, 0.0))
        else:
            shader = principled_hair_shader("hair_brown", melanin=0.45)
    scene.add_shader(shader)
    hair = Hair("strands")
    nk = 7
    for i in range(n_strands):
        x0 = rng.uniform(-0.9, 0.9)
        y0 = rng.uniform(-0.25, 0.25)
        sway = rng.uniform(0.2, 0.55)
        ph = rng.uniform(0, 2 * np.pi)
        zs = np.linspace(0.0, 1.1, nk)
        xs = x0 + sway * 0.35 * np.sin(2.2 * zs + ph)
        ys = y0 + sway * 0.25 * np.cos(1.7 * zs + ph)
        keys = np.stack([xs, ys, zs], -1)
        hair.add_curve(keys, radius=np.linspace(0.012, 0.004, nk))
    hair.used_shaders = [shader]
    scene.add_object(Object("hair", hair))
    scene.integrator.set("aa_samples", spp)
    if furnace:
        scene.integrator.set("max_bounce", 24)
        scene.integrator.set("min_bounce", 12)
        scene.integrator.set("sample_clamp_indirect", 0.0)
        scene.background.shader = background_shader(
            "furnace_bg", (1.0, 1.0, 1.0), 1.0)
    else:
        scene.integrator.set("max_bounce", 6)
        # emitting side faces -z (cross(axisu, axisv) points down)
        key = Light("key", light_type="area", co=(1.5, -2.0, 2.2),
                    axisu=(0, 1, 0), sizeu=1.2,
                    axisv=(1, 0, 0), sizev=1.2,
                    strength=(40.0, 38.0, 34.0))
        key.set("dir", (0, 0, -1))
        scene.add_light(key)
        scene.background.shader = background_shader(
            "sky_bg", (0.05, 0.06, 0.08), 1.0)
    return scene


def volume_shader(name, color=(0.8, 0.8, 0.8), density=1.0, anisotropy=0.0,
                  absorption=(1.0, 1.0, 1.0)):
    """Volume-only material (surface acts as transparent boundary)."""
    g = ShaderGraph()
    v = g.add(sn.PrincipledVolumeNode(
        name + "_vol", color=color, density=density, anisotropy=anisotropy,
        absorption_color=absorption))
    g.connect(v, "volume", g.output_node, "volume")
    return Shader(name, g)


def smoke_cornell(width=128, height=128, spp=32, density=0.01,
                  anisotropy=0.3):
    """Cornell box with a homogeneous scattering medium filling a box
    (BASELINE config 5: 'smoke-in-box')."""
    scene = cornell_box(width, height, spp)
    vol = volume_shader("smoke", color=(0.8, 0.8, 0.8), density=density,
                        anisotropy=anisotropy)
    scene.add_shader(vol)
    box = make_box_mesh((100, 100, 50), (456, 456, 400), 0, "smoke_box")
    box.used_shaders = [vol]
    scene.add_object(Object("smoke", box))
    scene.integrator.set("max_bounce", 6)
    scene.integrator.set("volume_samples", 1)
    return scene


def smoke_small_light(width=32, height=32, spp=16, density=0.4,
                      method="distance"):
    """Homogeneous smoke cube lit ONLY by a small bright emissive quad
    inside the medium — the classic stress case for equiangular volume
    sampling (ref: kernel_volume.h:297-319; Kulla & Fajardo 2012).
    `method` selects the volume NEE technique per shader socket."""
    scene = Scene()
    scene.camera.set("matrix", tfm.look_at((0, -4.5, 0), (0, 0, 0),
                                           (0, 0, 1)))
    scene.camera.set("fov", 0.8)
    scene.camera.set("width", width)
    scene.camera.set("height", height)
    vol = volume_shader("smoke", color=(0.9, 0.9, 0.9), density=density,
                        anisotropy=0.0)
    vol.set("volume_sampling_method", method)
    scene.add_shader(vol)
    box = make_box_mesh((-2, -2, -2), (2, 2, 2), 0, "smoke_box")
    box.used_shaders = [vol]
    scene.add_object(Object("smoke", box))
    lshader = emission_shader("small_light", (1.0, 1.0, 1.0), 1500.0)
    scene.add_shader(lshader)
    lm = make_plane_mesh((-0.06, 0.0, 0.9), (0.12, 0, 0), (0, 0.12, 0), 0,
                         "light")
    lm.used_shaders = [lshader]
    scene.add_object(Object("light", lm))
    scene.integrator.set("aa_samples", spp)
    scene.integrator.set("max_bounce", 3)
    scene.integrator.set("sample_clamp_indirect", 0.0)
    scene.integrator.set("sample_clamp_direct", 0.0)
    scene.background.shader = None
    return scene


def volume_furnace(width=32, height=32, density=0.5):
    """Pure-scattering (albedo 1) volume sphere in a unit-radiance
    background: must render exactly 1 (volume energy conservation)."""
    scene = Scene()
    scene.camera.set("matrix", tfm.look_at((0, -6, 0), (0, 0, 0), (0, 0, 1)))
    scene.camera.set("fov", 0.5)
    scene.camera.set("width", width)
    scene.camera.set("height", height)
    vol = volume_shader("fog", color=(1.0, 1.0, 1.0), density=density,
                        anisotropy=0.0)
    scene.add_shader(vol)
    box = make_box_mesh((-1, -1, -1), (1, 1, 1), 0, "fog_box")
    box.used_shaders = [vol]
    scene.add_object(Object("fog", box))
    bg = background_shader("furnace_bg", (1.0, 1.0, 1.0), 1.0)
    scene.background.shader = bg
    scene.integrator.set("max_bounce", 32)
    scene.integrator.set("sample_clamp_indirect", 0.0)
    scene.integrator.set("min_bounce", 16)
    return scene


def furnace_scene(width=64, height=64, albedo=1.0, bounces=16):
    """White-furnace closure test: a perfectly white sphere inside a
    uniform unit-radiance background must render exactly 1.0 everywhere
    (checks BSDF sampling + background MIS energy conservation)."""
    scene = Scene()
    scene.camera.set("matrix", tfm.look_at((0, -5, 0), (0, 0, 0), (0, 0, 1)))
    scene.camera.set("fov", 0.6)
    scene.camera.set("width", width)
    scene.camera.set("height", height)
    mat = diffuse_shader("albedo", (albedo, albedo, albedo))
    scene.add_shader(mat)
    sph = make_sphere_mesh((0, 0, 0), 1.0, 0, nlat=24, nlon=48)
    sph.set("smooth", np.ones(sph.num_triangles, bool))
    sph.used_shaders = [mat]
    scene.add_object(Object("sphere", sph))
    bg = background_shader("furnace_bg", (1.0, 1.0, 1.0), 1.0)
    scene.background.shader = bg
    scene.integrator.set("max_bounce", bounces)
    scene.integrator.set("sample_clamp_indirect", 0.0)
    scene.integrator.set("min_bounce", 6)
    return scene


def sss_shader(name, color=(0.9, 0.3, 0.2), radius=(10.0, 5.0, 3.0),
               scale=1.0):
    g = ShaderGraph()
    s = g.add(sn.SubsurfaceScatteringNode(
        name + "_sss", color=color, radius=radius, scale=scale))
    g.connect(s, "bssrdf", g.output_node, "surface")
    return Shader(name, g)


def sss_furnace(width=24, height=24, albedo=1.0, radius=0.3):
    """Unit-albedo random-walk SSS sphere in a unit furnace: must stay
    at 1 (entry + walk + exit energy conservation)."""
    scene = Scene()
    scene.camera.set("matrix", tfm.look_at((0, -5, 0), (0, 0, 0), (0, 0, 1)))
    scene.camera.set("fov", 0.6)
    scene.camera.set("width", width)
    scene.camera.set("height", height)
    mat = sss_shader("skin", color=(albedo, albedo, albedo),
                     radius=(radius, radius, radius), scale=1.0)
    scene.add_shader(mat)
    sph = make_sphere_mesh((0, 0, 0), 1.0, 0, nlat=20, nlon=40)
    sph.set("smooth", np.ones(sph.num_triangles, bool))
    sph.used_shaders = [mat]
    scene.add_object(Object("sphere", sph))
    bg = background_shader("furnace_bg", (1.0, 1.0, 1.0), 1.0)
    scene.background.shader = bg
    scene.integrator.set("max_bounce", 48)
    scene.integrator.set("sample_clamp_indirect", 0.0)
    scene.integrator.set("min_bounce", 24)
    scene.integrator.set("max_transmission_bounce", 48)
    scene.integrator.set("max_diffuse_bounce", 48)
    return scene


def sss_cornell(width=128, height=128, spp=32):
    """Cornell with an SSS sphere (BASELINE config 5 second half)."""
    scene = cornell_box(width, height, spp, spheres=None)
    mat = sss_shader("wax", color=(0.8, 0.5, 0.3),
                     radius=(40.0, 20.0, 10.0))
    scene.add_shader(mat)
    s1 = make_sphere_mesh((278, 280, 120), 110, 0, nlat=20, nlon=40,
                          name="sss_sphere")
    s1.set("smooth", np.ones(s1.num_triangles, bool))
    s1.used_shaders = [mat]
    scene.add_object(Object("sss_sphere", s1))
    scene.integrator.set("max_bounce", 12)
    scene.integrator.set("max_transmission_bounce", 24)
    return scene


def het_volume_shader(name, scale=2.0, density=1.0, anisotropy=0.0):
    """Heterogeneous (noise-density) scattering medium."""
    g = ShaderGraph()
    tex = g.add(sn.NoiseTextureNode(name + "_noise", scale=scale, detail=1.0))
    m = g.add(sn.MathNode(name + "_mul", math_type="multiply",
                          value2=density))
    v = g.add(sn.PrincipledVolumeNode(
        name + "_vol", color=(1.0, 1.0, 1.0), anisotropy=anisotropy,
        absorption_color=(1.0, 1.0, 1.0)))
    g.connect(tex, "fac", m, "value1")
    g.connect(m, "value", v, "density")
    g.connect(v, "volume", g.output_node, "volume")
    return Shader(name, g)


def het_volume_furnace(width=20, height=20, density=1.0):
    """Noise-density pure-scattering volume in a unit furnace: delta
    tracking must conserve energy (render == 1)."""
    scene = Scene()
    scene.camera.set("matrix", tfm.look_at((0, -6, 0), (0, 0, 0), (0, 0, 1)))
    scene.camera.set("fov", 0.5)
    scene.camera.set("width", width)
    scene.camera.set("height", height)
    vol = het_volume_shader("fog", scale=1.5, density=density)
    scene.add_shader(vol)
    box = make_box_mesh((-1, -1, -1), (1, 1, 1), 0, "fog_box")
    box.used_shaders = [vol]
    scene.add_object(Object("fog", box))
    bg = background_shader("furnace_bg", (1.0, 1.0, 1.0), 1.0)
    scene.background.shader = bg
    scene.integrator.set("max_bounce", 32)
    scene.integrator.set("sample_clamp_indirect", 0.0)
    scene.integrator.set("min_bounce", 16)
    scene.integrator.set("volume_max_steps", 32)
    return scene


def volume_sss_scene(width=256, height=256, spp=32, density=0.004):
    """BASELINE config 5 proper: homogeneous smoke-in-box AND a
    random-walk SSS sphere in one Cornell scene (ref configs list,
    BASELINE.json)."""
    scene = smoke_cornell(width, height, spp, density=density)
    mat = sss_shader("wax", color=(0.8, 0.5, 0.3),
                     radius=(40.0, 20.0, 10.0))
    scene.add_shader(mat)
    s1 = make_sphere_mesh((430, 120, 100), 100, 0, nlat=16, nlon=32,
                          name="sss_sphere")
    s1.set("smooth", np.ones(s1.num_triangles, bool))
    s1.used_shaders = [mat]
    scene.add_object(Object("sss_sphere", s1))
    scene.integrator.set("max_bounce", 8)
    scene.integrator.set("max_transmission_bounce", 16)
    return scene


def transparent_shader(name, color=(1.0, 1.0, 1.0)):
    g = ShaderGraph()
    t = g.add(sn.TransparentBsdfNode(name + "_t", color=color))
    g.connect(t, "bsdf", g.output_node, "surface")
    return Shader(name, g)


def shadow_panel_scene(width=32, height=32, panel="none",
                       panel_color=(1.0, 1.0, 1.0),
                       use_transparent_shadow=True, max_bounce=1):
    """Floor + overhead emissive quad + optional occluder panel between
    them — the transparent-shadow test fixture (ref test analog:
    tests/render/shadow scenes). Camera views the floor from below the
    panel so primary rays never touch it; only NEE shadow rays do."""
    scene = Scene()
    scene.camera.set("matrix", tfm.look_at((0, -8, 1.0), (0, 0, 0),
                                           (0, 0, 1)))
    scene.camera.set("fov", 0.5)
    scene.camera.set("width", width)
    scene.camera.set("height", height)
    white = diffuse_shader("white", (0.8, 0.8, 0.8))
    scene.add_shader(white)
    floor = make_plane_mesh((-6, -6, 0), (12, 0, 0), (0, 12, 0), 0, "floor")
    floor.used_shaders = [white]
    scene.add_object(Object("floor", floor))

    lshader = emission_shader("light", (1.0, 1.0, 1.0), 40.0)
    scene.add_shader(lshader)
    lm = make_plane_mesh((-1, -1, 4.0), (2, 0, 0), (0, 2, 0), 0, "light")
    lm.used_shaders = [lshader]
    scene.add_object(Object("light", lm))

    if panel != "none":
        pshader = transparent_shader("panel", color=panel_color)
        pshader.set("use_transparent_shadow", use_transparent_shadow)
        scene.add_shader(pshader)
        pm = make_plane_mesh((-3, -3, 2.0), (6, 0, 0), (0, 6, 0), 0,
                             "panel")
        pm.used_shaders = [pshader]
        scene.add_object(Object("panel", pm))

    scene.integrator.set("aa_samples", 8)
    scene.integrator.set("max_bounce", max_bounce)
    scene.background.shader = None
    return scene

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from raytracingproject_tpu.app.examples import cornell_box
from raytracingproject_tpu.ops import integrator as integ, intersect as isect
from raytracingproject_tpu.ops import shade as shade_ops, bsdf as bsdf_ops, light as light_ops
from raytracingproject_tpu.utils import rng as rngu, math as um
from raytracingproject_tpu.models import object as ob

W=H=512; N=W*H
scene = cornell_box(W,H)
scene.device_update(); kg = scene.make_kernel_globals()
ds = kg["dscene"]
yy,xx = np.mgrid[0:H,0:W]
px=jnp.asarray(xx.reshape(-1),jnp.int32); py=jnp.asarray(yy.reshape(-1),jnp.int32)
pidx = py*W+px

def timeit(f, *args, reps=5):
    r = f(*args); jax.block_until_ready(r)
    t0=time.time()
    for _ in range(reps): r = f(*args)
    jax.block_until_ready(r)
    return (time.time()-t0)/reps

# fixed ray batch (camera rays, precomputed on host)
from raytracingproject_tpu.ops import camera as cam_ops
rng_hash = rngu.pixel_rng_hash(np.asarray(pidx).astype(np.uint32), np.uint32(0))
fu, fv = rngu.sobol_burley_2d(np.zeros(N,np.uint32), np.uint32(0), rng_hash)
ray = cam_ops.camera_sample_ray(kg["cam"], np.asarray(px,np.float32)+0.5, np.asarray(py,np.float32)+0.5,
                                jnp.asarray(fu), jnp.asarray(fv), jnp.zeros(N))
o = jax.device_put(ray["o"]); d = jax.device_put(ray["d"])
tmin = jnp.zeros(N); tmax = jnp.full(N, 1e30)

# stage 1: rng batch (4 pairs)
h = jnp.asarray(rng_hash)
def s_rng(h):
    dims = jnp.asarray([4,5,6,7], jnp.uint32)[:,None]
    u,v = rngu.path_rng_2d(h[None,:], jnp.zeros((1,N),jnp.uint32), dims, 0)
    return u.sum()+v.sum()
print("rng 4pairs:      %7.2f ms" % (timeit(jax.jit(s_rng), h)*1e3), flush=True)

# stage 2: intersect
f_is = jax.jit(lambda o,d: isect.intersect_brute(ds["tri_verts_world"], ds["prim_object_packed"], o, d, tmin, tmax))
hit = f_is(o,d)
print("intersect:       %7.2f ms" % (timeit(f_is, o, d)*1e3), flush=True)

# stage 3: shadow
f_sh = jax.jit(lambda o,d: isect.shadow_blocked_brute(ds["tri_verts_world"], ds["prim_object_packed"], o, d, tmin, tmax))
print("shadow:          %7.2f ms" % (timeit(f_sh, o, d)*1e3), flush=True)

# stage 4: shader_setup
f_ss = jax.jit(lambda hit,o,d: shade_ops.shader_setup(ds, hit, o, d, textures=kg["textures"]))
sd = f_ss(hit,o,d)
print("shader_setup:    %7.2f ms" % (timeit(f_ss, hit, o, d)*1e3), flush=True)

# stage 5: eval_shaders (6 shaders)
f_es = jax.jit(lambda hit,o,d: shade_ops.eval_shaders(kg["shaders"], shade_ops.shader_setup(ds, hit, o, d, textures=kg["textures"]), shade_ops.shader_setup(ds, hit, o, d).shader)["diffuse"].sum())
print("setup+eval_shaders: %7.2f ms" % (timeit(f_es, hit, o, d)*1e3), flush=True)

# stage 6: sample_light
f_sl = jax.jit(lambda P,u: light_ops.sample_light(ds, P, u, u, u)["pdf"].sum())
u0 = jnp.asarray(fu)
print("sample_light:    %7.2f ms" % (timeit(f_sl, sd.P, u0)*1e3), flush=True)

# stage 7: bsdf sample + eval
from raytracingproject_tpu.ops import closures as cl
def f_bs(hit, o, d, u):
    sd = shade_ops.shader_setup(ds, hit, o, d)
    c = shade_ops.eval_shaders(kg["shaders"], sd, sd.shader)
    bs = bsdf_ops.bsdf_sample(c, sd.N, sd.Ng, sd.I, u, u, u)
    f2, pdf2 = bsdf_ops.bsdf_eval(c, sd.N, sd.I, bs["omega"])
    return bs["pdf"].sum()+pdf2.sum()
print("setup+eval+bsdf: %7.2f ms" % (timeit(jax.jit(f_bs), hit, o, d, u0)*1e3), flush=True)

# full bounce body for reference: one path_trace_sample with max_bounce=0
kg0 = dict(kg); kg0["kint"] = dict(kg["kint"]); kg0["kint"]["max_bounce"] = np.int32(0)
f_b0 = jax.jit(lambda a,b,c: integ.path_trace_sample(kg0, a, b, c, 0)[0].sum())
print("full 1-bounce:   %7.2f ms" % (timeit(f_b0, px, py, pidx)*1e3), flush=True)
kg1 = dict(kg); kg1["kint"] = dict(kg["kint"]); kg1["kint"]["max_bounce"] = np.int32(4)
f_b4 = jax.jit(lambda a,b,c: integ.path_trace_sample(kg1, a, b, c, 0)[0].sum())
print("full 5-bounce:   %7.2f ms" % (timeit(f_b4, px, py, pidx)*1e3), flush=True)

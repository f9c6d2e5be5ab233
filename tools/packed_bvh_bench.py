import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from raytracingproject_tpu.app import examples
from raytracingproject_tpu.ops import intersect as isect
scene = examples.cornell_box(256, 256, 8, spheres="glossy")
scene.device_update(); kg = scene.make_kernel_globals()
ds = kg["dscene"]
n = 256*256
rng = np.random.default_rng(0)
o = jnp.asarray(np.tile([[278,-700,273]], (n,1)).astype(np.float32))
dn = rng.normal(size=(n,3)).astype(np.float32); dn[:,1] = np.abs(dn[:,1])
dn /= np.linalg.norm(dn,axis=-1,keepdims=True)
d = jnp.asarray(dn); tmin = jnp.zeros(n); tmax = jnp.full(n,1e30)
f_old = jax.jit(lambda o,d: isect.intersect_bvh(ds["bvh_bounds"], ds["bvh_children"],
    ds["tri_verts"], ds["prim_object_packed"], o, d, tmin, tmax)["t"])
f_new = jax.jit(lambda o,d: isect.intersect_bvh_packed(ds["bvh_nodes_packed"], ds["bvh_leaf_blocks"],
    o, d, tmin, tmax, prim_object=ds["prim_object_packed"])["t"])
r0 = f_old(o,d); r1 = f_new(o,d); jax.block_until_ready((r0,r1))
print("parity:", bool(jnp.allclose(r0, r1, rtol=1e-5)))
for name,f in [("baseline walk", f_old), ("packed walk", f_new)]:
    t0=time.time()
    for _ in range(3): r=f(o,d)
    jax.block_until_ready(r)
    print(f"{name}: {(time.time()-t0)/3*1e3:.0f} ms/pass at 65k rays, {ds['tri_verts'].shape[0]} tris", flush=True)

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from raytracingproject_tpu.app.examples import cornell_box
from raytracingproject_tpu.ops import integrator as integ
W=H=512; SPP=16
scene = cornell_box(W,H,spp=SPP)
scene.device_update(); kg = scene.make_kernel_globals()
yy,xx = np.mgrid[0:H,0:W]
px=jnp.asarray(xx.reshape(-1),jnp.int32); py=jnp.asarray(yy.reshape(-1),jnp.int32)
f = jax.jit(lambda a,b,c,s: integ.render_samples(kg,a,b,c,s,SPP))
t0=time.time(); L,A = f(px,py,py*W+px,jnp.uint32(0)); L.block_until_ready()
print("compile+first:", time.time()-t0)
t0=time.time()
for i in range(1,5): L,A = f(px,py,py*W+px,jnp.uint32(i*SPP))
L.block_until_ready()
dt=(time.time()-t0)/4
print(f"per-chunk {dt:.3f}s -> {W*H*SPP/dt/1e6:.1f} Msamples/s")
img=np.asarray(L).reshape(H,W,3)/SPP
print("mean", img.mean(), "finite", np.isfinite(img).all())

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
pidx=py*W+px
for name, fn in [("fixed", integ.render_samples), ("regen", integ.render_samples_regen)]:
    f = jax.jit(lambda a,b,c,s: fn(kg,a,b,c,s,SPP))
    L,A = f(px,py,pidx,jnp.uint32(0)); L.block_until_ready()
    t0=time.time()
    for i in range(1,5): L,A = f(px,py,pidx,jnp.uint32(i*SPP))
    L.block_until_ready()
    dt=(time.time()-t0)/4
    print(f"{name}: {dt:.3f}s/chunk -> {W*H*SPP/dt/1e6:.1f} Msamples/s  mean={float(np.asarray(L).mean())/SPP:.5f}", flush=True)

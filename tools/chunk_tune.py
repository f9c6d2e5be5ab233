import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from raytracingproject_tpu.app.examples import cornell_box
from raytracingproject_tpu.ops import integrator as integ
W=H=512
scene = cornell_box(W,H)
scene.device_update(); kg = scene.make_kernel_globals()
yy,xx = np.mgrid[0:H,0:W]
px=jnp.asarray(xx.reshape(-1),jnp.int32); py=jnp.asarray(yy.reshape(-1),jnp.int32)
pidx=py*W+px
for chunk in (16, 32, 64):
    f = jax.jit(lambda a,b,c,s: integ.render_samples_regen(kg,a,b,c,s,chunk))
    L,_ = f(px,py,pidx,jnp.uint32(0)); L.block_until_ready()
    t0=time.time()
    reps = max(64 // chunk, 1)
    for i in range(1, reps+1): L,_ = f(px,py,pidx,jnp.uint32(i*chunk))
    L.block_until_ready()
    dt=(time.time()-t0)/reps
    print(f"chunk {chunk}: {W*H*chunk/dt/1e6:.1f} Msamples/s", flush=True)

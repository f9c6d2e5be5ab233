import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from raytracingproject_tpu.app.examples import cornell_box
from raytracingproject_tpu.ops import integrator as integ
W=H=512; SPP=4
scene = cornell_box(W,H,spp=SPP)
scene.device_update(); kg0 = scene.make_kernel_globals()
yy,xx = np.mgrid[0:H,0:W]
px=jnp.asarray(xx.reshape(-1),jnp.int32); py=jnp.asarray(yy.reshape(-1),jnp.int32)
variants = [
    ("full", ()),
    ("-shadow", ("shadow",)),
    ("-nee(-shadow)", ("nee",)),
    ("-shade", ("shade",)),
    ("-shade-nee", ("shade","nee")),
    ("-all", ("shade","nee","shadow")),
]
for name, ab in variants:
    kg = dict(kg0); kg["debug_ablate"] = ab
    f = jax.jit(lambda a,b,c,s: integ.render_samples(kg,a,b,c,s,SPP))
    L,_ = f(px,py,py*W+px,jnp.uint32(0)); L.block_until_ready()
    t0=time.time()
    for i in range(1,4): L,_ = f(px,py,py*W+px,jnp.uint32(i*SPP))
    L.block_until_ready()
    dt=(time.time()-t0)/3
    print(f"{name:>14}: {dt*1e3/SPP:7.1f} ms/sample -> {W*H*SPP/dt/1e6:6.1f} Msps", flush=True)

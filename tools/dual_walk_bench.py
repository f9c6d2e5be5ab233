"""Raw kernel A/B: two single one-hot walks (closest + any) vs the
union dual walk on realistic bounce+shadow wavefronts, sweeping the
lane tile (VMEM pressure: the dual kernel holds TWO entry tables).

Usage: python tools/dual_walk_bench.py [n_lanes] [tile ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp
    from raytracingproject_tpu.app import examples
    from raytracingproject_tpu.ops import pallas_onehot as po
    from raytracingproject_tpu.ops import camera as cam_ops
    from raytracingproject_tpu.models import object as ob
    from raytracingproject_tpu.utils import rng as rngu
    import raytracingproject_tpu.utils.math as um

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    tiles = [int(a) for a in sys.argv[2:]] or [1024, 512]

    W = H = int(np.sqrt(n))
    scene = examples.cornell_box(W, H, spp=2, spheres="glossy")
    scene.device_update()
    kg = scene.make_kernel_globals()
    ds = kg["dscene"]
    tabs = (ds["oh_cbounds"], ds["oh_table_hi"], ds["oh_table_mid"],
            ds["oh_table_lo"])
    ct = int(kg.get("oh_cluster_tris", 0) or kg["cluster_tris"])
    print(f"lanes={n} C_pad={ds['oh_cbounds'].shape[0]} "
          f"W_pad={ds['oh_table_hi'].shape[0]} ct={ct}", flush=True)

    yy, xx = np.mgrid[0:H, 0:W]
    px = jnp.asarray(xx.reshape(-1), jnp.int32)
    py = jnp.asarray(yy.reshape(-1), jnp.int32)
    u = rngu.hash_pcg3d(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(0),
                        jnp.uint32(1))
    ray = cam_ops.camera_sample_ray(
        kg["cam"], px.astype(jnp.float32) + rngu.uint_to_float_01(u),
        py.astype(jnp.float32) + rngu.uint_to_float_01(u ^ 12345),
        jnp.zeros((n,)), jnp.zeros((n,)), jnp.zeros((n,)))
    tmin = jnp.full((n,), 1e-5, jnp.float32)
    tmax = jnp.full((n,), um.RAY_TMAX, jnp.float32)
    vis_c = jnp.full((n,), ob.PATH_RAY_CAMERA, jnp.uint32)
    vis_s = jnp.full((n,), ob.PATH_RAY_SHADOW, jnp.uint32)

    def timeit(fn, *args, iters=5):
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        best = float("inf")
        for _ in range(iters):
            t0 = time.time()
            out = fn(*args)
            jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
            best = min(best, time.time() - t0)
        return best

    # bounce-like closest rays: camera hits + random hemisphere dirs
    hit = po.intersect_clusters_onehot(*tabs, ct, ray["o"], ray["d"],
                                       tmin, tmax, vis_c)
    P = ray["o"] + ray["d"] * hit["t"][:, None]
    nrm = um.safe_normalize(jnp.stack(
        [rngu.uint_to_float_01(u ^ 7) - 0.5,
         rngu.uint_to_float_01(u ^ 77) - 0.5,
         rngu.uint_to_float_01(u ^ 777) - 0.5], -1))
    d_c, _ = um.sample_cos_hemisphere(nrm, rngu.uint_to_float_01(u ^ 3),
                                      rngu.uint_to_float_01(u ^ 31))
    o_c = P - ray["d"] * 1e-3
    # shadow rays from the same origins toward the area light
    lco = np.asarray(ds["lamp_co"])
    tgt = jnp.asarray(lco[0] if len(lco) else np.zeros(3), jnp.float32)
    d_a = um.safe_normalize(tgt[None, :] - o_c)
    t_a = um.length(tgt[None, :] - o_c) * 0.999

    for tile in tiles:
        fc = jax.jit(lambda: po.intersect_clusters_onehot(
            *tabs, ct, o_c, d_c, tmin, tmax, vis_c, tile=tile))
        fa = jax.jit(lambda: po.intersect_clusters_onehot(
            *tabs, ct, o_c, d_a, tmin, t_a, vis_s,
            shadow_any_hit=True, tile=tile))
        fd = jax.jit(lambda: po.intersect_clusters_onehot_dual(
            *tabs, ct, o_c, d_c, tmin, tmax, vis_c,
            o_c, d_a, tmin, t_a, vis_s, tile=tile))
        try:
            tc = timeit(fc)
            ta = timeit(fa)
            td = timeit(fd)
        except Exception as e:
            print(f"tile={tile}: FAILED {type(e).__name__}: {e}",
                  flush=True)
            continue
        print(f"tile={tile}: closest={tc*1e3:7.2f}ms any={ta*1e3:7.2f}ms "
              f"sum={1e3*(tc+ta):7.2f}ms dual={td*1e3:7.2f}ms "
              f"ratio={(tc+ta)/td:5.2f}x", flush=True)


if __name__ == "__main__":
    main()

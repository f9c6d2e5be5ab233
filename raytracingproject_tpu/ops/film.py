"""Film accumulation + display conversion (ref: kernel/kernel_film.h,
kernel/kernel_passes.h, render/buffers.cpp).

The accumulation buffer is pass-interleaved float32 (H, W, stride) like
the reference's RenderBuffers; because a wavefront maps 1:1 onto the
pixel grid per sample, accumulation is a dense add — no scatters. The
display conversion applies exposure and 1/num_samples scaling
(ref: film_get_pass_result) and converts to sRGB bytes elsewhere
(utils/image_io.py).
"""

from __future__ import annotations
from raytracingproject_tpu.utils import precision as prec

import jax.numpy as jnp


def filter_table_lookup(filter_table, u):
    """Importance-sample the pixel filter: u in [0,1) -> subpixel offset
    (ref: kernel_random.h path_rng via filter_table inverted CDF).

    Fetches both lerp endpoints with ONE wide-row lookup (ops/lookup.py)
    instead of two dynamic gathers."""
    from raytracingproject_tpu.ops import lookup as lk
    n = filter_table.shape[0]
    x = u * (n - 1)
    i = jnp.clip(x.astype(jnp.int32), 0, n - 2)
    f = x - i.astype(prec.FT)
    pair_table = jnp.stack([filter_table[:-1], filter_table[1:]], -1)
    pair = lk.lookup_rows(pair_table, i)
    return pair[..., 0] * (1.0 - f) + pair[..., 1] * f


def accumulate_sample(buffer, radiance, alpha, pass_stride):
    """Add one sample's radiance (N, 3) + alpha (N,) into the combined
    pass of a flat (N, stride) buffer."""
    combined = buffer[:, 0:4]
    combined = combined + jnp.concatenate([radiance, alpha[:, None]], -1)
    return buffer.at[:, 0:4].set(combined)


def scale_for_display(combined, num_samples, exposure=1.0):
    """(..., 4) accumulated -> displayable linear RGBA."""
    scale = exposure / jnp.maximum(num_samples, 1)
    rgb = combined[..., :3] * scale
    a = jnp.clip(combined[..., 3] * (1.0 / jnp.maximum(num_samples, 1)),
                 0.0, 1.0)
    return jnp.concatenate([rgb, a[..., None]], -1)

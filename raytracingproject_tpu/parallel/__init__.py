"""Multi-chip parallelism (ref: device/device_multi.cpp MultiDevice,
device/device_network.cpp NetworkDevice — replaced by jax.sharding).
"""

from raytracingproject_tpu.parallel.mesh import (  # noqa: F401
    make_device_mesh, render_frame_sharded)

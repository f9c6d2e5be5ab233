"""Background settings node (ref: render/background.h, render/background.cpp).

The background *shader* lives in the shader list (slot bound here); this
node owns visibility/AO/transparency settings.
"""

from __future__ import annotations

from raytracingproject_tpu.models.node import Node, SocketType as S
from raytracingproject_tpu.models.object import PATH_RAY_ALL_VISIBILITY


class Background(Node):
    NODE_NAME = "background"
    SOCKETS = [
        S("ao_factor", S.FLOAT, 0.0),
        S("ao_distance", S.FLOAT, 1e10),
        S("use_shader", S.BOOLEAN, True),
        S("use_ao", S.BOOLEAN, False),
        S("visibility", S.UINT, PATH_RAY_ALL_VISIBILITY),
        S("transparent", S.BOOLEAN, False),
        S("transparent_glass", S.BOOLEAN, False),
        S("transparent_roughness_threshold", S.FLOAT, 0.0),
        S("volume_step_size", S.FLOAT, 0.1),
    ]

    def __init__(self, name="background", shader=None, **kwargs):
        super().__init__(name, **kwargs)
        self.shader = shader  # Shader node evaluated for missed rays

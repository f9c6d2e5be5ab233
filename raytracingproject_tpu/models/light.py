"""Light node (ref: render/light.h, render/light.cpp).

Light types: point, distant, background, area (rect/ellipse), spot —
matching LightType (ref: kernel/kernel_types.h:1514). The LightManager
equivalent (models/scene.py) builds the flat emission-distribution CDF
over lamps + emissive triangles (ref: light.cpp:277
device_update_distribution) consumed by ops/light.py NEE sampling.
"""

from __future__ import annotations

import numpy as np

from raytracingproject_tpu.models.node import Node, SocketType as S

LIGHT_POINT = 0
LIGHT_DISTANT = 1
LIGHT_BACKGROUND = 2
LIGHT_AREA = 3
LIGHT_SPOT = 4


class Light(Node):
    NODE_NAME = "light"
    SOCKETS = [
        S("light_type", S.ENUM, "point",
          {"point": LIGHT_POINT, "distant": LIGHT_DISTANT,
           "background": LIGHT_BACKGROUND, "area": LIGHT_AREA,
           "spot": LIGHT_SPOT}),
        S("strength", S.COLOR, (1.0, 1.0, 1.0)),
        S("co", S.POINT, (0.0, 0.0, 0.0)),
        # point/spot
        S("size", S.FLOAT, 0.0),
        # distant
        S("dir", S.VECTOR, (0.0, 0.0, -1.0)),
        S("angle", S.FLOAT, 0.0),
        # area
        S("axisu", S.VECTOR, (1.0, 0.0, 0.0)),
        S("sizeu", S.FLOAT, 1.0),
        S("axisv", S.VECTOR, (0.0, 1.0, 0.0)),
        S("sizev", S.FLOAT, 1.0),
        S("round", S.BOOLEAN, False),
        S("spread", S.FLOAT, np.pi),
        # spot
        S("spot_angle", S.FLOAT, np.pi / 4.0),
        S("spot_smooth", S.FLOAT, 0.0),
        # portal: guides background sampling, emits nothing
        # (ref: light.h is_portal)
        S("is_portal", S.BOOLEAN, False),
        # IES photometric profile (raw LM-63 text; empty = none)
        S("ies", S.STRING, ""),
        # common
        S("cast_shadow", S.BOOLEAN, True),
        S("use_mis", S.BOOLEAN, True),
        S("use_camera", S.BOOLEAN, True),
        S("use_diffuse", S.BOOLEAN, True),
        S("use_glossy", S.BOOLEAN, True),
        S("use_transmission", S.BOOLEAN, True),
        S("use_scatter", S.BOOLEAN, True),
        S("max_bounces", S.INT, 1024),
        S("map_resolution", S.INT, 0),  # background importance map
        S("samples", S.INT, 1),          # branched-path per-light samples
    ]

    def __init__(self, name="light", shader=None, **kwargs):
        super().__init__(name, **kwargs)
        self.shader = shader  # optional emission Shader; else `strength`

    def total_power(self):
        """Approximate emitted power for the light-picking CDF
        (ref: light.cpp:309-360 use_light_visibility weighting)."""
        strength = np.asarray(self.strength, np.float32)
        lum = float(0.2126 * strength[0] + 0.7152 * strength[1]
                    + 0.0722 * strength[2])
        t = self.get_enum_int("light_type")
        if t == LIGHT_AREA:
            area = float(self.sizeu * self.sizev) * float(
                np.linalg.norm(np.cross(self.axisu, self.axisv)))
            return max(lum * area, 1e-12)
        if t == LIGHT_POINT or t == LIGHT_SPOT:
            return max(lum * 4.0 * np.pi, 1e-12)
        if t == LIGHT_DISTANT:
            return max(lum, 1e-12)
        if t == LIGHT_BACKGROUND:
            return max(lum, 1e-12)
        return max(lum, 1e-12)

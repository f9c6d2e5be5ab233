"""Object instances (ref: render/object.h, render/object.cpp).

An Object binds a Geometry + transform + per-object properties. The
ObjectManager equivalent lives in models/scene.py: it packs transforms
(+ inverses, + motion decompositions) into device arrays and computes
object flags/visibility, mirroring ObjectManager::device_update
(ref: render/object.cpp:631).
"""

from __future__ import annotations

import numpy as np

from raytracingproject_tpu.models.node import Node, SocketType as S
from raytracingproject_tpu.utils import transform as tfm

# Path-visibility ray types (ref: kernel/kernel_types.h PATH_RAY_*)
PATH_RAY_CAMERA = 1 << 0
PATH_RAY_REFLECT = 1 << 1
PATH_RAY_TRANSMIT = 1 << 2
PATH_RAY_DIFFUSE = 1 << 3
PATH_RAY_GLOSSY = 1 << 4
PATH_RAY_SINGULAR = 1 << 5
PATH_RAY_TRANSPARENT = 1 << 6
PATH_RAY_SHADOW = 1 << 7
PATH_RAY_VOLUME_SCATTER = 1 << 8
PATH_RAY_ALL_VISIBILITY = (1 << 9) - 1

# Object flags (ref: kernel_types.h SD_OBJECT_*)
OBJECT_FLAG_HOLDOUT = 1 << 0
OBJECT_FLAG_MOTION = 1 << 1
OBJECT_FLAG_SHADOW_CATCHER = 1 << 2
OBJECT_FLAG_NEGATIVE_SCALE = 1 << 3


class Object(Node):
    NODE_NAME = "object"
    SOCKETS = [
        S("transform", S.TRANSFORM, tfm.identity()),
        S("visibility", S.UINT, PATH_RAY_ALL_VISIBILITY),
        S("is_shadow_catcher", S.BOOLEAN, False),
        S("use_holdout", S.BOOLEAN, False),
        S("hide_on_missing_motion", S.BOOLEAN, False),
        S("pass_id", S.INT, 0),
        S("random_id", S.UINT, 0),
        S("color", S.COLOR, (0.0, 0.0, 0.0)),
        S("asset_name", S.STRING, ""),
        S("use_motion", S.BOOLEAN, False),
        S("motion_start", S.TRANSFORM, tfm.identity()),
        S("motion_end", S.TRANSFORM, tfm.identity()),
    ]

    def __init__(self, name="", geometry=None, **kwargs):
        super().__init__(name, **kwargs)
        self.geometry = geometry
        self.particle_system = None
        self.particle_index = 0
        self._motion_steps = None  # full step list (set_motion)

    def set_motion(self, tfms):
        """Multi-step object motion (ref: Object::motion array,
        render/object.h): a list of 3x4 transforms at uniform shutter
        times, any length >= 2. Two entries = the classic start/end
        pair; more capture curved (e.g. spinning) paths the endpoint
        lerp misses."""
        import numpy as np
        tfms = [np.asarray(t, np.float32) for t in tfms]
        assert len(tfms) >= 2
        self.set("use_motion", True)
        self.set("motion_start", tfms[0])
        self.set("motion_end", tfms[-1])
        self._motion_steps = tfms  # after set(): set() invalidates

    def set(self, name, value):
        # direct endpoint edits invalidate a cached multi-step path so
        # the two APIs can't disagree silently
        if name in ("motion_start", "motion_end") \
                and getattr(self, "_motion_steps", None) is not None:
            self._motion_steps = None
        super().set(name, value)

    def motion_transforms(self):
        """The object's transform path over the shutter."""
        import numpy as np
        if self._motion_steps is not None:
            return self._motion_steps
        return [np.asarray(self.motion_start, np.float32),
                np.asarray(self.motion_end, np.float32)]

    def compute_bounds(self):
        lo, hi = self.geometry.compute_bounds()
        corners = np.array([[x, y, z] for x in (lo[0], hi[0])
                            for y in (lo[1], hi[1]) for z in (lo[2], hi[2])],
                           np.float32)
        wc = tfm.transform_point(np.asarray(self.transform, np.float32),
                                 corners)
        return wc.min(0), wc.max(0)

    def flags(self):
        f = 0
        if self.use_holdout:
            f |= OBJECT_FLAG_HOLDOUT
        if self.is_shadow_catcher:
            f |= OBJECT_FLAG_SHADOW_CATCHER
        if self.use_motion:
            f |= OBJECT_FLAG_MOTION
        if np.linalg.det(np.asarray(self.transform)[:3, :3]) < 0.0:
            f |= OBJECT_FLAG_NEGATIVE_SCALE
        return f

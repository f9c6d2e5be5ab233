"""Camera node (ref: render/camera.h, render/camera.cpp).

Supports perspective (with depth-of-field aperture + bokeh blades),
orthographic and panorama (equirectangular / fisheye) models plus camera
motion blur and rolling shutter, matching the reference's capability set
(ref: render/camera.h:58-117, kernel/kernel_camera.h).

`update()` precomputes the raster->camera and camera->world chains
host-side exactly like Camera::update (ref: render/camera.cpp:150-260);
the flattened record is consumed by ops/camera.py ray generation.
"""

from __future__ import annotations

import numpy as np

from raytracingproject_tpu.models.node import Node, SocketType as S
from raytracingproject_tpu.utils import transform as tfm

# camera type enum (ref: kernel/kernel_types.h CameraType)
CAMERA_PERSPECTIVE = 0
CAMERA_ORTHOGRAPHIC = 1
CAMERA_PANORAMA = 2

PANORAMA_EQUIRECTANGULAR = 0
PANORAMA_FISHEYE_EQUIDISTANT = 1
PANORAMA_FISHEYE_EQUISOLID = 2
PANORAMA_MIRRORBALL = 3

MOTION_POSITION_START = 0
MOTION_POSITION_CENTER = 1
MOTION_POSITION_END = 2

ROLLING_SHUTTER_NONE = 0
ROLLING_SHUTTER_TOP = 1


class Camera(Node):
    NODE_NAME = "camera"
    SOCKETS = [
        S("type", S.ENUM, "perspective",
          {"perspective": CAMERA_PERSPECTIVE,
           "orthographic": CAMERA_ORTHOGRAPHIC,
           "panorama": CAMERA_PANORAMA}),
        S("panorama_type", S.ENUM, "equirectangular",
          {"equirectangular": PANORAMA_EQUIRECTANGULAR,
           "fisheye_equidistant": PANORAMA_FISHEYE_EQUIDISTANT,
           "fisheye_equisolid": PANORAMA_FISHEYE_EQUISOLID,
           "mirrorball": PANORAMA_MIRRORBALL}),
        S("matrix", S.TRANSFORM, tfm.identity()),
        S("fov", S.FLOAT, 0.7853981852531433),  # 45 deg
        S("fov_pre", S.FLOAT, 0.7853981852531433),
        S("fov_post", S.FLOAT, 0.7853981852531433),
        # depth of field (ref: camera.h:72-77)
        S("aperturesize", S.FLOAT, 0.0),
        S("focaldistance", S.FLOAT, 10.0),
        S("blades", S.UINT, 0),
        S("bladesrotation", S.FLOAT, 0.0),
        S("aperture_ratio", S.FLOAT, 1.0),
        # panorama lens
        S("fisheye_fov", S.FLOAT, 3.14159265),
        S("fisheye_lens", S.FLOAT, 10.5),
        S("latitude_min", S.FLOAT, -1.5707963),
        S("latitude_max", S.FLOAT, 1.5707963),
        S("longitude_min", S.FLOAT, -3.14159265),
        S("longitude_max", S.FLOAT, 3.14159265),
        # sensor
        S("sensorwidth", S.FLOAT, 0.036),
        S("sensorheight", S.FLOAT, 0.024),
        # clipping
        S("nearclip", S.FLOAT, 1e-5),
        S("farclip", S.FLOAT, 1e5),
        # screen window (border render / lens shift)
        S("viewplane_left", S.FLOAT, 0.0),
        S("viewplane_right", S.FLOAT, 0.0),
        S("viewplane_bottom", S.FLOAT, 0.0),
        S("viewplane_top", S.FLOAT, 0.0),
        # motion blur (ref: camera.h:58-66)
        S("shuttertime", S.FLOAT, 1.0),
        S("motion_position", S.ENUM, "center",
          {"start": MOTION_POSITION_START, "center": MOTION_POSITION_CENTER,
           "end": MOTION_POSITION_END}),
        S("rolling_shutter_type", S.ENUM, "none",
          {"none": ROLLING_SHUTTER_NONE, "top": ROLLING_SHUTTER_TOP}),
        S("rolling_shutter_duration", S.FLOAT, 0.1),
        S("use_motion", S.BOOLEAN, False),
        S("motion_start", S.TRANSFORM, tfm.identity()),
        S("motion_end", S.TRANSFORM, tfm.identity()),
        # resolution (set by session from BufferParams)
        S("width", S.INT, 1024),
        S("height", S.INT, 512),
    ]

    def __init__(self, name="camera", **kwargs):
        super().__init__(name, **kwargs)
        self.kernel_record = None
        self._motion_steps = None  # full step list (set_motion)

    def set_motion(self, tfms):
        """Multi-step camera motion (ref: Camera::motion array): a list
        of 3x4 camera->world transforms at uniform shutter times."""
        tfms = [np.asarray(t, np.float32) for t in tfms]
        assert len(tfms) >= 2
        self.set("use_motion", True)
        self.set("motion_start", tfms[0])
        self.set("motion_end", tfms[-1])
        self._motion_steps = tfms  # after set(): set() invalidates

    def set(self, name, value):
        if name in ("motion_start", "motion_end") \
                and getattr(self, "_motion_steps", None) is not None:
            self._motion_steps = None
        super().set(name, value)

    def motion_transforms(self):
        if self._motion_steps is not None:
            return self._motion_steps
        return [np.asarray(self.motion_start, np.float32),
                np.asarray(self.motion_end, np.float32)]

    def compute_auto_viewplane(self):
        """Aspect-correct screen window (ref: camera.cpp:107-120)."""
        w, h = float(self.width), float(self.height)
        if self.get_enum_int("type") == CAMERA_PANORAMA:
            return -1.0, 1.0, -1.0, 1.0
        aspect = w / h
        if w >= h:
            return -aspect, aspect, -1.0, 1.0
        return -1.0, 1.0, -1.0 / aspect, 1.0 / aspect

    def update(self):
        """Precompute raster->camera / camera->world matrices.

        Mirrors the reference update chain (render/camera.cpp:150-260):
        ndc -> raster, screen window -> ndc, perspective/ortho projection,
        then inverses composed into rastertocamera.
        """
        w, h = float(self.width), float(self.height)
        ctype = self.get_enum_int("type")

        left, right, bottom, top = (self.viewplane_left, self.viewplane_right,
                                    self.viewplane_bottom, self.viewplane_top)
        if left == right or bottom == top:
            left, right, bottom, top = self.compute_auto_viewplane()

        # screen -> ndc -> raster
        screen_to_ndc = np.array([
            [1.0 / (right - left), 0, 0, -left / (right - left)],
            [0, 1.0 / (top - bottom), 0, -bottom / (top - bottom)],
            [0, 0, 1, 0]], np.float32)
        ndc_to_raster = np.array([
            [w, 0, 0, 0],
            [0, h, 0, 0],
            [0, 0, 1, 0]], np.float32)
        screen_to_raster = tfm.compose(ndc_to_raster, screen_to_ndc)
        raster_to_screen = tfm.inverse(screen_to_raster)

        if ctype == CAMERA_PERSPECTIVE:
            # perspective projection leaves x,y in screen plane at z=1
            # after division; we instead build camera-space ray dirs in
            # ops/camera.py, so rastertocamera maps raster->screen plane.
            zoom = 1.0 / np.tan(0.5 * self.fov)
            screen_scale = np.array([
                [1.0 / zoom, 0, 0, 0],
                [0, 1.0 / zoom, 0, 0],
                [0, 0, 1, 0]], np.float32)
            raster_to_camera = tfm.compose(screen_scale, raster_to_screen)
        elif ctype == CAMERA_ORTHOGRAPHIC:
            raster_to_camera = raster_to_screen
        else:  # panorama: raster -> [0,1]^2 lens coords
            raster_to_camera = np.array([
                [1.0 / w, 0, 0, 0],
                [0, 1.0 / h, 0, 0],
                [0, 0, 1, 0]], np.float32)

        cam_to_world = np.asarray(self.matrix, np.float32)

        rec = {
            "type": np.int32(ctype),
            "panorama_type": np.int32(self.get_enum_int("panorama_type")),
            "raster_to_camera": raster_to_camera,
            "cam_to_world": cam_to_world,
            "nearclip": np.float32(self.nearclip),
            "cliplength": np.float32(
                self.farclip - self.nearclip if self.farclip < 1e9 else -1.0),
            "aperturesize": np.float32(self.aperturesize),
            "focaldistance": np.float32(
                self.focaldistance if self.focaldistance > 1e-5 else 1e-5),
            "blades": np.int32(self.blades),
            "bladesrotation": np.float32(self.bladesrotation),
            "aperture_ratio": np.float32(self.aperture_ratio),
            "fisheye_fov": np.float32(self.fisheye_fov),
            "fisheye_lens": np.float32(self.fisheye_lens),
            "eq_bounds": np.array([self.longitude_min, self.longitude_max,
                                   self.latitude_min, self.latitude_max],
                                  np.float32),
            "shuttertime": np.float32(self.shuttertime),
            "rolling_shutter_type": np.int32(self.get_enum_int("rolling_shutter_type")),
            "rolling_shutter_duration": np.float32(self.rolling_shutter_duration),
            "use_motion": np.int32(1 if self.use_motion else 0),
            "motion_start": tfm.decompose(self.motion_start if self.use_motion
                                          else cam_to_world),
            "motion_end": tfm.decompose(self.motion_end if self.use_motion
                                        else cam_to_world),
            # multi-step camera path (ref: Camera::motion array):
            # S decomposed steps, piecewise-slerped at the lane's
            # shutter time (ops/camera.py)
            "motion_steps": np.int32(len(self.motion_transforms())
                                     if self.use_motion else 2),
            "motion_decomps": np.concatenate(
                [tfm.decompose(t) for t in self.motion_transforms()]
                if self.use_motion
                else [tfm.decompose(cam_to_world)] * 2),
            "width": np.int32(self.width),
            "height": np.int32(self.height),
        }
        self.kernel_record = rec
        self.clear_modified()
        return rec

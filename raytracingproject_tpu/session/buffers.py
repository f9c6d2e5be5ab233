"""Render buffers (ref: render/buffers.h BufferParams/RenderBuffers/
DisplayBuffer).

Host-side accumulation is a pass-interleaved float32 (H, W, stride)
NumPy array; device wavefront results are added per sample chunk. Pass
extraction mirrors RenderBuffers::get_pass_rect scaling semantics
(exposure x 1/sample for radiance passes, raw for data passes).
"""

from __future__ import annotations

import numpy as np

from raytracingproject_tpu.models import film as film_mod


class BufferParams:
    """ref: render/buffers.h:40."""

    def __init__(self, width, height, full_x=0, full_y=0,
                 full_width=None, full_height=None, passes=None):
        self.width = width
        self.height = height
        self.full_x = full_x
        self.full_y = full_y
        self.full_width = full_width or width
        self.full_height = full_height or height
        self.passes = passes or [film_mod.Pass(film_mod.PASS_COMBINED)]

    @property
    def pass_stride(self):
        return sum(p.channels for p in self.passes)

    def pass_offset(self, ptype):
        off = 0
        for p in self.passes:
            if p.type == ptype:
                return off
            off += p.channels
        return -1

    def pass_offset_name(self, name):
        """Offset of a pass by its (possibly custom/AOV) name."""
        off = 0
        for p in self.passes:
            if p.name == name:
                return off, p.channels
            off += p.channels
        return -1, 0

    def modified(self, other):
        return (self.width, self.height, self.full_x, self.full_y,
                [p.type for p in self.passes]) != \
            (other.width, other.height, other.full_x, other.full_y,
             [p.type for p in other.passes])


class RenderBuffers:
    def __init__(self, params: BufferParams):
        self.params = params
        self.buffer = np.zeros(
            (params.height, params.width, params.pass_stride), np.float32)
        self.num_samples = 0
        # adaptive sampling: per-pixel sample counts override the
        # uniform 1/num_samples display scaling (ref: PASS_SAMPLE_COUNT
        # + kernel_adaptive_post_adjust)
        self.per_pixel_samples = None

    def zero(self):
        self.buffer[:] = 0.0
        self.num_samples = 0

    def add_samples(self, radiance, alpha, num_samples):
        """radiance (H, W, 3), alpha (H, W): accumulated sums for
        `num_samples` new samples."""
        off = self.params.pass_offset(film_mod.PASS_COMBINED)
        self.buffer[..., off:off + 3] += radiance
        self.buffer[..., off + 3] += alpha
        self.num_samples += num_samples

    def add_pass(self, ptype, data):
        off = self.params.pass_offset(ptype)
        if off < 0:
            return
        c = film_mod.PASS_CHANNELS[ptype]
        self.buffer[..., off:off + c] += data

    def get_pass_rect(self, ptype, exposure=1.0):
        """Scaled pass pixels (ref: buffers.cpp get_pass_rect)."""
        off = self.params.pass_offset(ptype)
        if off < 0:
            return None
        c = film_mod.PASS_CHANNELS[ptype]
        data = self.buffer[..., off:off + c]
        if self.per_pixel_samples is not None:
            inv = (1.0 / np.maximum(self.per_pixel_samples, 1))[..., None]
        else:
            inv = 1.0 / max(self.num_samples, 1)
        if ptype == film_mod.PASS_COMBINED:
            rgb = data[..., :3] * (inv * exposure)
            a = np.clip(data[..., 3:4] * inv, 0.0, 1.0)
            return np.concatenate([rgb, a], -1)
        if ptype == film_mod.PASS_SAMPLE_COUNT:
            return data  # absolute counts
        if ptype in (film_mod.PASS_DEPTH, film_mod.PASS_OBJECT_ID,
                     film_mod.PASS_MATERIAL_ID, film_mod.PASS_NORMAL,
                     film_mod.PASS_UV, film_mod.PASS_DENOISING_NORMAL,
                     film_mod.PASS_DENOISING_ALBEDO,
                     film_mod.PASS_DIFFUSE_COLOR,
                     film_mod.PASS_GLOSSY_COLOR,
                     film_mod.PASS_TRANSMISSION_COLOR):
            return data * inv  # data passes: mean, no exposure
        return data * (inv * exposure)

    def get_pass_rect_name(self, name):
        """Pass pixels by custom pass name (AOVs); mean over samples."""
        off, c = self.params.pass_offset_name(name)
        if off < 0:
            return None
        data = self.buffer[..., off:off + c]
        if self.per_pixel_samples is not None:
            inv = (1.0 / np.maximum(self.per_pixel_samples, 1))[..., None]
        else:
            inv = 1.0 / max(self.num_samples, 1)
        return data * inv

    def get_display_rgba(self, exposure=1.0):
        comb = self.get_pass_rect(film_mod.PASS_COMBINED, exposure)
        return comb

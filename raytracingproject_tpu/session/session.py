"""Render session (ref: render/session.cpp Session).

Drives the render: scene sync -> sample-chunk loop -> buffer write-back,
with progress/cancel, resumable sample ranges (ref: resumable chunks,
blender_python.cpp:871-947), optional multi-device mesh, and progressive
callbacks for viewport-style consumers. The control loop runs
synchronously or in a background thread (`start()`/`wait()`), mirroring
Session::start (session.cpp:138).
"""

from __future__ import annotations

import threading

import numpy as np

from raytracingproject_tpu.models import film as film_mod
from raytracingproject_tpu.session.buffers import BufferParams, RenderBuffers
from raytracingproject_tpu.session.tiles import TileManager
from raytracingproject_tpu.utils.progress import Progress, CancelledError
from raytracingproject_tpu.utils import log


class SessionParams:
    """ref: render/session.h:44 SessionParams."""

    def __init__(self, samples=128, tile_size=0, progressive=True,
                 progressive_refine_chunk=16, use_mesh=False,
                 shard_mode="pixel", time_limit=0.0,
                 range_start_sample=-1, range_num_samples=-1,
                 background=True):
        self.samples = samples
        self.tile_size = tile_size
        self.progressive = progressive
        self.progressive_refine_chunk = progressive_refine_chunk
        self.use_mesh = use_mesh          # shard over all local devices
        self.shard_mode = shard_mode
        self.time_limit = time_limit
        self.range_start_sample = range_start_sample
        self.range_num_samples = range_num_samples
        self.background = background

    def modified(self, other):
        return vars(self) != vars(other)


class Session:
    def __init__(self, scene, params=None):
        self.scene = scene
        self.params = params or SessionParams()
        self.progress = Progress()
        self.buffers = None
        self.tile_manager = None
        self.write_render_cb = None      # cb(rgba (H,W,4), sample)
        self.update_render_cb = None
        self._thread = None
        self._kg = None
        self._render_fns = {}

    # ------------------------------------------------------------------
    def reset(self, width=None, height=None, samples=None):
        cam = self.scene.camera
        if width:
            cam.set("width", width)
        if height:
            cam.set("height", height)
        if samples is not None:
            self.params.samples = samples
        w, h = int(cam.width), int(cam.height)
        bp = BufferParams(w, h, passes=self.scene.film.passes)
        self.buffers = RenderBuffers(bp)
        self.tile_manager = TileManager(
            w, h, tile_size=self.params.tile_size,
            progressive=self.params.progressive,
            num_samples=self.params.samples,
            range_start_sample=self.params.range_start_sample,
            range_num_samples=self.params.range_num_samples,
            progressive_chunk=self.params.progressive_refine_chunk)
        self.progress.reset()
        self.progress.total_pixel_samples = w * h * (
            self.tile_manager.end_sample - self.tile_manager.start_sample)
        self.progress.time_limit = self.params.time_limit

    # ------------------------------------------------------------------
    def start(self):
        """Spawn the render thread (ref: session.cpp:138-143)."""
        self._thread = threading.Thread(target=self._run_safe, daemon=True)
        self._thread.start()

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None

    def render(self):
        """Synchronous full render; returns display RGBA (H, W, 4)."""
        self._run()
        return self.buffers.get_display_rgba(
            exposure=float(self.scene.film.exposure))

    def _run_safe(self):
        try:
            self._run()
        except CancelledError:
            pass
        except Exception as e:  # ref: Progress error propagation
            log.log_error("render error: %s", e)
            self.progress.set_error(str(e))
            raise

    # ------------------------------------------------------------------
    def _update_scene(self):
        """ref: Session::update_scene -> Scene::device_update."""
        self.progress.set_status("Updating Scene")
        self.scene.device_update(self.progress)
        self._kg = self.scene.make_kernel_globals()
        self._render_fns = {}
        self.progress.set_render_start_time()

    def _get_render_fn(self, num_samples):
        import jax
        from raytracingproject_tpu.ops import integrator as integ
        key = num_samples
        if key not in self._render_fns:
            kg = self._kg

            def fn(px, py, pidx, start):
                return integ.render_samples(kg, px, py, pidx, start,
                                            num_samples)
            self._render_fns[key] = jax.jit(fn)
        return self._render_fns[key]

    def _run(self):
        import jax.numpy as jnp
        if self.buffers is None:
            self.reset()
        self._update_scene()

        # zero buffers only at range start (ref: session.cpp:1055-1058)
        if self.tile_manager.sample == self.tile_manager.start_sample:
            self.buffers.zero()

        use_mesh = self.params.use_mesh
        if use_mesh:
            from raytracingproject_tpu.parallel.mesh import (
                make_device_mesh, render_frame_sharded)
            mesh = make_device_mesh()

        while True:
            self.progress.check_cancel()
            ts = self.tile_manager.next()
            if ts is None:
                break
            self.progress.set_status(
                "Rendering", f"sample {ts.start_sample + ts.num_samples}"
                f"/{self.tile_manager.end_sample}")
            for tile in ts.tiles:
                self.progress.check_cancel()
                if use_mesh:
                    L, A = render_frame_sharded(
                        self._kg, tile.w, tile.h, ts.num_samples, mesh=mesh,
                        sample_start=ts.start_sample,
                        mode=self.params.shard_mode,
                        full_width=self.buffers.params.full_width)
                    L, A = np.asarray(L), np.asarray(A)
                else:
                    fn = self._get_render_fn(ts.num_samples)
                    yy, xx = np.mgrid[0:tile.h, 0:tile.w]
                    px = jnp.asarray((xx + tile.x).reshape(-1), jnp.int32)
                    py = jnp.asarray((yy + tile.y).reshape(-1), jnp.int32)
                    pidx = py * self.buffers.params.full_width + px
                    Lf, Af = fn(px, py, pidx, jnp.uint32(ts.start_sample))
                    L = np.asarray(Lf).reshape(tile.h, tile.w, 3)
                    A = np.asarray(Af).reshape(tile.h, tile.w)
                self.buffers.buffer[
                    tile.y:tile.y + tile.h, tile.x:tile.x + tile.w, 0:3] += L
                self.buffers.buffer[
                    tile.y:tile.y + tile.h, tile.x:tile.x + tile.w, 3] += A
                self.progress.add_samples(tile.w * tile.h * ts.num_samples,
                                          ts.start_sample + ts.num_samples)
            self.buffers.num_samples = ts.start_sample + ts.num_samples \
                - self.tile_manager.start_sample
            if self.update_render_cb is not None:
                self.update_render_cb(
                    self.buffers.get_display_rgba(
                        float(self.scene.film.exposure)),
                    self.buffers.num_samples)

        total, rt = self.progress.get_time()
        log.vlog(1, "render done: %.2fs total, %.2fs render", total, rt)
        if self.write_render_cb is not None:
            self.write_render_cb(
                self.buffers.get_display_rgba(float(self.scene.film.exposure)),
                self.buffers.num_samples)

    # ------------------------------------------------------------------
    def write_output(self, path, srgb=True):
        """Write the display image; multilayer passes go through
        utils/image_io.write_multilayer (resumable chunks use this,
        merged later by session/merge.py)."""
        from raytracingproject_tpu.utils import image_io
        rgba = self.buffers.get_display_rgba(float(self.scene.film.exposure))
        # raster y=0 is the bottom row; image files are top-down
        img = rgba[::-1]
        if str(path).endswith((".npz", ".mlx")):
            layers = {"combined": self.buffers.buffer[::-1]}
            image_io.write_multilayer(path, layers, {
                "num_samples": self.buffers.num_samples,
                "pass_types": [p.type for p in self.buffers.params.passes],
                "range_start": self.tile_manager.start_sample,
            })
        else:
            image_io.write_png(path, img, srgb=srgb)
        return path

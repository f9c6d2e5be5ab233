"""Thread-safe progress/cancel/stats (ref: util/util_progress.h).

Keeps the reference's Progress contract: status strings, sample/tile
counters, cancel + error propagation, wall/render time split (render
time excludes scene sync, ref: blender_session.cpp:584-587).
"""

from __future__ import annotations

import threading
import time


class CancelledError(RuntimeError):
    pass


class Progress:
    def __init__(self):
        self._lock = threading.Lock()
        self.reset()

    def reset(self):
        with getattr(self, "_lock", threading.Lock()):
            self.status = ""
            self.substatus = ""
            self.cancel_requested = False
            self.cancel_message = ""
            self.error = False
            self.error_message = ""
            self.pixel_samples = 0
            self.total_pixel_samples = 0
            self.current_tile_sample = 0
            self.rendered_tiles = 0
            self.denoised_tiles = 0
            self.total_tiles = 0
            self.start_time = time.monotonic()
            self.render_start_time = self.start_time
            self.time_limit = 0.0
            self.sync_time = 0.0
            self.paused = False
            self.update_cb = None

    # --- pause (ref: util_progress.h set_pause / Session pause loop) ---
    def set_pause(self, pause=True):
        with self._lock:
            self.paused = bool(pause)

    def wait_if_paused(self, poll=0.02):
        """Block while paused; pause time is excluded from render time.
        Raises CancelledError if cancelled while paused."""
        if not getattr(self, "paused", False):
            return
        t0 = time.monotonic()
        prev = self.status
        self.set_status("Paused", self.substatus)
        while getattr(self, "paused", False):
            self.check_cancel()
            time.sleep(poll)
        self.add_skip_time(time.monotonic() - t0)
        self.set_status(prev, self.substatus)

    # --- cancel / error (ref: util_progress.h:52-118) ---
    def set_cancel(self, message="Cancelled"):
        with self._lock:
            self.cancel_requested = True
            self.cancel_message = message

    def get_cancel(self):
        if self.time_limit and (time.monotonic() - self.render_start_time
                                > self.time_limit):
            self.set_cancel("Time limit reached")
        return self.cancel_requested

    def check_cancel(self):
        if self.get_cancel():
            raise CancelledError(self.cancel_message)

    def set_error(self, message):
        with self._lock:
            self.error = True
            self.error_message = message
        self.set_cancel(message)

    # --- timing ---
    def set_render_start_time(self):
        with self._lock:
            self.render_start_time = time.monotonic()

    def add_skip_time(self, seconds):
        with self._lock:
            self.render_start_time += seconds

    def get_time(self):
        """(total_time, render_time) — render time excludes sync."""
        now = time.monotonic()
        return now - self.start_time, now - self.render_start_time

    # --- counters ---
    def add_samples(self, pixel_samples, tile_sample=None):
        with self._lock:
            self.pixel_samples += pixel_samples
            if tile_sample is not None:
                self.current_tile_sample = tile_sample
        self._notify()

    def add_finished_tile(self, denoised=False):
        with self._lock:
            if denoised:
                self.denoised_tiles += 1
            else:
                self.rendered_tiles += 1
        self._notify()

    def set_status(self, status, substatus=""):
        with self._lock:
            self.status = status
            self.substatus = substatus
        self._notify()

    def set_update_callback(self, cb):
        self.update_cb = cb

    def _notify(self):
        cb = self.update_cb
        if cb is not None:
            cb(self)

    def get_progress(self):
        with self._lock:
            if self.total_pixel_samples > 0:
                return min(self.pixel_samples / self.total_pixel_samples, 1.0)
        return 0.0

"""Logging (ref: util/util_logging.h — glog-style VLOG levels)."""

from __future__ import annotations

import logging
import os
import sys

_logger = logging.getLogger("raytracingproject_tpu")
_verbosity = int(os.environ.get("RTP_VERBOSITY", "0"))


def init_logging(verbosity=None):
    global _verbosity
    if verbosity is not None:
        _verbosity = verbosity
    if not _logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter("%(levelname).1s %(name)s: %(message)s"))
        _logger.addHandler(h)
    _logger.setLevel(logging.DEBUG if _verbosity > 0 else logging.INFO)


def vlog(level, msg, *args):
    """ref: VLOG(n) — only emitted when verbosity >= level."""
    if _verbosity >= level:
        _logger.info(msg, *args)


def log_info(msg, *args):
    _logger.info(msg, *args)


def log_warning(msg, *args):
    _logger.warning(msg, *args)


def log_error(msg, *args):
    _logger.error(msg, *args)

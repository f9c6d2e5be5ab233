"""Render session / orchestration (ref: intern/cycles/render/session.cpp)."""

from raytracingproject_tpu.session.session import Session, SessionParams  # noqa: F401
from raytracingproject_tpu.session.buffers import BufferParams, RenderBuffers  # noqa: F401
from raytracingproject_tpu.session.tiles import TileManager, Tile  # noqa: F401

"""BVH build + packing (ref: intern/cycles/bvh/)."""

from raytracingproject_tpu.bvh.build import build_bvh, BVHArrays, LEAF_SENTINEL  # noqa: F401

"""Particle systems (ref: render/particles.cpp ParticleSystemManager +
kernel/kernel_types.h:1551 KernelParticle, kernel_particle.h).

The reference packs one float4-quartet row per particle and shaders
read it through ParticleInfo via the hit object's particle binding.
Redesigned for the wide-row object table: each OBJECT carries its
bound particle's fields inline in its object_table row (objects bind
at most one particle — the reference's instanced-particle case), so
ParticleInfo costs zero extra lookups at shade time.
"""

from __future__ import annotations

import numpy as np

from raytracingproject_tpu.models.node import Node, SocketType as S


class ParticleSystem(Node):
    """A set of particles; objects reference (system, index).

    Array sockets are per-particle; scalars broadcast."""
    NODE_NAME = "particle_system"
    SOCKETS = [
        S("location", S.POINT_ARRAY, np.zeros((0, 3), np.float32)),
        S("velocity", S.POINT_ARRAY, np.zeros((0, 3), np.float32)),
        S("angular_velocity", S.POINT_ARRAY, np.zeros((0, 3), np.float32)),
        S("size", S.FLOAT_ARRAY, np.zeros((0,), np.float32)),
        S("age", S.FLOAT_ARRAY, np.zeros((0,), np.float32)),
        S("lifetime", S.FLOAT_ARRAY, np.zeros((0,), np.float32)),
    ]

    @property
    def num_particles(self):
        return len(np.asarray(self.location).reshape(-1, 3))

    def particle_row(self, index):
        """14 floats: [index, random, age, lifetime, size,
        location(3), velocity(3), angular_velocity(3)] — the
        ParticleInfo field set (ref: svm_particle_info.h outputs)."""
        np_ = self.num_particles

        def get(name, width):
            a = np.asarray(getattr(self, name), np.float32)
            a = a.reshape(-1, width) if width > 1 else a.reshape(-1)
            if len(a) == 0:
                return np.zeros((width,), np.float32) if width > 1 else 0.0
            i = min(int(index), len(a) - 1)
            return a[i]

        i = int(index)
        # stable per-particle random in [0,1) (ref: particle index
        # hashed like object_random)
        h = np.uint32(i * 2654435761 & 0xFFFFFFFF)
        rnd = float(h) / 4294967296.0
        row = np.zeros(14, np.float32)
        row[0] = float(i)
        row[1] = rnd
        row[2] = get("age", 1)
        row[3] = get("lifetime", 1)
        row[4] = get("size", 1)
        row[5:8] = get("location", 3)
        row[8:11] = get("velocity", 3)
        row[11:14] = get("angular_velocity", 3)
        return row

"""Scene graph: node reflection, scene nodes, shader graphs, flattening.

ref: intern/cycles/graph/ (reflection), intern/cycles/render/ (scene nodes).
"""

from raytracingproject_tpu.models.node import Node, NodeType, SocketType  # noqa: F401
from raytracingproject_tpu.models.scene import Scene, SceneParams  # noqa: F401
from raytracingproject_tpu.models.camera import Camera  # noqa: F401
from raytracingproject_tpu.models.mesh import Mesh  # noqa: F401
from raytracingproject_tpu.models.object import Object  # noqa: F401
from raytracingproject_tpu.models.light import Light  # noqa: F401
from raytracingproject_tpu.models.film import Film  # noqa: F401
from raytracingproject_tpu.models.integrator import Integrator  # noqa: F401
from raytracingproject_tpu.models.background import Background  # noqa: F401
from raytracingproject_tpu.models import shader_nodes  # noqa: F401
from raytracingproject_tpu.models.shader import Shader, ShaderGraph  # noqa: F401

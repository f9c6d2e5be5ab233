"""XML scene format (ref: app/cycles_xml.cpp:189-640 xml_read_*).

Same declarative surface as the reference:

  <camera width="800" height="500" type="perspective" fov="0.66"/>
  <transform translate="1 2 3" rotate="45 0 0 1" scale="2 2 2"
             matrix="...12 floats...">  ... scoped children ...
  <shader name="wall"> <diffuse_bsdf name="d" color="0.8 0.1 0.1"/>
      <connect from="d bsdf" to="output surface"/> </shader>
  <background> <background_shader name="bg" color="1 1 1"/>
      <connect from="bg background" to="output surface"/> </background>
  <state shader="wall" interpolation="smooth"> <mesh P="..." nverts="..."
      verts="..." UV="..."/> </state>
  <light light_type="area" co="0 0 5" strength="10 10 10" .../>
  <integrator max_bounce="4" aa_samples="128"/>
  <film exposure="1.0" filter_type="gaussian"/>
  <include src="other.xml"/>

Generic node-socket parsing goes through the Node reflection layer
(models/node.py), mirroring graph/node_xml.cpp.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np

from raytracingproject_tpu.models import (
    Scene, Light, Object, Shader, ShaderGraph)
from raytracingproject_tpu.models.mesh import Mesh
from raytracingproject_tpu.models.node import NodeType
from raytracingproject_tpu.models import shader_nodes as sn
from raytracingproject_tpu.utils import transform as tfm
from raytracingproject_tpu.utils import log

# shader-graph node tags -> classes: resolved LIVE through the
# reflection registry so user-defined nodes (docs/CUSTOM_NODES.md)
# registered after this import still parse; _SHADER_NODE_TAGS holds
# only the aliases that differ from NODE_NAME (matching the
# reference's XML tag names)
_SHADER_NODE_TAGS = {"background": sn.BackgroundNode}


def _shader_node_class(tag):
    cls = _SHADER_NODE_TAGS.get(tag)
    if cls is not None:
        return cls
    nt = NodeType.find(tag)
    if nt is not None and issubclass(nt.cls, sn.ShaderNode):
        return nt.cls
    return None


class XMLReadState:
    """Parse state carried down the element tree
    (ref: XMLReadState app/cycles_xml.cpp:48)."""

    def __init__(self, scene, base_path=""):
        self.scene = scene
        self.tfm = tfm.identity()
        self.shader = None
        self.smooth = False
        self.base_path = base_path

    def copy(self):
        s = XMLReadState(self.scene, self.base_path)
        s.tfm = self.tfm.copy()
        s.shader = self.shader
        s.smooth = self.smooth
        return s


def _parse_floats(s):
    return np.array(s.replace(",", " ").split(), np.float32)


def _parse_ints(s):
    return np.array(s.replace(",", " ").split(), np.int32)


def read_transform(elem, t):
    """ref: xml_read_transform (cycles_xml.cpp:339)."""
    out = t
    if "matrix" in elem.attrib:
        m = _parse_floats(elem.attrib["matrix"])
        if m.size == 16:
            m = m.reshape(4, 4)[:3]
        else:
            m = m.reshape(3, 4)
        out = tfm.compose(out, m)
    if "translate" in elem.attrib:
        out = tfm.compose(out, tfm.translate(*_parse_floats(
            elem.attrib["translate"])))
    if "rotate" in elem.attrib:
        vals = _parse_floats(elem.attrib["rotate"])
        angle = np.radians(vals[0])
        out = tfm.compose(out, tfm.rotate(angle, vals[1:4]))
    if "scale" in elem.attrib:
        s = _parse_floats(elem.attrib["scale"])
        if s.size == 1:
            s = np.repeat(s, 3)
        out = tfm.compose(out, tfm.scale(s))
    return out


def read_shader_graph(state, elem):
    """ref: xml_read_shader_graph (cycles_xml.cpp:404)."""
    graph = ShaderGraph()
    nodes_by_name = {"output": graph.output_node}
    for child in elem:
        tag = child.tag
        if tag == "connect":
            frm = child.attrib["from"].split()
            to = child.attrib["to"].split()
            fnode = nodes_by_name.get(frm[0])
            tnode = nodes_by_name.get(to[0])
            if fnode is None or tnode is None:
                log.log_warning("xml: unknown connect %s -> %s",
                                child.attrib["from"], child.attrib["to"])
                continue
            graph.connect(fnode, frm[1], tnode, to[1])
            continue
        cls = _shader_node_class(tag)
        if cls is None:
            log.log_warning("xml: unknown shader node <%s>", tag)
            continue
        name = child.attrib.get("name", tag)
        node = cls(name)
        attrs = {k: v for k, v in child.attrib.items() if k != "name"}
        if "src" in attrs and hasattr(node, "filename"):
            attrs["filename"] = os.path.join(state.base_path,
                                             attrs.pop("src"))
        node.load_xml_attributes(attrs)
        graph.add(node)
        nodes_by_name[name] = node
    return graph


def read_scene_element(state, elem):
    scene = state.scene
    tag = elem.tag
    if tag == "camera":
        scene.camera.load_xml_attributes(elem.attrib)
        scene.camera.set("matrix", state.tfm)
        if "width" in elem.attrib:
            scene.camera.set("width", elem.attrib["width"])
        if "height" in elem.attrib:
            scene.camera.set("height", elem.attrib["height"])
    elif tag == "shader":
        graph = read_shader_graph(state, elem)
        shader = Shader(elem.attrib.get("name", "shader"), graph)
        scene.add_shader(shader)
    elif tag == "background":
        graph = read_shader_graph(state, elem)
        shader = Shader("background", graph)
        scene.background.shader = shader
        scene.add_shader(shader)
        scene.background.load_xml_attributes(elem.attrib)
    elif tag == "mesh":
        read_mesh(state, elem)
    elif tag == "light":
        light = Light(elem.attrib.get("name", "light"))
        light.load_xml_attributes(elem.attrib)
        if state.shader is not None:
            light.shader = state.shader
        scene.add_light(light)
    elif tag == "integrator":
        scene.integrator.load_xml_attributes(elem.attrib)
    elif tag == "film":
        scene.film.load_xml_attributes(elem.attrib)
    elif tag == "transform":
        sub = state.copy()
        sub.tfm = read_transform(elem, state.tfm)
        for child in elem:
            read_scene_element(sub, child)
    elif tag == "state":
        sub = state.copy()
        if "shader" in elem.attrib:
            name = elem.attrib["shader"]
            match = [s for s in scene.shaders if s.name == name]
            if match:
                sub.shader = match[0]
            else:
                log.log_warning("xml: unknown shader state '%s'", name)
        if "interpolation" in elem.attrib:
            sub.smooth = elem.attrib["interpolation"] == "smooth"
        for child in elem:
            read_scene_element(sub, child)
    elif tag == "include":
        src = elem.attrib.get("src")
        if src:
            read_file(state.scene, os.path.join(state.base_path, src),
                      state)
    else:
        log.log_warning("xml: unknown element <%s>", tag)


def read_mesh(state, elem):
    """ref: xml_read_mesh (cycles_xml.cpp:449): P, nverts, verts, UV."""
    P = _parse_floats(elem.attrib["P"]).reshape(-1, 3)
    nverts = _parse_ints(elem.attrib["nverts"])
    verts = _parse_ints(elem.attrib["verts"])
    # triangulate polygons fan-style (ref: cycles_xml.cpp:500-520)
    tris = []
    uvs_c = []
    uv_attr = None
    if "UV" in elem.attrib:
        uv_attr = _parse_floats(elem.attrib["UV"]).reshape(-1, 2)
    offset = 0
    for n in nverts:
        poly = verts[offset:offset + n]
        for i in range(1, n - 1):
            tris.append([poly[0], poly[i], poly[i + 1]])
            if uv_attr is not None:
                uvs_c.append([uv_attr[offset], uv_attr[offset + i],
                              uv_attr[offset + i + 1]])
        offset += n
    mesh = Mesh(elem.attrib.get("name", "mesh"))
    mesh.set_mesh(P, np.array(tris, np.int32),
                  smooth=np.full(len(tris), state.smooth))
    if uvs_c:
        mesh.attribute_set("std_uv", "corner",
                           np.asarray(uvs_c, np.float32))
    if state.shader is not None:
        mesh.used_shaders = [state.shader]
    # apply scoped transform at object level
    obj = Object(mesh.name, mesh, transform=state.tfm)
    state.scene.add_object(obj)
    return mesh


def read_file(scene, path, parent_state=None):
    """ref: xml_read_file (cycles_xml.cpp:614)."""
    tree = ET.parse(path)
    root = tree.getroot()
    state = XMLReadState(scene, os.path.dirname(os.path.abspath(path)))
    if parent_state is not None:
        state.tfm = parent_state.tfm.copy()
        state.shader = parent_state.shader
        state.smooth = parent_state.smooth
    for elem in root:
        read_scene_element(state, elem)
    return scene


def read_scene(path):
    scene = Scene()
    read_file(scene, path)
    return scene

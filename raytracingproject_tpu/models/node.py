"""Typed-socket node reflection (ref: graph/node.h:34, graph/node_type.h).

Every scene entity (Camera, Mesh, Light, shader nodes, Integrator, ...)
declares typed sockets with defaults. The reflection layer provides:

- generic construction from keyword args / XML attributes,
- equality + modified-flag diffing for incremental device updates
  (ref: Node::modified, used by Scene managers to skip re-flattening),
- generic XML (de)serialization (ref: graph/node_xml.cpp),
- enum socket mapping (ref: NodeEnum).

Unlike the reference's C++ offset-based reflection, sockets here are
plain Python descriptors; values are numpy on host (device arrays only
appear after flattening).
"""

from __future__ import annotations

import numpy as np


class SocketType:
    BOOLEAN = "boolean"
    FLOAT = "float"
    INT = "int"
    UINT = "uint"
    COLOR = "color"
    VECTOR = "vector"
    POINT = "point"
    NORMAL = "normal"
    STRING = "string"
    ENUM = "enum"
    TRANSFORM = "transform"
    NODE = "node"
    # array types
    BOOLEAN_ARRAY = "boolean[]"
    FLOAT_ARRAY = "float[]"
    INT_ARRAY = "int[]"
    COLOR_ARRAY = "color[]"
    VECTOR_ARRAY = "vector[]"
    POINT_ARRAY = "point[]"
    NORMAL_ARRAY = "normal[]"
    STRING_ARRAY = "string[]"
    TRANSFORM_ARRAY = "transform[]"
    NODE_ARRAY = "node[]"

    FLOAT3_TYPES = (COLOR, VECTOR, POINT, NORMAL)

    def __init__(self, name, type, default=None, enum_values=None, ui_name=None):
        self.name = name
        self.type = type
        self.default = default
        self.enum_values = enum_values  # {name: int} for ENUM
        self.ui_name = ui_name or name

    def is_array(self):
        return self.type.endswith("[]")

    def coerce(self, value):
        """Parse/convert a python or XML-string value to the socket type."""
        t = self.type
        if t == SocketType.BOOLEAN:
            if isinstance(value, str):
                return value.strip().lower() in ("1", "true", "yes", "on")
            return bool(value)
        if t == SocketType.FLOAT:
            return float(_scalar(value))
        if t in (SocketType.INT, SocketType.UINT):
            return int(_scalar(value))
        if t in SocketType.FLOAT3_TYPES:
            return _float_array(value, 3)
        if t == SocketType.STRING:
            return str(value)
        if t == SocketType.ENUM:
            if isinstance(value, str):
                v = value.strip()
                if self.enum_values and v in self.enum_values:
                    return v
                raise ValueError(
                    f"unknown enum value '{v}' for socket {self.name}; "
                    f"expected one of {sorted(self.enum_values or [])}")
            return value
        if t == SocketType.TRANSFORM:
            a = np.asarray(value, np.float32)
            if a.shape == (4, 4):
                a = a[:3]
            assert a.shape == (3, 4), f"transform must be 3x4, got {a.shape}"
            return a
        if t == SocketType.NODE:
            return value
        if t == SocketType.FLOAT_ARRAY:
            return _float_array(value, None)
        if t in (SocketType.COLOR_ARRAY, SocketType.VECTOR_ARRAY,
                 SocketType.POINT_ARRAY, SocketType.NORMAL_ARRAY):
            return _float_array(value, None).reshape(-1, 3)
        if t == SocketType.INT_ARRAY:
            if isinstance(value, str):
                value = value.replace(",", " ").split()
            return np.asarray(value, np.int32).reshape(-1)
        if t == SocketType.BOOLEAN_ARRAY:
            return np.asarray(value, bool).reshape(-1)
        if t == SocketType.STRING_ARRAY:
            if isinstance(value, str):
                return value.split()
            return list(value)
        if t == SocketType.TRANSFORM_ARRAY:
            return [np.asarray(v, np.float32).reshape(3, 4) for v in value]
        if t == SocketType.NODE_ARRAY:
            return list(value)
        raise ValueError(f"unhandled socket type {t}")

    def enum_to_int(self, value):
        return self.enum_values[value]


def _scalar(value):
    if isinstance(value, str):
        return value.strip().split()[0]
    return value


def _float_array(value, n):
    if isinstance(value, str):
        value = value.replace(",", " ").split()
    a = np.asarray(value, np.float32).reshape(-1)
    if n is not None:
        if a.size == 1:
            a = np.repeat(a, n)
        assert a.size == n, f"expected {n} floats, got {a.size}"
    return a


class NodeType:
    """Registry of node types by name (ref: NodeType::types())."""

    types = {}

    def __init__(self, name, cls, sockets):
        self.name = name
        self.cls = cls
        self.sockets = sockets  # {socket_name: SocketType}

    @classmethod
    def register(cls, name, node_cls, sockets):
        nt = NodeType(name, node_cls, sockets)
        cls.types[name] = nt
        return nt

    @classmethod
    def find(cls, name):
        return cls.types.get(name)


class Node:
    """Base scene node with declared sockets.

    Subclasses declare `SOCKETS = [SocketType(...), ...]` and get:
    kwargs construction, attribute access, modified tracking, XML IO.
    """

    NODE_NAME = None
    SOCKETS = []

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)
        # Inherit parent sockets, allow overrides by name.
        merged = {}
        for base in reversed(cls.__mro__):
            for s in getattr(base, "SOCKETS", []):
                merged[s.name] = s
        cls._socket_map = merged
        if cls.NODE_NAME:
            NodeType.register(cls.NODE_NAME, cls, merged)

    def __init__(self, name="", **kwargs):
        self.name = name
        self._modified = set(self._socket_map)  # everything new == modified
        for sname, sock in self._socket_map.items():
            default = sock.default
            if isinstance(default, (list, tuple)) and sock.type in SocketType.FLOAT3_TYPES:
                default = np.asarray(default, np.float32)
            elif isinstance(default, np.ndarray):
                default = default.copy()
            object.__setattr__(self, sname, default)
        for k, v in kwargs.items():
            self.set(k, v)

    # --- typed set/get (ref: Node::set) ---
    def set(self, socket_name, value):
        sock = self._socket_map.get(socket_name)
        if sock is None:
            raise AttributeError(
                f"{type(self).__name__} has no socket '{socket_name}'")
        value = sock.coerce(value)
        old = getattr(self, socket_name)
        if not _value_equal(old, value):
            object.__setattr__(self, socket_name, value)
            self._modified.add(socket_name)

    def get(self, socket_name):
        return getattr(self, socket_name)

    def get_enum_int(self, socket_name):
        sock = self._socket_map[socket_name]
        return sock.enum_to_int(getattr(self, socket_name))

    # --- modified tracking (ref: Node::modified / clear_modified) ---
    def is_modified(self):
        return bool(self._modified)

    def tag_modified(self, socket_name="__all__"):
        self._modified.add(socket_name)

    def clear_modified(self):
        self._modified.clear()

    # --- xml (ref: graph/node_xml.cpp xml_read_node/xml_write_node) ---
    def socket_items(self):
        for sname in self._socket_map:
            yield sname, getattr(self, sname)

    def load_xml_attributes(self, attrs, name_map=None):
        for k, v in attrs.items():
            k = (name_map or {}).get(k, k)
            if k in self._socket_map:
                self.set(k, v)

    def __repr__(self):
        return f"<{type(self).__name__} '{self.name}'>"


def _value_equal(a, b):
    if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
        a, b = np.asarray(a), np.asarray(b)
        return a.shape == b.shape and bool(np.array_equal(a, b))
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        try:
            return len(a) == len(b) and all(_value_equal(x, y) for x, y in zip(a, b))
        except TypeError:
            return False
    return a == b

"""ONNX protobuf message definitions (subset) backed by our wire codec.

Mirrors the public onnx.proto3 schema (field numbers are part of the
stable public ONNX format). Only the messages/fields a static-shape,
Opset<=17 inference graph needs are modelled; unknown fields are skipped
on read and absent on write, which protobuf semantics allow.
"""
from __future__ import annotations

from .wire import message_default, parse_message, serialize_message


class Message:
    FIELDS: dict = {}

    def __init__(self, **kwargs):
        for name, kind, *_ in type(self).FIELDS.values():
            setattr(self, name, message_default(kind))
        for k, v in kwargs.items():
            if not any(f[0] == k for f in type(self).FIELDS.values()):
                raise AttributeError(f"{type(self).__name__} has no field {k}")
            setattr(self, k, v)

    # protobuf-python compatible API surface
    def SerializeToString(self) -> bytes:
        return serialize_message(self)

    def ParseFromString(self, data: bytes):
        parsed = parse_message(type(self), data)
        for name, kind, *_ in type(self).FIELDS.values():
            setattr(self, name, getattr(parsed, name))
        return self

    def CopyFrom(self, other: "Message"):
        self.ParseFromString(other.SerializeToString())
        return self

    def __repr__(self):
        parts = []
        for name, kind, *_ in type(self).FIELDS.values():
            val = getattr(self, name)
            if val is None or val == message_default(kind):
                continue
            rep = repr(val)
            if len(rep) > 60:
                rep = rep[:57] + "..."
            parts.append(f"{name}={rep}")
        return f"{type(self).__name__}({', '.join(parts)})"


class StringStringEntryProto(Message):
    pass


StringStringEntryProto.FIELDS = {
    1: ("key", "string"),
    2: ("value", "string"),
}


class OperatorSetIdProto(Message):
    pass


OperatorSetIdProto.FIELDS = {
    1: ("domain", "string"),
    2: ("version", "int"),
}


class TensorProto(Message):
    """Tensor payload. DataType enum values are the public ONNX ones."""

    # DataLocation enum
    DEFAULT = 0
    EXTERNAL = 1

    UNDEFINED = 0
    FLOAT = 1
    UINT8 = 2
    INT8 = 3
    UINT16 = 4
    INT16 = 5
    INT32 = 6
    INT64 = 7
    STRING = 8
    BOOL = 9
    FLOAT16 = 10
    DOUBLE = 11
    UINT32 = 12
    UINT64 = 13
    COMPLEX64 = 14
    COMPLEX128 = 15
    BFLOAT16 = 16


TensorProto.FIELDS = {
    1: ("dims", "ints"),
    2: ("data_type", "int"),
    4: ("float_data", "floats"),
    5: ("int32_data", "ints"),
    6: ("string_data", "strings"),
    7: ("int64_data", "ints"),
    8: ("name", "string"),
    9: ("raw_data", "bytes"),
    13: ("external_data", "messages", StringStringEntryProto),
    14: ("data_location", "int"),
    10: ("double_data", "doubles"),
    11: ("uint64_data", "uints"),
    12: ("doc_string", "string"),
}


class Dimension(Message):
    pass


Dimension.FIELDS = {
    1: ("dim_value", "int"),
    2: ("dim_param", "string"),
}


class TensorShapeProto(Message):
    Dimension = Dimension


TensorShapeProto.FIELDS = {
    1: ("dim", "messages", Dimension),
}


class TensorTypeProto(Message):
    pass


TensorTypeProto.FIELDS = {
    1: ("elem_type", "int"),
    2: ("shape", "message", TensorShapeProto),
}


class TypeProto(Message):
    Tensor = TensorTypeProto


TypeProto.FIELDS = {
    1: ("tensor_type", "message", TensorTypeProto),
    6: ("denotation", "string"),
}


class ValueInfoProto(Message):
    pass


ValueInfoProto.FIELDS = {
    1: ("name", "string"),
    2: ("type", "message", TypeProto),
    3: ("doc_string", "string"),
}


class AttributeProto(Message):
    """AttributeType enum values follow the public ONNX schema."""

    UNDEFINED = 0
    FLOAT = 1
    INT = 2
    STRING = 3
    TENSOR = 4
    GRAPH = 5
    FLOATS = 6
    INTS = 7
    STRINGS = 8
    TENSORS = 9
    GRAPHS = 10


class NodeProto(Message):
    pass


NodeProto.FIELDS = {
    1: ("input", "strings"),
    2: ("output", "strings"),
    3: ("name", "string"),
    4: ("op_type", "string"),
    5: ("attribute", "messages", AttributeProto),
    6: ("doc_string", "string"),
    7: ("domain", "string"),
}


class GraphProto(Message):
    pass


GraphProto.FIELDS = {
    1: ("node", "messages", NodeProto),
    2: ("name", "string"),
    5: ("initializer", "messages", TensorProto),
    10: ("doc_string", "string"),
    11: ("input", "messages", ValueInfoProto),
    12: ("output", "messages", ValueInfoProto),
    13: ("value_info", "messages", ValueInfoProto),
}


# AttributeProto references GraphProto, so fill FIELDS after its definition.
AttributeProto.FIELDS = {
    1: ("name", "string"),
    2: ("f", "float"),
    3: ("i", "int"),
    4: ("s", "bytes"),
    5: ("t", "message", TensorProto),
    6: ("g", "message", GraphProto),
    7: ("floats", "floats"),
    8: ("ints", "ints"),
    9: ("strings", "strings"),
    11: ("graphs", "messages", GraphProto),
    10: ("tensors", "messages", TensorProto),
    13: ("doc_string", "string"),
    20: ("type", "int"),
    21: ("ref_attr_name", "string"),
}


class ModelProto(Message):
    pass


ModelProto.FIELDS = {
    1: ("ir_version", "int"),
    2: ("producer_name", "string"),
    3: ("producer_version", "string"),
    4: ("domain", "string"),
    5: ("model_version", "int"),
    6: ("doc_string", "string"),
    7: ("graph", "message", GraphProto),
    8: ("opset_import", "messages", OperatorSetIdProto),
    14: ("metadata_props", "messages", StringStringEntryProto),
}

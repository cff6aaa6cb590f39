"""Self-contained ONNX (de)serialization layer.

The target environment ships neither the ``onnx`` package nor its
protobuf runtime, so this subpackage implements the protobuf wire format
and the slice of the ONNX schema needed for static-shape Opset<=17
inference graphs. The public surface mirrors ``onnx`` / ``onnx.helper``
/ ``onnx.numpy_helper`` where the reference uses them
(reference: numpy_quant/model.py:249-292).
"""
from . import helper, proto, wire
from .helper import (
    from_array,
    get_attribute_value,
    load,
    load_from_string,
    make_attribute,
    make_dim_param_fixed,
    make_graph,
    make_model,
    make_node,
    make_opsetid,
    make_tensor_value_info,
    save,
    to_array,
    value_info_shape,
)
from .proto import (
    AttributeProto,
    GraphProto,
    ModelProto,
    NodeProto,
    OperatorSetIdProto,
    TensorProto,
    TypeProto,
    ValueInfoProto,
)

__all__ = [
    "helper", "proto", "wire",
    "from_array", "to_array", "get_attribute_value",
    "load", "load_from_string", "save",
    "make_attribute", "make_graph", "make_model", "make_node",
    "make_opsetid", "make_tensor_value_info", "make_dim_param_fixed",
    "value_info_shape",
    "AttributeProto", "GraphProto", "ModelProto", "NodeProto",
    "OperatorSetIdProto", "TensorProto", "TypeProto", "ValueInfoProto",
]

"""Graph IR and ONNX importer.

Same observable structure as the reference graph layer
(reference: numpy_quant/model.py:17-54,249-292): doubly-linked
Constant/Variable/Node objects in ONNX graph order. The importer
classifies initializers by dtype -- float32 payloads become device
FTensors, int64 payloads become host ITensors so shape-domain
computation constant-folds at trace time (see tensor.py).
"""
from __future__ import annotations

from typing import Any, List, Union

import numpy as np

from . import onnx as onnx_lib
from .tensor import FTensor, ITensor, Tensor


class Constant:
    """reference: numpy_quant/model.py:17-24"""

    def __init__(self, name: str, outputs: List["Node"], data: Tensor = None):
        self.name = name
        self.outputs = outputs
        self.data = data

    def __repr__(self):
        return f"Constant({self.name})"


class Variable:
    """reference: numpy_quant/model.py:27-35"""

    def __init__(self, name: str, inputs: List["Node"], outputs: List["Node"],
                 data: Tensor = None):
        self.name = name
        self.inputs = inputs
        self.outputs = outputs
        self.data = data

    def __repr__(self):
        return f"Variable({self.name})"


Value = Union[Constant, Variable]


class Node:
    """reference: numpy_quant/model.py:41-54"""

    def __init__(self, name: str, op: str, attrs: dict[str, Any],
                 inputs: List[Value], outputs: List[Value]):
        self.name = name
        self.op = op
        self.attrs = attrs
        self.inputs = inputs
        self.outputs = outputs

    def __repr__(self):
        return f"Node({self.name})"


def attribute_to_python(attr) -> Any:
    """ONNX attribute -> python/numpy value
    (reference: numpy_quant/model.py:57-62)."""
    value = onnx_lib.get_attribute_value(attr)
    if isinstance(value, onnx_lib.TensorProto):
        return onnx_lib.to_array(value)
    return value


def wrap_array(arr: np.ndarray) -> Tensor:
    """Classify a host array into the tensor layer."""
    arr = np.asarray(arr)
    if arr.dtype == np.float32:
        return FTensor(arr)
    if arr.dtype in (np.int64, np.int32, np.bool_):
        return ITensor(arr.astype(np.int64))
    if arr.dtype in (np.int8, np.uint8, np.int16, np.uint16):
        # narrow int payloads (QDQ-format quantized weights / zero
        # points): values widen to the int64 host domain, the original
        # dtype is kept for QuantizeLinear/DequantizeLinear range rules
        t = ITensor(arr.astype(np.int64))
        t.orig_dtype = arr.dtype
        return t
    raise ValueError(f"Array dtype {arr.dtype} not supported")


def import_onnx(onnx_model: onnx_lib.ModelProto):
    """Build (nodes, values, inputs, outputs) from a ModelProto.

    Mirrors reference: numpy_quant/model.py:249-292 with one spec fix:
    a graph input that is also an initializer stays a Constant.
    """
    return import_graph(onnx_model.graph)


def import_graph(graph: onnx_lib.GraphProto):
    """Build (nodes, values, inputs, outputs) from a GraphProto --
    the body of :func:`import_onnx`, also used directly for the If/
    Loop subgraph attributes (model.py executes those inline against
    the outer value environment)."""

    value_dict: dict[str, Value] = {}
    initializer_names = set()
    for onnx_tensor in graph.initializer:
        arr = onnx_lib.to_array(onnx_tensor)
        value_dict[onnx_tensor.name] = Constant(onnx_tensor.name, outputs=[],
                                                data=wrap_array(arr))
        initializer_names.add(onnx_tensor.name)

    inputs: List[Variable] = []
    for onnx_vi in graph.input:
        if onnx_vi.name in initializer_names:
            continue
        var = Variable(onnx_vi.name, inputs=[], outputs=[])
        # Static-shape hint from the input's ValueInfo (symbolic
        # dim_params become None). Graph passes that need ranks/shapes
        # of internal values (QModel.narrow_gather) trace the model
        # abstractly from these hints.
        try:
            dims = onnx_lib.value_info_shape(onnx_vi)
            var.shape_hint = tuple(None if isinstance(d, str) else int(d)
                                   for d in dims)
            tt = onnx_vi.type.tensor_type if onnx_vi.type else None
            var.dtype_hint = int(tt.elem_type) if tt is not None else None
        except Exception:
            var.shape_hint = None
            var.dtype_hint = None
        value_dict[onnx_vi.name] = var
        inputs.append(var)

    nodes: dict[str, Node] = {}
    for i, onnx_node in enumerate(graph.node):
        name = onnx_node.name or f"{onnx_node.op_type}_{i}"
        for input_name in onnx_node.input:
            if input_name and input_name not in value_dict:
                value_dict[input_name] = Variable(input_name, inputs=[], outputs=[])
        # Optional inputs passed as "" keep their POSITION as a None
        # slot (ONNX semantics: an empty name means "absent", later
        # positions still count); trailing absents are trimmed like
        # trailing omissions. Ops then address optionals positionally
        # instead of classifying tensors by dtype/shape.
        in_values = [value_dict[n] if n else None for n in onnx_node.input]
        while in_values and in_values[-1] is None:
            in_values.pop()
        node = Node(
            name=name,
            op=onnx_node.op_type,
            attrs={a.name: attribute_to_python(a) for a in onnx_node.attribute},
            inputs=in_values,
            outputs=[],
        )
        for input_name in onnx_node.input:
            if not input_name:
                continue
            value_dict[input_name].outputs.append(node)
        for output_name in onnx_node.output:
            if output_name not in value_dict:
                value_dict[output_name] = Variable(output_name, inputs=[node],
                                                   outputs=[])
            else:
                value_dict[output_name].inputs.append(node)
        node.outputs = [value_dict[n] for n in onnx_node.output]
        nodes[name] = node

    outputs: List[Value] = [value_dict[vi.name] for vi in graph.output]

    return list(nodes.values()), list(value_dict.values()), inputs, outputs

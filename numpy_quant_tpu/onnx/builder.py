"""Convenience graph builder on top of the ONNX helper API."""
from __future__ import annotations

import numpy as np

from . import helper as H
from .proto import ModelProto, NodeProto, TensorProto, ValueInfoProto


class GraphBuilder:
    """Incrementally build an ONNX graph with auto-named values."""

    def __init__(self, name: str = "graph"):
        self.name = name
        self.nodes: list[NodeProto] = []
        self.initializers: list[TensorProto] = []
        self.inputs: list[ValueInfoProto] = []
        self.outputs: list[ValueInfoProto] = []
        self._counter = 0

    def _fresh(self, hint: str) -> str:
        self._counter += 1
        return f"/{hint}_{self._counter}"

    def input(self, name: str, shape, elem_type: int = TensorProto.FLOAT) -> str:
        self.inputs.append(H.make_tensor_value_info(name, elem_type, shape))
        return name

    def output(self, name: str, shape=None,
               elem_type: int = TensorProto.FLOAT) -> str:
        self.outputs.append(H.make_tensor_value_info(name, elem_type, shape))
        return name

    def init(self, name: str, arr: np.ndarray) -> str:
        self.initializers.append(H.from_array(np.asarray(arr), name))
        return name

    def node(self, op: str, inputs: list[str], out: str | None = None,
             n_outputs: int = 1, name: str | None = None, **attrs):
        if out is None:
            out = self._fresh(op)
        outputs = [out] if n_outputs == 1 else [f"{out}_{i}" for i in range(n_outputs)]
        self.nodes.append(H.make_node(op, inputs, outputs,
                                      name=name or f"{op}{out}", **attrs))
        return outputs[0] if n_outputs == 1 else outputs

    def const(self, arr: np.ndarray, hint: str = "Constant") -> str:
        """Emit a Constant node (the torch exporter's style for shape
        constants)."""
        out = self._fresh(hint)
        self.nodes.append(H.make_node("Constant", [], [out],
                                      name=f"Constant{out}",
                                      value=np.asarray(arr)))
        return out

    def model(self, opset: int = 17,
              producer: str = "numpy-quant-tpu") -> ModelProto:
        graph = H.make_graph(self.nodes, self.name, self.inputs, self.outputs,
                             initializer=self.initializers)
        return H.make_model(graph, producer_name=producer,
                            opset_imports=[H.make_opsetid("", opset)])

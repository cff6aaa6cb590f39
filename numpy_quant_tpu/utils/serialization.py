"""QModel serialization (save/load).

The reference cannot persist a quantized model -- quantized state lives
only in memory (SURVEY.md §5 names this the checkpoint/resume gap;
reference: numpy_quant/model.py:441-442). Here a QModel round-trips
through a single ONNX file: quantized payloads ride as initializers
(int8 for b<=8) and the quantization parameters as metadata_props.
"""
from __future__ import annotations

import json

import numpy as np

from .. import onnx as O
from ..graph import Constant
from ..model import Model, QModel, QuantizationParams
from ..tensor import FTensor, ITensor, QTensor


def save_calibration_stats(stats: dict, path) -> None:
    """Persist {value name: (min, max)} calibration stats as JSON."""
    with open(path, "w") as f:
        json.dump({k: [float(v[0]), float(v[1])] for k, v in stats.items()},
                  f, indent=0)


def load_calibration_stats(path) -> dict:
    with open(path) as f:
        raw = json.load(f)
    return {k: (np.float32(v[0]), np.float32(v[1])) for k, v in raw.items()}


def _scale_to_json(scale):
    """Scalar scale -> float; per-channel vector scale -> shape+values."""
    arr = np.asarray(scale, np.float32)
    if arr.ndim == 0:
        return float(arr)
    return {"shape": list(arr.shape),
            "values": [float(v) for v in arr.reshape(-1)]}


def _scale_from_json(s):
    if isinstance(s, dict):
        return np.asarray(s["values"], np.float32).reshape(s["shape"])
    return np.float32(s)


def _qparams_to_json(qp: QuantizationParams) -> dict:
    return {"scale": _scale_to_json(qp.scale),
            "zero_point": None if qp.zero_point is None else int(qp.zero_point)}


def save_qmodel(qmodel: QModel, path, source_onnx: O.ModelProto) -> None:
    """Persist a QModel next to its source graph.

    source_onnx: the ModelProto the float model was imported from (the
    graph structure is reused; only constant payloads and metadata
    change).
    """
    model = O.load_from_string(source_onnx.SerializeToString())  # deep copy
    qconst = {v.name: v for v in qmodel.values if isinstance(v, Constant)}

    from ..tensor import PackedQTensor

    new_inits = []
    tensor_meta = {}
    for init in model.graph.initializer:
        value = qconst.get(init.name)
        if value is None:
            new_inits.append(init)
            continue
        if isinstance(value.data, PackedQTensor):
            # packed payload stored verbatim (exactly bit_width bits per
            # value on disk too, except native int8); colsum is
            # recomputed at load time
            pq = value.data
            payload = np.asarray(pq.planes)
            payload = payload.astype(np.int8) if payload.dtype == np.int8 \
                else payload.astype(np.uint8)
            new_inits.append(O.from_array(payload, init.name))
            tensor_meta[init.name] = {
                "packed": True,
                "layout": pq.layout,
                "bit_width": pq.bit_width,
                "k": pq.k,
                "n": pq.n,
                "scale": _scale_to_json(pq.scale),
                "zero_point": None,
            }
            continue
        if not isinstance(value.data, QTensor):
            new_inits.append(init)
            continue
        qt = value.data
        arr = np.asarray(qt.data)
        store = arr.astype(np.int8) if qt.bit_width <= 8 else arr.astype(np.int32)
        new_inits.append(O.from_array(store, init.name))
        tensor_meta[init.name] = {
            "bit_width": qt.bit_width,
            "scale": _scale_to_json(qt.scale),
            "zero_point": None if qt.zero_point is None else int(qt.zero_point),
        }
    model.graph.initializer = new_inits

    meta = {
        "bit_width": qmodel.bit_width,
        "quantized_ops": [op for op in qmodel.quantized_ops
                          if op != "FusedAttention"],
        "quant_params": {k: _qparams_to_json(v)
                         for k, v in qmodel.quant_params.items()},
        "quantized_initializers": tensor_meta,
    }
    entry = O.proto.StringStringEntryProto()
    entry.key = "numpy_quant_tpu.qmodel"
    entry.value = json.dumps(meta)
    model.metadata_props = [e for e in model.metadata_props
                            if e.key != "numpy_quant_tpu.qmodel"] + [entry]
    O.save(model, path)


def load_qmodel(path) -> QModel:
    """Load a QModel saved by save_qmodel."""
    model_proto = O.load(path)
    meta_entry = next(e for e in model_proto.metadata_props
                      if e.key == "numpy_quant_tpu.qmodel")
    meta = json.loads(meta_entry.value)

    from ..graph import import_onnx
    nodes, values, inputs, outputs = import_onnx_quantized(
        model_proto, meta["quantized_initializers"])
    qparams = {
        name: QuantizationParams(
            _scale_from_json(d["scale"]),
            None if d["zero_point"] is None else np.int64(d["zero_point"]))
        for name, d in meta["quant_params"].items()}
    quantized_ops = tuple(meta.get("quantized_ops", ("MatMul", "Gemm")))
    return QModel(nodes, values, inputs, outputs, meta["bit_width"], qparams,
                  quantized_ops=quantized_ops)


def import_onnx_quantized(model_proto: O.ModelProto, tensor_meta: dict):
    """import_onnx variant that rebuilds QTensor constants."""
    from ..graph import Node, Variable, wrap_array

    from ..tensor import PackedQTensor

    graph = model_proto.graph
    value_dict = {}
    initializer_names = set()
    for t in graph.initializer:
        arr = O.to_array(t)
        meta = tensor_meta.get(t.name)
        if meta is not None and meta.get("packed"):
            from ..kernels.pack import unpack_bitplanes_np, unpack_splitk_np
            layout = meta.get("layout", "bitplanes")
            if layout == "splitk":
                planes = arr.astype(np.int8) if meta["bit_width"] == 8 \
                    else arr.astype(np.uint8)
                vals = planes if meta["bit_width"] == 8 else \
                    unpack_splitk_np(planes, meta["bit_width"], meta["k"])
            else:
                planes = arr.astype(np.uint8)
                vals = unpack_bitplanes_np(planes, meta["bit_width"],
                                           meta["k"])
            colsum = vals.astype(np.int64).sum(axis=0,
                                               keepdims=True).astype(np.int32)
            data = PackedQTensor(planes, colsum, meta["k"], meta["n"],
                                 meta["bit_width"],
                                 _scale_from_json(meta["scale"]),
                                 layout=layout)
        elif meta is not None:
            zp = meta["zero_point"]
            data = QTensor(arr.astype(np.int32), meta["bit_width"],
                           _scale_from_json(meta["scale"]),
                           None if zp is None else np.int64(zp))
        elif arr.dtype == np.float32:
            data = FTensor(arr)
        else:
            data = ITensor(arr.astype(np.int64))
        value_dict[t.name] = Constant(t.name, outputs=[], data=data)
        initializer_names.add(t.name)

    inputs = []
    for vi in graph.input:
        if vi.name in initializer_names:
            continue
        value_dict[vi.name] = Variable(vi.name, inputs=[], outputs=[])
        inputs.append(value_dict[vi.name])

    from ..graph import attribute_to_python
    nodes = {}
    for i, onnx_node in enumerate(graph.node):
        name = onnx_node.name or f"{onnx_node.op_type}_{i}"
        for n in onnx_node.input:
            if n and n not in value_dict:
                value_dict[n] = Variable(n, inputs=[], outputs=[])
        node = Node(name=name, op=onnx_node.op_type,
                    attrs={a.name: attribute_to_python(a)
                           for a in onnx_node.attribute},
                    inputs=[value_dict[n] for n in onnx_node.input if n],
                    outputs=[])
        for n in onnx_node.input:
            if n:
                value_dict[n].outputs.append(node)
        for n in onnx_node.output:
            if n not in value_dict:
                value_dict[n] = Variable(n, inputs=[node], outputs=[])
            else:
                value_dict[n].inputs.append(node)
        node.outputs = [value_dict[n] for n in onnx_node.output]
        nodes[name] = node

    outputs = [value_dict[vi.name] for vi in graph.output]
    return list(nodes.values()), list(value_dict.values()), inputs, outputs

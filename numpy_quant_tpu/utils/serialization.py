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


def save_qmodel(qmodel: QModel, path, source_onnx: O.ModelProto,
                external_data_threshold: int = None) -> None:
    """Persist a QModel next to its source graph.

    source_onnx: the ModelProto the float model was imported from (the
    graph structure is reused; only constant payloads and metadata
    change). ``external_data_threshold`` (bytes) moves big payloads to
    a ``<path>.data`` side file (onnx/helper.py save -- the >2GB
    export layout); load_qmodel reads it transparently.
    """
    # packed payloads store verbatim (exactly bit_width bits per value
    # on disk too, except native int8); colsum recomputes at load time
    model, tensor_meta = _weight_only_initializers(qmodel, source_onnx)

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
    O.save(model, path,
           external_data_threshold=external_data_threshold)


def _weight_only_initializers(model, source_onnx):
    """Shared initializer conversion for save_qmodel/save_weight_only:
    returns (deep-copied ModelProto with int payloads, tensor_meta)."""
    out = O.load_from_string(source_onnx.SerializeToString())
    qconst = {v.name: v for v in model.values if isinstance(v, Constant)}
    from ..tensor import PackedQTensor

    new_inits, tensor_meta = [], {}
    for init in out.graph.initializer:
        value = qconst.get(init.name)
        data = None if value is None else value.data
        if isinstance(data, PackedQTensor):
            payload = np.asarray(data.planes)
            payload = payload.astype(np.int8) \
                if payload.dtype == np.int8 else payload.astype(np.uint8)
            new_inits.append(O.from_array(payload, init.name))
            tensor_meta[init.name] = {
                "packed": True, "layout": data.layout,
                "bit_width": data.bit_width, "k": data.k, "n": data.n,
                "scale": _scale_to_json(data.scale), "zero_point": None}
        elif isinstance(data, QTensor):
            arr = np.asarray(data.data)
            store = arr.astype(np.int8) if data.bit_width <= 8 \
                else arr.astype(np.int32)
            new_inits.append(O.from_array(store, init.name))
            tensor_meta[init.name] = {
                "bit_width": data.bit_width,
                "scale": _scale_to_json(data.scale),
                "zero_point": None if data.zero_point is None
                else int(data.zero_point)}
        else:
            new_inits.append(init)
    out.graph.initializer = new_inits
    return out, tensor_meta


def save_weight_only(model, path, source_onnx: O.ModelProto) -> None:
    """Persist a weight-only model (a float ``Model`` whose MatMul/Gemm
    weights were converted by ``Model.quantize_weights``): integer
    payloads (packed included) land as initializers, scales -- scalar,
    per-channel, or grouped [K/g, N] grids -- ride in metadata. The
    graph structure is reused from ``source_onnx``. Round-trips via
    :func:`load_weight_only` (bit-exact: same ints, same scales)."""
    out, tensor_meta = _weight_only_initializers(model, source_onnx)
    meta = {"quantized_initializers": tensor_meta}
    entry = O.proto.StringStringEntryProto()
    entry.key = "numpy_quant_tpu.weight_only"
    entry.value = json.dumps(meta)
    out.metadata_props = [e for e in out.metadata_props
                          if e.key != "numpy_quant_tpu.weight_only"] \
        + [entry]
    O.save(out, path)


def load_weight_only(path):
    """Load a float weight-only model saved by save_weight_only."""
    from ..model import Model

    model_proto = O.load(path)
    meta_entry = next(e for e in model_proto.metadata_props
                      if e.key == "numpy_quant_tpu.weight_only")
    meta = json.loads(meta_entry.value)
    nodes, values, inputs, outputs = import_onnx_quantized(
        model_proto, meta["quantized_initializers"])
    return Model(nodes, values, inputs, outputs)


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
            from ..kernels.pack import (
                unpack_bitplanes_np, unpack_splitk_np, unpack_stacked_np)
            layout = meta.get("layout", "bitplanes")
            if layout == "splitk_stacked":
                planes = arr.astype(np.int8) if meta["bit_width"] == 8 \
                    else arr.astype(np.uint8)
                vals = unpack_stacked_np(planes, meta["bit_width"],
                                         meta["k"])
            elif layout == "splitk":
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
        # empty-name optionals keep their position as None slots,
        # trailing ones trimmed (same rule as graph.import_onnx)
        in_values = [value_dict[n] if n else None for n in onnx_node.input]
        while in_values and in_values[-1] is None:
            in_values.pop()
        node = Node(name=name, op=onnx_node.op_type,
                    attrs={a.name: attribute_to_python(a)
                           for a in onnx_node.attribute},
                    inputs=in_values,
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


def _unpack_packed(data):
    """PackedQTensor -> the equal-value plain QTensor (int payload);
    anything else passes through."""
    from ..kernels.pack import (
        unpack_bitplanes_np, unpack_splitk_np, unpack_stacked_np)
    from ..tensor import PackedQTensor

    if not isinstance(data, PackedQTensor):
        return data
    if data.layout == "splitk_stacked":
        vals = unpack_stacked_np(np.asarray(data.planes),
                                 data.bit_width, data.k)
    elif data.layout == "splitk":
        vals = np.asarray(data.planes, np.int8) if data.bit_width == 8 \
            else unpack_splitk_np(np.asarray(data.planes),
                                  data.bit_width, data.k)
    else:
        vals = unpack_bitplanes_np(np.asarray(data.planes),
                                   data.bit_width, data.k)
    return QTensor(vals, data.bit_width, data.scale, None)


def _merged_weight_slices(qmodel: QModel) -> dict:
    """merge_parallel_matmuls removed the original weight Constants (the
    payload lives in '<node>/merged_w'): re-slice per-initializer
    QTensors out of the merged tensor so exports carry the SAME int8
    weights the executor computes with (ADVICE r2: they used to
    silently export as plain float initializers)."""
    merged_slices = {}
    for node in qmodel.nodes:
        if node.op != "MatMulSplit" or "source_weights" not in node.attrs:
            continue
        mdata = _unpack_packed(node.inputs[1].data)
        vals = np.asarray(mdata.data)
        start = 0
        for name, seg, s in zip(node.attrs["source_weights"],
                                node.attrs["segments"],
                                node.attrs["segment_scales"]):
            merged_slices[name] = QTensor(vals[:, start:start + seg],
                                          mdata.bit_width,
                                          np.float32(s), None)
            start += seg
    return merged_slices


def _per_channel_axis(v, arr: np.ndarray, scale: np.ndarray) -> int:
    """Channel axis for a per-channel weight's DequantizeLinear, derived
    from the CONSUMER (the per_channel_weights PTQ rule: MatMul rhs ->
    axis 1, Gemm transB -> axis 0) -- a square weight makes plain shape
    matching ambiguous. Falls back to shape matching for 1-D biases and
    sourceless (merged) payloads."""
    axis = None
    if arr.ndim == 2:  # weights; 1-D biases always use axis 0
        for n in getattr(v, "outputs", None) or []:
            if n.op == "Gemm":
                axis = 0 if n.attrs.get("transB") else 1
            elif n.op in ("MatMul", "MatMulSplit"):
                axis = 1
    if axis is None or axis >= arr.ndim or arr.shape[axis] != scale.size:
        axis = next(i for i, d in enumerate(arr.shape)
                    if d == scale.size)
    return axis


def export_qdq(qmodel: QModel, source_onnx: O.ModelProto) -> O.ModelProto:
    """Export a QModel as a STANDARD QDQ-format ONNX model
    (QuantizeLinear/DequantizeLinear) that any ONNX runtime can serve.

    Structure mirrors the executor's semantics (reference:
    numpy_quant/model.py:486-565): matmul weights become int8
    initializers + DequantizeLinear (per-tensor or per-axis scales),
    4x-bit-width biases become int32 initializers + DequantizeLinear at
    the s_x*s_w scale, graph inputs and MatMul/Gemm activations get
    QuantizeLinear->DequantizeLinear pairs with the calibrated
    parameters, and Gemm outputs requantize through a Q/DQ pair
    (producer-side renamed, so the model interface keeps its names).
    Fake-quant in f32 equals the integer computation up to accumulator
    rounding.

    Requires bit_width <= 8 (int8 QDQ zero points; 16-bit QDQ needs
    opset 21).
    """
    assert qmodel.bit_width <= 8, "QDQ export needs bit_width <= 8"
    model = O.load_from_string(source_onnx.SerializeToString())  # deep copy
    g = model.graph
    qconst = {v.name: v for v in qmodel.values if isinstance(v, Constant)}
    qp = qmodel.quant_params
    merged_slices = _merged_weight_slices(qmodel)

    # ---- weights/biases -> int initializers + DequantizeLinear
    new_inits = []
    weight_dq_nodes = []
    for init in g.initializer:
        v = qconst.get(init.name)
        data = getattr(v, "data", None)
        if data is None and init.name in merged_slices:
            v = None
            data = merged_slices[init.name]
        data = _unpack_packed(data)
        if not isinstance(data, QTensor) or data.zero_point is not None:
            new_inits.append(init)  # float/shape-domain constants as-is
            continue
        arr = np.asarray(data.data)
        scale = np.asarray(data.scale, np.float32).reshape(-1)
        # b<=8 payloads store int8; 4x-bit-width biases store int32
        store = arr.astype(np.int8) if data.bit_width <= 8 \
            else arr.astype(np.int32)
        qname = init.name + "/q"
        sname = init.name + "/q_scale"
        new_inits.append(O.from_array(store, qname))
        kw = {}
        if scale.size > 1:
            new_inits.append(O.from_array(scale.astype(np.float32), sname))
            kw["axis"] = _per_channel_axis(v, arr, scale)
        else:
            new_inits.append(O.from_array(np.float32(scale[0]), sname))
        weight_dq_nodes.append(O.make_node(
            "DequantizeLinear", [qname, sname], [init.name],
            name=f"DQ_{init.name}", **kw))
    init_names = {i.name for i in new_inits} | \
        {n.output[0] for n in weight_dq_nodes}

    # ---- activation Q/DQ pairs
    extra_inits = []
    new_nodes = list(weight_dq_nodes)
    rename: dict[str, str] = {}   # applied to every later consumer
    wrapped: dict[str, str] = {}

    def _qdq_param_inits(name: str, p) -> list:
        sname = f"{name}/qdq_scale"
        extra_inits.append(O.from_array(np.float32(p.scale), sname))
        # ALWAYS emit an int8 zero point: without one, ONNX
        # QuantizeLinear defaults to uint8 storage and a conformant
        # runtime would clip every negative value to 0. Symmetric
        # (zero_point=None) exports as an explicit int8 zp of 0.
        zname = f"{name}/qdq_zp"
        zp_val = 0 if p.zero_point is None else int(p.zero_point)
        extra_inits.append(O.from_array(np.int8(zp_val), zname))
        return [sname, zname]

    def _wrappable(p) -> bool:
        # only activation-bit-width params export as int8 Q/DQ pairs;
        # 4x-bit-width accumulator entries (wide zero points) do not
        if p is None or np.asarray(p.scale).size > 1:
            return False
        zp = p.zero_point
        return zp is None or -128 <= int(zp) <= 127

    def ensure_qdq(name: str) -> str:
        """Consumer-side wrap: Q/DQ after the existing value."""
        if name in wrapped:
            return wrapped[name]
        p = qp.get(name)
        if not _wrappable(p):
            return name
        pnames = _qdq_param_inits(name, p)
        qout, dqout = f"{name}/qdq_q", f"{name}/qdq"
        new_nodes.append(O.make_node("QuantizeLinear", [name] + pnames,
                                     [qout], name=f"Q_{name}"))
        new_nodes.append(O.make_node("DequantizeLinear", [qout] + pnames,
                                     [dqout], name=f"DQ_{name}"))
        wrapped[name] = dqout
        return dqout

    def wrap_producer(node) -> None:
        """Producer-side wrap: the node emits '<out>/raw', the DQ
        re-emits the ORIGINAL name -- downstream needs no renames."""
        out = node.output[0]
        p = qp.get(out)
        if not _wrappable(p):
            return
        raw = out + "/raw"
        node.output[0] = raw
        pnames = _qdq_param_inits(out, p)
        new_nodes.append(O.make_node("QuantizeLinear", [raw] + pnames,
                                     [out + "/q"], name=f"Q_{out}"))
        new_nodes.append(O.make_node("DequantizeLinear",
                                     [out + "/q"] + pnames, [out],
                                     name=f"DQ_{out}"))
        # the re-emitted name already carries fake-quant values: a
        # consumer-side re-wrap would duplicate the Q_<out> node and
        # qdq_scale/zp initializer names (and is a numeric no-op --
        # quantize of a fake-quant value with the same params is the
        # identity), so later ensure_qdq calls reuse the name as-is
        wrapped[out] = out

    # graph inputs quantize on entry (reference: model.py:488-495) --
    # EVERY consumer sees the fake-quant value
    for vi in g.input:
        if vi.name not in init_names:
            rename[vi.name] = ensure_qdq(vi.name)

    for node in g.node:
        node.input = [rename.get(i, i) for i in node.input]
        if node.op_type in ("MatMul", "Gemm"):
            # activations quantize on the fly per matmul ("TinyqQuant",
            # model.py:503-527); other consumers of the same value keep
            # the float original, hence no global rename here
            node.input = [i if i in init_names else ensure_qdq(i)
                          for i in node.input]
        new_nodes.append(node)
        if node.op_type == "Gemm" and node.output[0] in qp:
            wrap_producer(node)  # requantize (model.py:544-548)

    model.graph.node = new_nodes
    model.graph.initializer = new_inits + extra_inits
    return model


def save_qmodel_qdq(qmodel: QModel, path, source_onnx: O.ModelProto) -> None:
    """export_qdq + save: one standard ONNX file other runtimes serve."""
    O.save(export_qdq(qmodel, source_onnx), path)


def export_qoperator(qmodel: QModel,
                     source_onnx: O.ModelProto) -> O.ModelProto:
    """Export a QModel in QOperator format: quantized MatMuls become
    QLinearMatMul and quantized Convs QLinearConv -- the integer op is
    EXPLICIT in the graph, so runtimes without QDQ pattern fusion still
    run integer kernels. Activations enter each converted op through a
    QuantizeLinear with the calibrated parameters, and the op's int8
    output dequantizes back to float under its original value name, so
    the model interface and every unconverted consumer are unchanged.

    The standard opset has no quantized Gemm (QGemm is a com.microsoft
    extension), so Gemm nodes -- and any MatMul the format cannot
    express (per-channel weights: QLinearMatMul requires scalar operand
    scales) -- keep the QDQ form of export_qdq, yielding a legal mixed
    model.

    Numerics note: the format requantizes every converted op's OUTPUT
    to its calibrated (scale, zero_point); the in-process executor
    instead carries the exact int32 accumulator into the consumer
    (reference semantics, numpy_quant/model.py:528-538), so QOperator
    serving adds one output-quantization rounding per converted node.
    The registry executes both QLinear ops (ops/registry.py), closing
    an export -> import -> execute conformance loop in-process.
    """
    assert qmodel.bit_width <= 8, "QOperator export needs bit_width <= 8"
    model = O.load_from_string(source_onnx.SerializeToString())  # deep copy
    g = model.graph
    qconst = {v.name: v for v in qmodel.values if isinstance(v, Constant)}
    qp = qmodel.quant_params
    merged_slices = _merged_weight_slices(qmodel)

    # ---- quantized weight/bias initializers -> int payloads
    # '<name>/q' (+ '/q_scale', '/q_zp') for QLinear operands; a
    # DequantizeLinear re-emitting the float name is appended only when
    # some unconverted consumer still reads it (pruned at the end).
    new_inits = []
    extra_inits = []
    new_nodes = []
    weight_q = {}        # float init name -> (qname, sname, zname, QTensor)
    weight_dq_nodes = {}  # float init name -> DequantizeLinear node
    for init in g.initializer:
        v = qconst.get(init.name)
        data = getattr(v, "data", None)
        if data is None and init.name in merged_slices:
            data = merged_slices[init.name]
        data = _unpack_packed(data)
        if not isinstance(data, QTensor) or data.zero_point is not None:
            new_inits.append(init)  # float/shape-domain constants as-is
            continue
        arr = np.asarray(data.data)
        scale = np.asarray(data.scale, np.float32).reshape(-1)
        store = arr.astype(np.int8) if data.bit_width <= 8 \
            else arr.astype(np.int32)
        qname, sname, zname = (init.name + "/q", init.name + "/q_scale",
                               init.name + "/q_zp")
        new_inits.append(O.from_array(store, qname))
        sval = scale.astype(np.float32) if scale.size > 1 \
            else np.float32(scale[0])
        new_inits.append(O.from_array(sval, sname))
        if store.dtype == np.int8:
            zval = np.zeros(scale.shape, np.int8) if scale.size > 1 \
                else np.int8(0)
            new_inits.append(O.from_array(zval, zname))
        else:
            zname = None  # int32 biases carry no zero point input
        weight_q[init.name] = (qname, sname, zname, data)
        kw = {}
        if scale.size > 1:
            kw["axis"] = _per_channel_axis(v, arr, scale)
        dq_in = [qname, sname] + ([zname] if zname else [])
        weight_dq_nodes[init.name] = O.make_node(
            "DequantizeLinear", dq_in, [init.name],
            name=f"DQ_{init.name}", **kw)
    init_names = {i.name for i in new_inits} | set(weight_dq_nodes)

    rename: dict[str, str] = {}
    wrapped: dict[str, str] = {}
    quantized_act: dict[str, str] = {}

    def _qdq_param_inits(name: str, p, suffix: str = "qdq") -> list:
        sname = f"{name}/{suffix}_scale"
        extra_inits.append(O.from_array(np.float32(p.scale), sname))
        # ALWAYS emit an int8 zero point: without one, ONNX QuantizeLinear
        # defaults to uint8 storage (see export_qdq)
        zname = f"{name}/{suffix}_zp"
        zp_val = 0 if p.zero_point is None else int(p.zero_point)
        extra_inits.append(O.from_array(np.int8(zp_val), zname))
        return [sname, zname]

    def _wrappable(p) -> bool:
        if p is None or np.asarray(p.scale).size > 1:
            return False
        zp = p.zero_point
        return zp is None or -128 <= int(zp) <= 127

    def ensure_q(name: str):
        """int8 activation for a QLinear operand: QuantizeLinear once,
        shared by every converted consumer. Returns (q_name, scale
        initializer, zp initializer) or None."""
        p = qp.get(name)
        if not _wrappable(p):
            return None
        if name not in quantized_act:
            pnames = _qdq_param_inits(name, p, suffix="qop")
            qout = f"{name}/qop_q"
            new_nodes.append(O.make_node("QuantizeLinear", [name] + pnames,
                                         [qout], name=f"Qop_{name}"))
            quantized_act[name] = (qout, pnames[0], pnames[1])
        return quantized_act[name]

    def ensure_qdq(name: str) -> str:
        """QDQ fallback: consumer-side fake-quant wrap (see export_qdq)."""
        if name in wrapped:
            return wrapped[name]
        p = qp.get(name)
        if not _wrappable(p):
            return name
        pnames = _qdq_param_inits(name, p)
        qout, dqout = f"{name}/qdq_q", f"{name}/qdq"
        new_nodes.append(O.make_node("QuantizeLinear", [name] + pnames,
                                     [qout], name=f"Q_{name}"))
        new_nodes.append(O.make_node("DequantizeLinear", [qout] + pnames,
                                     [dqout], name=f"DQ_{name}"))
        wrapped[name] = dqout
        return dqout

    def wrap_producer(node) -> None:
        out = node.output[0]
        p = qp.get(out)
        if not _wrappable(p):
            return
        raw = out + "/raw"
        node.output[0] = raw
        pnames = _qdq_param_inits(out, p)
        new_nodes.append(O.make_node("QuantizeLinear", [raw] + pnames,
                                     [out + "/q"], name=f"Q_{out}"))
        new_nodes.append(O.make_node("DequantizeLinear",
                                     [out + "/q"] + pnames, [out],
                                     name=f"DQ_{out}"))
        # later consumer-side wraps reuse the already-fake-quant name
        # (see export_qdq: avoids duplicate node/initializer names)
        wrapped[out] = out

    def _qlinear_operand(name: str):
        """(int8 name, scale name, zp name) for a QLinear input: a
        quantized weight initializer directly, or an activation through
        its shared QuantizeLinear."""
        wq = weight_q.get(name)
        if wq is not None:
            qname, sname, zname, data = wq
            if zname is None or np.asarray(data.scale).ndim > 0:
                return None  # bias payload / per-channel: not scalar
            return (qname, sname, zname)
        if name in init_names:
            return None  # unquantized initializer
        return ensure_q(name)

    # graph inputs quantize on entry for QDQ-fallback consumers
    for vi in g.input:
        if vi.name not in init_names:
            rename[vi.name] = ensure_qdq(vi.name)

    converted = 0
    for node in g.node:
        if node.op_type == "MatMul":
            a, b = node.input[0], node.input[1]
            out = node.output[0]
            p_out = qp.get(out)
            qa, qb = _qlinear_operand(a), _qlinear_operand(b)
            if qa and qb and _wrappable(p_out):
                ynames = _qdq_param_inits(out, p_out, suffix="qop_y")
                new_nodes.append(O.make_node(
                    "QLinearMatMul",
                    list(qa) + list(qb) + ynames, [out + "/qop"],
                    name=f"QL_{node.name or out}"))
                new_nodes.append(O.make_node(
                    "DequantizeLinear", [out + "/qop"] + ynames, [out],
                    name=f"QLDQ_{out}"))
                converted += 1
                continue
        if node.op_type == "Conv" and "Conv" in qmodel.quantized_ops:
            x, w = node.input[0], node.input[1]
            bias = node.input[2] if len(node.input) > 2 else None
            out = node.output[0]
            p_out = qp.get(out)
            qx = _qlinear_operand(x)
            wq = weight_q.get(w)
            bias_ok = bias is None or (
                bias in weight_q and weight_q[bias][2] is None)
            if qx and wq and wq[2] is not None and bias_ok \
                    and _wrappable(p_out):
                # per-channel weight scales are legal for QLinearConv
                ynames = _qdq_param_inits(out, p_out, suffix="qop_y")
                ins = list(qx) + [wq[0], wq[1], wq[2]] + ynames
                if bias is not None:
                    ins.append(weight_q[bias][0])
                qlc = O.make_node("QLinearConv", ins, [out + "/qop"],
                                  name=f"QL_{node.name or out}")
                for a in node.attribute:
                    qlc.attribute.append(a)
                new_nodes.append(qlc)
                new_nodes.append(O.make_node(
                    "DequantizeLinear", [out + "/qop"] + ynames, [out],
                    name=f"QLDQ_{out}"))
                converted += 1
                continue
        # unconverted path: QDQ semantics (export_qdq)
        node.input = [rename.get(i, i) for i in node.input]
        if node.op_type in ("MatMul", "Gemm"):
            node.input = [i if i in init_names else ensure_qdq(i)
                          for i in node.input]
        new_nodes.append(node)
        if node.op_type == "Gemm" and node.output[0] in qp:
            wrap_producer(node)

    # keep a float-rebuilding DequantizeLinear only for quantized
    # initializers some remaining node still reads by the float name
    used = {i for n in new_nodes for i in n.input}
    dq_keep = [dq for name, dq in weight_dq_nodes.items() if name in used]
    out_names = {o.name for o in g.output}
    dq_keep += [dq for name, dq in weight_dq_nodes.items()
                if name in out_names and name not in used]

    model.graph.node = dq_keep + new_nodes
    model.graph.initializer = new_inits + extra_inits
    return model


def save_qmodel_qoperator(qmodel: QModel, path,
                          source_onnx: O.ModelProto) -> None:
    """export_qoperator + save: one QOperator-format ONNX file."""
    O.save(export_qoperator(qmodel, source_onnx), path)


def merge_calibration_stats(*stats_dicts: dict) -> dict:
    """Merge {value name: (min, max)} dicts from several calibration
    batches into one running global min/max (the reductions are
    associative, so batch-at-a-time calibration equals one big batch --
    same semantics as the reference's global reduction,
    numpy_quant/model.py:332-336)."""
    merged: dict = {}
    for stats in stats_dicts:
        for name, (mn, mx) in stats.items():
            if name in merged:
                omn, omx = merged[name]
                merged[name] = (np.minimum(omn, mn), np.maximum(omx, mx))
            else:
                merged[name] = (np.float32(mn), np.float32(mx))
    return merged

"""Builder/conversion helpers over our ONNX messages.

API mirrors the subset of ``onnx.helper`` / ``onnx.numpy_helper`` the
reference relies on (reference: numpy_quant/model.py:57-62,249-292), so
graphs built here are interchangeable with ones produced by the real
onnx package.
"""
from __future__ import annotations

import numpy as np

from .proto import (
    AttributeProto,
    GraphProto,
    ModelProto,
    NodeProto,
    OperatorSetIdProto,
    StringStringEntryProto,
    TensorProto,
    TensorShapeProto,
    TensorTypeProto,
    TypeProto,
    ValueInfoProto,
    Dimension,
)

# TensorProto.DataType <-> numpy dtype
TENSOR_TYPE_TO_NP_TYPE = {
    TensorProto.FLOAT: np.dtype("float32"),
    TensorProto.UINT8: np.dtype("uint8"),
    TensorProto.INT8: np.dtype("int8"),
    TensorProto.UINT16: np.dtype("uint16"),
    TensorProto.INT16: np.dtype("int16"),
    TensorProto.INT32: np.dtype("int32"),
    TensorProto.INT64: np.dtype("int64"),
    TensorProto.BOOL: np.dtype("bool"),
    TensorProto.FLOAT16: np.dtype("float16"),
    TensorProto.DOUBLE: np.dtype("float64"),
    TensorProto.UINT32: np.dtype("uint32"),
    TensorProto.UINT64: np.dtype("uint64"),
}
NP_TYPE_TO_TENSOR_TYPE = {v: k for k, v in TENSOR_TYPE_TO_NP_TYPE.items()}


def np_dtype_to_tensor_dtype(dtype: np.dtype) -> int:
    return NP_TYPE_TO_TENSOR_TYPE[np.dtype(dtype)]


def tensor_dtype_to_np_dtype(data_type: int) -> np.dtype:
    return TENSOR_TYPE_TO_NP_TYPE[data_type]


# ---------------------------------------------------------------------------
# numpy <-> TensorProto
# ---------------------------------------------------------------------------

def from_array(arr: np.ndarray, name: str = "") -> TensorProto:
    arr = np.asarray(arr)
    t = TensorProto()
    t.name = name
    t.dims = list(arr.shape)
    t.data_type = np_dtype_to_tensor_dtype(arr.dtype)
    # Always raw little-endian payload (what torch/onnx exporters emit).
    data = arr.astype(arr.dtype.newbyteorder("<"), copy=False)
    t.raw_data = np.ascontiguousarray(data).tobytes()
    return t


def to_array(tensor: TensorProto) -> np.ndarray:
    dtype = tensor_dtype_to_np_dtype(tensor.data_type)
    shape = tuple(tensor.dims)
    if tensor.raw_data:
        arr = np.frombuffer(tensor.raw_data, dtype=dtype.newbyteorder("<"))
        return arr.astype(dtype, copy=False).reshape(shape)
    if tensor.data_type == TensorProto.FLOAT and len(tensor.float_data):
        return np.array(tensor.float_data, dtype=np.float32).reshape(shape)
    if tensor.data_type == TensorProto.DOUBLE and len(tensor.double_data):
        return np.array(tensor.double_data, dtype=np.float64).reshape(shape)
    if tensor.data_type == TensorProto.INT64 and len(tensor.int64_data):
        return np.array(tensor.int64_data, dtype=np.int64).reshape(shape)
    if tensor.data_type in (TensorProto.INT32, TensorProto.INT16, TensorProto.INT8,
                            TensorProto.UINT16, TensorProto.UINT8, TensorProto.BOOL) \
            and len(tensor.int32_data):
        return np.array(tensor.int32_data, dtype=np.int32).astype(dtype).reshape(shape)
    # Empty tensor
    return np.zeros(shape, dtype=dtype)


# ---------------------------------------------------------------------------
# Attribute helpers
# ---------------------------------------------------------------------------

def make_attribute(name: str, value) -> AttributeProto:
    a = AttributeProto()
    a.name = name
    if isinstance(value, TensorProto):
        a.t = value
        a.type = AttributeProto.TENSOR
    elif isinstance(value, np.ndarray):
        a.t = from_array(value)
        a.type = AttributeProto.TENSOR
    elif isinstance(value, GraphProto):
        a.g = value
        a.type = AttributeProto.GRAPH
    elif isinstance(value, bool):
        a.i = int(value)
        a.type = AttributeProto.INT
    elif isinstance(value, (int, np.integer)):
        a.i = int(value)
        a.type = AttributeProto.INT
    elif isinstance(value, (float, np.floating)):
        a.f = float(value)
        a.type = AttributeProto.FLOAT
    elif isinstance(value, str):
        a.s = value.encode("utf-8")
        a.type = AttributeProto.STRING
    elif isinstance(value, bytes):
        a.s = value
        a.type = AttributeProto.STRING
    elif isinstance(value, (list, tuple)):
        values = list(value)
        if all(isinstance(v, (int, np.integer)) for v in values):
            a.ints = [int(v) for v in values]
            a.type = AttributeProto.INTS
        elif all(isinstance(v, (int, float, np.integer, np.floating)) for v in values):
            a.floats = [float(v) for v in values]
            a.type = AttributeProto.FLOATS
        elif all(isinstance(v, str) for v in values):
            a.strings = values
            a.type = AttributeProto.STRINGS
        else:
            raise ValueError(f"unsupported attribute list for {name}: {values!r}")
    else:
        raise ValueError(f"unsupported attribute value for {name}: {value!r}")
    return a


def get_attribute_value(attr: AttributeProto):
    if attr.type == AttributeProto.FLOAT:
        return attr.f
    if attr.type == AttributeProto.INT:
        return attr.i
    if attr.type == AttributeProto.STRING:
        return attr.s
    if attr.type == AttributeProto.TENSOR:
        return attr.t
    if attr.type == AttributeProto.GRAPH:
        return attr.g
    if attr.type == AttributeProto.FLOATS:
        return list(attr.floats)
    if attr.type == AttributeProto.INTS:
        return list(attr.ints)
    if attr.type == AttributeProto.STRINGS:
        return list(attr.strings)
    raise ValueError(f"unsupported attribute type {attr.type}")


# ---------------------------------------------------------------------------
# Graph construction
# ---------------------------------------------------------------------------

def make_node(op_type: str, inputs: list[str], outputs: list[str],
              name: str = "", **attrs) -> NodeProto:
    n = NodeProto()
    n.op_type = op_type
    n.input = list(inputs)
    n.output = list(outputs)
    n.name = name or f"{op_type}_{outputs[0] if outputs else ''}"
    n.attribute = [make_attribute(k, v) for k, v in sorted(attrs.items())
                   if v is not None]
    return n


def make_tensor_value_info(name: str, elem_type: int,
                           shape=None) -> ValueInfoProto:
    vi = ValueInfoProto()
    vi.name = name
    tt = TensorTypeProto()
    tt.elem_type = elem_type
    if shape is not None:
        sp = TensorShapeProto()
        for d in shape:
            dim = Dimension()
            if isinstance(d, str):
                dim.dim_param = d
            elif d is not None:
                dim.dim_value = int(d)
            sp.dim.append(dim)
        tt.shape = sp
    tp = TypeProto()
    tp.tensor_type = tt
    vi.type = tp
    return vi


def make_graph(nodes, name, inputs, outputs, initializer=None,
               value_info=None) -> GraphProto:
    g = GraphProto()
    g.node = list(nodes)
    g.name = name
    g.input = list(inputs)
    g.output = list(outputs)
    g.initializer = list(initializer or [])
    g.value_info = list(value_info or [])
    return g


def make_opsetid(domain: str, version: int) -> OperatorSetIdProto:
    o = OperatorSetIdProto()
    o.domain = domain
    o.version = version
    return o


def make_model(graph: GraphProto, producer_name: str = "numpy-quant-tpu",
               opset_imports=None, ir_version: int = 8) -> ModelProto:
    m = ModelProto()
    m.ir_version = ir_version
    m.producer_name = producer_name
    m.graph = graph
    m.opset_import = list(opset_imports) if opset_imports else [make_opsetid("", 17)]
    return m


# ---------------------------------------------------------------------------
# IO
# ---------------------------------------------------------------------------

def _walk_graphs(graph):
    """Yield ``graph`` and every control-flow subgraph under it."""
    yield graph
    for node in graph.node:
        for attr in node.attribute:
            if getattr(attr, "g", None) is not None \
                    and getattr(attr.g, "node", None) is not None:
                yield from _walk_graphs(attr.g)
            for sub in getattr(attr, "graphs", []) or []:
                yield from _walk_graphs(sub)


def _resolve_external_data(model: ModelProto, base_dir: str) -> int:
    """Inline externally-stored tensor payloads (data_location ==
    EXTERNAL, the format real >2GB HF exports use): read the
    location/offset/length window from the side file relative to
    ``base_dir`` into raw_data. Returns the number resolved."""
    import os

    resolved = 0
    for g in _walk_graphs(model.graph):
        for t in g.initializer:
            if getattr(t, "data_location", 0) != TensorProto.EXTERNAL:
                continue
            info = {e.key: e.value for e in t.external_data}
            if "location" not in info:
                raise ValueError(
                    f"initializer {t.name!r} is external but carries no "
                    "location entry")
            fpath = os.path.join(base_dir, info["location"])
            # realpath: a symlink inside the dir must not escape either
            if os.path.commonpath(
                    [os.path.realpath(fpath),
                     os.path.realpath(base_dir or ".")]) \
                    != os.path.realpath(base_dir or "."):
                raise ValueError(
                    f"external location {info['location']!r} escapes the "
                    "model directory")
            offset = int(info.get("offset", 0))
            length = int(info.get("length", -1))
            with open(fpath, "rb") as f:
                f.seek(offset)
                t.raw_data = f.read() if length < 0 else f.read(length)
            t.data_location = TensorProto.DEFAULT
            t.external_data = []
            resolved += 1
    return resolved


def load(path) -> ModelProto:
    import os

    with open(path, "rb") as f:
        m = load_from_string(f.read())
    _resolve_external_data(m, os.path.dirname(os.path.abspath(path)))
    return m


def load_from_string(data: bytes) -> ModelProto:
    m = ModelProto()
    m.ParseFromString(data)
    return m


def save(model: ModelProto, path,
         external_data_threshold: int = None) -> None:
    """Write the model; with ``external_data_threshold`` (bytes), move
    every initializer payload at least that large into a single
    ``<path>.data`` side file (offset/length entries, the standard ONNX
    external-data format) so the .onnx itself stays small -- the layout
    real >2GB exports require. ``load`` transparently inlines it back."""
    import os

    if external_data_threshold is not None:
        model = ModelProto().ParseFromString(model.SerializeToString())
        data_name = os.path.basename(str(path)) + ".data"
        data_path = os.path.join(os.path.dirname(os.path.abspath(path)),
                                 data_name)
        offset = 0
        chunks = []
        for g in _walk_graphs(model.graph):
            for t in g.initializer:
                if not t.raw_data and tuple(t.dims):
                    # typed-field payloads (float_data/...) externalize
                    # too once converted to raw bytes
                    arr = to_array(t)
                    if arr.nbytes >= external_data_threshold:
                        t.raw_data = arr.tobytes()
                        t.float_data = []
                        t.int32_data = []
                        t.int64_data = []
                        t.double_data = []
                if len(t.raw_data) < external_data_threshold:
                    continue
                entries = [("location", data_name),
                           ("offset", str(offset)),
                           ("length", str(len(t.raw_data)))]
                t.external_data = [
                    StringStringEntryProto(key=k, value=v)
                    for k, v in entries]
                t.data_location = TensorProto.EXTERNAL
                chunks.append(t.raw_data)
                offset += len(t.raw_data)
                t.raw_data = b""
        if chunks:  # no side file when nothing crossed the threshold
            with open(data_path, "wb") as f:
                for c in chunks:
                    f.write(c)
    with open(path, "wb") as f:
        f.write(model.SerializeToString())


def strip_weights(model: ModelProto) -> ModelProto:
    """Drop initializer payloads, keeping names/dims/dtypes -- weightless
    graph files for structure inspection (the reference commits such
    files, models/vit/*_no_weights.onnx)."""
    out = ModelProto()
    out.ParseFromString(model.SerializeToString())
    for t in out.graph.initializer:
        t.raw_data = b""
        t.float_data = []
        t.int32_data = []
        t.int64_data = []
    return out


def value_info_shape(vi: ValueInfoProto) -> tuple:
    """Static shape of a ValueInfoProto; dim_param entries come back as str."""
    tt = vi.type.tensor_type if vi.type else None
    if tt is None or tt.shape is None:
        return ()
    out = []
    for d in tt.shape.dim:
        out.append(d.dim_param if d.dim_param else int(d.dim_value))
    return tuple(out)


def make_dim_param_fixed(graph: GraphProto, dim_param: str, value: int) -> None:
    """Pin a symbolic dimension to a constant (mirrors onnxruntime's utility,
    reference: test/long_running/test_vit.py:117)."""
    for vi in list(graph.input) + list(graph.output) + list(graph.value_info):
        tt = vi.type.tensor_type if vi.type else None
        if tt is None or tt.shape is None:
            continue
        for d in tt.shape.dim:
            if d.dim_param == dim_param:
                d.dim_param = ""
                d.dim_value = value

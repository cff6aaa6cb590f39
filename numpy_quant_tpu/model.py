"""Model / QModel: ONNX graph import, execution, calibration and PTQ.

Capability-parity with the reference graph layer
(reference: numpy_quant/model.py:216-565), redesigned for XLA:

* ``Model.from_onnx`` imports the graph once; ``__call__`` lowers the
  whole node walk into ONE jitted function per input signature (shapes
  are static, shape-domain values constant-fold via host ITensors) --
  instead of the reference's per-node interpreter loop.
* ``profile=True`` / ``record=True`` run the same node walk eagerly,
  populating per-op-type wall times and per-value ``.data`` exactly like
  the reference executors (model.py:294-326, 486-565).
* ``Model.quantize`` runs a single jitted calibration pass that returns
  global min/max for every value (on device), then applies the
  reference's per-node parameter strategy (model.py:328-442).
* ``QModel.__call__`` quantizes float inputs of MatMul/Gemm on the fly
  ("TinyqQuant"), dequantizes quantized inputs of every other op
  ("TinyqDequant"), requantizes Gemm outputs, and dequantizes quantized
  graph outputs (model.py:486-565) -- all inside one jitted function on
  the fast path, leaving XLA to fuse the boundary conversions into the
  int8 MXU matmuls.
"""
from __future__ import annotations

from time import time
from typing import Any, List

import jax
import numpy as np

from . import onnx as onnx_lib
from .graph import Constant, Node, Value, Variable, import_onnx
from .ops.registry import onnx_operator_implementation
from .quantization import quant_parameters
from .tensor import (
    DITensor,
    FTensor,
    ITensor,
    PackedQTensor,
    QTensor,
    Tensor,
    quantize_tensor,
)


class QuantizationParams:
    """(scale, zero_point) record. reference: numpy_quant/model.py:445-451."""

    def __init__(self, scale, zero_point):
        self.scale = scale
        self.zero_point = zero_point

    def __repr__(self):
        return f"QuantizationParams(scale={self.scale}, zero_point={self.zero_point})"


def _static_key(arr: np.ndarray) -> tuple:
    return (arr.shape, arr.tobytes())


def _np_dtype(arr) -> np.dtype:
    return np.dtype(str(arr.dtype))


class _ScopeChain:
    """Name-lookup view over nested control-flow scopes (inner subgraph
    first, then the enclosing environment) -- the capture chain for
    nested If/Loop bodies."""

    def __init__(self, inner, outer):
        self._inner, self._outer = inner, outer

    def __getitem__(self, name):
        try:
            return self._inner[name]
        except KeyError:
            return self._outer[name]


class Model:
    def __init__(self, nodes: list[Node], values: list[Value],
                 inputs: List[Variable], outputs: List[Value]):
        self.nodes = nodes
        self.values = values
        self.inputs = inputs
        self.outputs = outputs
        self._jit_cache: dict = {}
        self._ring_state: dict = {}
        self._dp_cache = None
        self._dp_cache_key = None
        # Multi-chip execution (set via parallel.shard_model): mesh +
        # shardings; XLA GSPMD inserts the collectives.
        self.mesh = None
        self.data_axis = None
        self.parameter_shardings = None
        self._sharded_param_cache = None

    def __repr__(self):
        return (f"{type(self).__name__}(nodes={self.nodes}, values={self.values}, "
                f"inputs={self.inputs}, outputs={self.outputs})")

    def __del__(self):
        # Break node<->value links so large arrays free without waiting
        # for the cycle collector (reference: numpy_quant/model.py:236-247).
        try:
            for node in getattr(self, "nodes", []):
                node.inputs = []
                node.outputs = []
            for value in getattr(self, "values", []):
                if isinstance(value, Variable):
                    value.inputs = []
                value.outputs = []
        except Exception:
            # interpreter shutdown: module globals (Variable) may already
            # be torn down -- nothing left worth unlinking then
            pass

    @classmethod
    def from_onnx(cls, onnx_model: onnx_lib.ModelProto) -> "Model":
        # Import on the host CPU backend: initializer payloads become
        # HOST-committed arrays, so quantize/optimize/pack (also
        # host_eager) never touch the accelerator, and _placed_params
        # ships the finished payloads in one batched transfer. On a
        # remote-attached chip, TPU-committed payloads made every later
        # eager pass op a synchronous RPC (measured: the round-3 bench
        # spent 596 s in optimize()).
        from .config import host_eager
        with host_eager():
            nodes, values, inputs, outputs = import_onnx(onnx_model)
        return cls(nodes, values, inputs, outputs)

    # ------------------------------------------------------------------
    # Input/constant wrapping (overridden by QModel)
    # ------------------------------------------------------------------

    def _wrap_input(self, array: np.ndarray, variable: Variable) -> Tensor:
        if array.dtype == np.float32:
            return FTensor(jax.numpy.asarray(array))
        if array.dtype == np.int64:
            return ITensor(array)
        raise ValueError(f"Array dtype {array.dtype} not supported")

    def _device_params(self) -> dict[str, Any]:
        """Device-resident constant payloads, passed as a jit argument so
        weights are not baked into the compiled HLO as literals.

        Quantized payloads with bit_width <= 8 are stored as int8 (the
        physical HBM layout the MXU consumes) instead of the int32
        semantic container -- 4x less weight traffic, identical values.
        Exact/x64 mode keeps the wide containers for numpy parity.
        """
        import jax.numpy as jnp

        from .quantization import x64_enabled
        from .tensor import PackedQTensor
        from .config import host_eager
        narrow = not x64_enabled()
        cached = getattr(self, "_dp_cache", None)
        if cached is not None and self._dp_cache_key == narrow:
            return cached
        params = {}
        with host_eager():
            # the narrowing astype is an eager per-weight op: run it on
            # the host backend (one RPC per weight over a tunnel
            # otherwise); _placed_params ships the finished dict in one
            # batched transfer
            for value in self.values:
                if isinstance(value, Constant):
                    if isinstance(value.data, QTensor) and narrow \
                            and value.data.bit_width <= 8:
                        params[value.name] = value.data.data.astype(jnp.int8)
                    elif isinstance(value.data, (FTensor, QTensor)):
                        params[value.name] = value.data.data
                    elif isinstance(value.data, PackedQTensor):
                        params[value.name] = (value.data.planes,
                                              value.data.colsum)
                    cs = self._weight_colsum(value)
                    if cs is not None:
                        params[value.name + ".colsum"] = cs
        self._dp_cache = params
        self._dp_cache_key = narrow
        return params

    def _weight_colsum(self, value: Constant):
        """Precomputed q_matmul correction column sums for a 2-D
        quantized weight consumed exclusively as MatMul rhs. The
        reference recomputes these per call (numpy_quantization.py:55);
        they are constants, so reducing them once at parameter-build
        time removes one full weight reduction per matmul per forward --
        identical integers (exact integer sum either way)."""
        import numpy as np

        if not isinstance(value.data, QTensor):
            return None
        qt = value.data
        data = np.asarray(qt.data)
        if data.ndim != 2:
            return None
        if not value.outputs or not all(
                n.op in ("MatMul", "MatMulSplit", "DynamicMatMul")
                and len(n.inputs) > 1
                and n.inputs[1] is value for n in value.outputs):
            return None
        cs = data.astype(np.int64).sum(axis=0, keepdims=True)
        from .quantization import x64_enabled
        if x64_enabled():
            return cs
        if np.abs(cs).max(initial=0) >= 2 ** 31:
            return None  # would overflow the int32 accumulator dtype
        return cs.astype(np.int32)

    def _placed_params(self) -> dict[str, Any]:
        """Device params, placed ONCE (cached): per parameter_shardings
        when a mesh is attached, else one batched transfer of the whole
        dict to the default device. Payloads are built on the host CPU
        backend (config.host_eager), so without the explicit placement
        every jit call would re-upload them."""
        from .quantization import x64_enabled
        narrow = not x64_enabled()
        if self._sharded_param_cache is not None \
                and getattr(self, "_placed_cache_key", None) == narrow:
            return self._sharded_param_cache
        params = self._device_params()
        if self.mesh is not None and self.parameter_shardings is not None:
            placed = {
                name: jax.device_put(arr, self.parameter_shardings[name])
                for name, arr in params.items()}
        else:
            placed = jax.device_put(params, jax.devices()[0])
        self._sharded_param_cache = placed
        self._placed_cache_key = narrow
        return placed

    def _place_input(self, array: np.ndarray):
        """Batch-shard a float input over the mesh data axis."""
        if self.mesh is None or self.data_axis is None:
            return array
        from jax.sharding import NamedSharding, PartitionSpec
        n = self.mesh.shape[self.data_axis]
        if array.ndim == 0 or array.shape[0] % n != 0:
            spec = PartitionSpec()
        else:
            spec = PartitionSpec(self.data_axis, *([None] * (array.ndim - 1)))
        return jax.device_put(array, NamedSharding(self.mesh, spec))

    def _wrap_constant(self, value: Constant, params: dict[str, Any]) -> Tensor:
        from .tensor import PackedQTensor
        data = value.data
        if isinstance(data, FTensor):
            t = FTensor(params[value.name])
            if data.data.size <= 64 or data.data.ndim == 1:
                # host shadow: tiny float constants (Resize scales/roi,
                # Pad values) are shape-domain for some ops -- they must
                # be readable at trace time like ITensors are. 1-D
                # vectors of any size ride along for the QOperator ops'
                # per-channel scales (QLinearConv), read at trace time.
                t.host = np.asarray(data.data, np.float32)
            return t
        if isinstance(data, QTensor):
            return QTensor(params[value.name], data.bit_width, data.scale,
                           data.zero_point,
                           colsum=params.get(value.name + ".colsum"))
        if isinstance(data, PackedQTensor):
            planes, colsum = params[value.name]
            return PackedQTensor(planes, colsum, data.k, data.n,
                                 data.bit_width, data.scale,
                                 layout=data.layout)
        return data  # host ITensor

    # ------------------------------------------------------------------
    # Node walk (shared by tracing and eager execution)
    # ------------------------------------------------------------------

    def _node_inputs(self, node: Node, data: dict[str, Tensor],
                     timings) -> list[Tensor]:
        # None slots = absent optional inputs (positions preserved)
        return [None if v is None else data[v.name] for v in node.inputs]

    def _post_node(self, node: Node, outputs: list[Tensor]) -> list[Tensor]:
        return outputs

    def _profile_buckets(self) -> dict[str, float]:
        return {op: 0.0 for op in {n.op for n in self.nodes}}

    def _forward(self, input_tensors: dict[str, Tensor], params: dict[str, Any],
                 timings=None, record: bool = False) -> dict[str, Tensor]:
        from .ops import registry as _registry

        data: dict[str, Tensor] = {}
        for value in self.values:
            if isinstance(value, Constant):
                data[value.name] = self._wrap_constant(value, params)
        data.update(input_tensors)

        # execution context for mesh-aware ops (Pallas kernels wrap in
        # shard_map under GSPMD; see registry FusedAttention*)
        prev_ctx = _registry._EXEC_MESH
        _registry._EXEC_MESH = (self.mesh, self.data_axis,
                                getattr(self, "model_axis", "model"))
        try:
            for node in self.nodes:
                ins = self._node_inputs(node, data, timings)
                if timings is not None:
                    stime = time()
                    if node.op in ("If", "Loop"):
                        outs = self._exec_subgraph_op(node, ins, data)
                    else:
                        outs = onnx_operator_implementation(node.op, ins,
                                                            node.attrs)
                    outs = self._post_node(node, outs)
                    jax.block_until_ready([t.data for t in outs])
                    timings[node.op] += time() - stime
                else:
                    if node.op in ("If", "Loop"):
                        outs = self._exec_subgraph_op(node, ins, data)
                    else:
                        outs = onnx_operator_implementation(node.op, ins,
                                                            node.attrs)
                    outs = self._post_node(node, outs)
                for o, tensor in zip(node.outputs, outs):
                    data[o.name] = tensor
                    if record:
                        o.data = tensor
        finally:
            _registry._EXEC_MESH = prev_ctx
        if record:
            for variable in self.inputs:
                variable.data = input_tensors.get(variable.name, variable.data)
        return data

    # ------------------------------------------------------------------
    # Control-flow subgraphs (ONNX If / Loop)
    # ------------------------------------------------------------------
    # Executed by TRACE-TIME FOLDING, the same design that makes the
    # host ITensor shape domain jittable: the If condition and the Loop
    # trip count / termination condition must be host-resident (shape
    # math), so branch selection happens while tracing and the chosen
    # branch / unrolled iterations lower into ONE static XLA program.
    # Data-dependent control flow would need lax.cond/while over traced
    # values and is rejected with a clear error. Subgraph bodies run
    # through the same op registry; outer-scope values are captured by
    # name (QTensors dequantize at the boundary -- subgraph compute is
    # float, matching the reference's everything-but-matmul-is-float
    # stance). The reference supports neither op (ValueError,
    # /root/reference/numpy_quant/model.py:213); this is parity-plus.

    def _run_subgraph(self, gproto, outer, input_tensors: list) -> list:
        from .graph import Constant as GConst, import_graph
        from .tensor import QTensor as QT

        nodes, values, g_inputs, g_outputs = import_graph(gproto)
        data: dict[str, Tensor] = {}
        for value in values:
            if isinstance(value, GConst):
                data[value.name] = value.data
        for var, t in zip(g_inputs, input_tensors):
            data[var.name] = t

        def get(name):
            if name in data:
                return data[name]
            t = outer[name]  # outer-scope capture by name (ONNX spec)
            if isinstance(t, QT):
                t = t.dequantize()
            data[name] = t
            return t

        for node in nodes:
            ins = [None if v is None else get(v.name) for v in node.inputs]
            if node.op in ("If", "Loop"):  # nested control flow
                outs = self._exec_subgraph_op(node, ins,
                                              _ScopeChain(data, outer))
            else:
                outs = onnx_operator_implementation(node.op, ins,
                                                    node.attrs)
            for o, t in zip(node.outputs, outs):
                data[o.name] = t
        return [get(v.name) for v in g_outputs]

    def _exec_subgraph_op(self, node: Node, ins: list, env) -> list:
        from .tensor import ITensor as IT

        if node.op == "If":
            cond = ins[0]
            if not isinstance(cond, IT):
                raise ValueError(
                    "If condition must be host-resident (shape-domain) "
                    "so the branch folds at trace time; a data-dependent "
                    "condition cannot select a branch inside one jitted "
                    "program")
            taken = bool(np.asarray(cond.data).reshape(()))
            branch = node.attrs["then_branch" if taken else "else_branch"]
            return self._run_subgraph(branch, env, [])

        # Loop(M, cond, v_1..v_N) -> (v_1..v_N, scan_1..scan_K); body
        # subgraph: (iter, cond_in, v...) -> (cond_out, v..., scan...)
        body = node.attrs["body"]
        m = ins[0] if len(ins) > 0 else None
        cond = ins[1] if len(ins) > 1 else None
        carried = list(ins[2:])
        n_carried = len(carried)
        n_scan = len(node.outputs) - n_carried
        for t, what in ((m, "trip count"), (cond, "initial condition")):
            if t is not None and not isinstance(t, IT):
                raise ValueError(
                    f"Loop {what} must be host-resident so the loop "
                    "unrolls at trace time (static shapes under jit)")
        cap = 10_000
        max_iters = cap if m is None else int(np.asarray(m.data).reshape(()))
        cond_val = True if cond is None \
            else bool(np.asarray(cond.data).reshape(()))
        scans = [[] for _ in range(n_scan)]
        it = 0
        while cond_val and it < max_iters:
            outs = self._run_subgraph(
                body, env,
                [IT(np.array(it, np.int64)),
                 IT(np.array(int(cond_val), np.int64))] + carried)
            cond_out = outs[0]
            carried = list(outs[1:1 + n_carried])
            for buf, t in zip(scans, outs[1 + n_carried:]):
                buf.append(t)
            if not isinstance(cond_out, IT):
                raise ValueError(
                    "data-dependent Loop termination is not supported: "
                    "the body's cond output must stay host-resident so "
                    "the unrolled program has a static iteration count")
            cond_val = bool(np.asarray(cond_out.data).reshape(()))
            it += 1
        if m is None and cond_val and it >= cap:
            raise ValueError(f"Loop exceeded {cap} host iterations")
        if n_scan and it == 0:
            raise ValueError("Loop with scan outputs ran zero "
                             "iterations; the scan shape is undefined")
        from .tensor import FTensor as FT
        stacked = []
        for buf in scans:
            if all(isinstance(t, IT) for t in buf):
                stacked.append(IT(np.stack([np.asarray(t.data)
                                            for t in buf], 0)))
            else:
                stacked.append(FT(jax.numpy.stack(
                    [jax.numpy.asarray(t.data) for t in buf], 0)))
        return carried + stacked

    # ------------------------------------------------------------------
    # Output conversion (overridden by QModel)
    # ------------------------------------------------------------------

    def _finalize_output(self, tensor: Tensor):
        data = tensor.data
        if hasattr(data, "dtype") and data.dtype == jax.numpy.bfloat16:
            return data.astype(jax.numpy.float32)
        return data

    # ------------------------------------------------------------------
    # Execution
    # ------------------------------------------------------------------

    def __call__(self, inputs: List[np.ndarray], profile: bool = False,
                 record: bool = False, as_numpy: bool = True):
        """Run the model. Fast path is one jitted function per input
        signature. ``profile=True`` runs eagerly and returns
        (outputs, per-op-type seconds) like the reference executors;
        ``record=True`` also populates ``value.data`` on the graph.

        Inputs may be numpy OR device-resident jax arrays -- device
        arrays enter the jitted program with no host round-trip.
        ``as_numpy=False`` returns device arrays (serving fast path:
        no blocking device->host transfer of the outputs).
        """
        # int64 inputs are shape-domain: they must be host values
        # (static under jit). Float inputs stay wherever they live.
        arrays = [np.asarray(a) if _np_dtype(a) == np.int64 else a
                  for a in inputs]

        if profile or record:
            input_tensors = {v.name: self._wrap_input(a, v)
                             for a, v in zip(arrays, self.inputs)}
            timings = self._profile_buckets() if profile else None
            # placed (not raw) params: payloads are HOST-committed after
            # from_onnx/quantize (host_eager); placing them keeps every
            # eager op on ONE device alongside the wrapped inputs
            data = self._forward(input_tensors, self._placed_params(),
                                 timings=timings, record=record)
            outs = [np.asarray(self._finalize_output(data[o.name]))
                    for o in self.outputs]
            if profile:
                return outs, timings
            return outs

        float_idx = [i for i, a in enumerate(arrays)
                     if _np_dtype(a) != np.int64]
        int_idx = [i for i, a in enumerate(arrays) if _np_dtype(a) == np.int64]
        key = (
            tuple((i, tuple(arrays[i].shape), str(arrays[i].dtype))
                  for i in float_idx),
            tuple((i, _static_key(arrays[i])) for i in int_idx),
            bool(jax.config.jax_enable_x64),
        )
        if key not in self._jit_cache:
            int_consts = {i: arrays[i].copy() for i in int_idx}
            # weakref: the cached closure must not keep the model alive,
            # so __del__'s link-breaking still runs without the cycle
            # collector (reference: numpy_quant/model.py:236-247).
            import weakref
            model = weakref.proxy(self)

            def fn(float_args: list, params: dict[str, Any]):
                input_tensors = {}
                fa = iter(float_args)
                for i, variable in enumerate(model.inputs):
                    if i in int_consts:
                        input_tensors[variable.name] = ITensor(int_consts[i])
                    else:
                        input_tensors[variable.name] = model._wrap_input_traced(
                            next(fa), variable)
                data = model._forward(input_tensors, params)
                return [model._finalize_output(data[o.name]) for o in model.outputs]

            self._jit_cache[key] = jax.jit(fn)
        outs = self._jit_cache[key](
            [self._place_input(arrays[i]) for i in float_idx],
            self._placed_params())
        if as_numpy:
            return [np.asarray(o) for o in outs]
        return outs

    def _wrap_input_traced(self, array, variable: Variable) -> Tensor:
        return self._wrap_input(array, variable)

    def lowered_fn(self):
        """The model as a pure jittable function
        ``fn(float_inputs: list, params: dict) -> list`` (float inputs
        only; int64/shape inputs must be bound via __call__)."""
        import weakref
        model = weakref.proxy(self)

        def fn(float_args: list, params: dict[str, Any]):
            input_tensors = {}
            fa = iter(float_args)
            for variable in model.inputs:
                input_tensors[variable.name] = model._wrap_input_traced(
                    next(fa), variable)
            data = model._forward(input_tensors, params)
            return [model._finalize_output(data[o.name]) for o in model.outputs]

        return fn

    def _infer_shapes(self):
        """Static shapes of every graph value, from ONE abstract trace
        (``jax.eval_shape`` -- no compile, no FLOPs) of the model over
        the inputs' imported ValueInfo shape hints (symbolic dims
        become 2). Returns ``{value_name: shape tuple}``, or None when
        hints are missing, an input is shape-domain (int64 inputs must
        be concrete at trace time), or the abstract trace fails --
        callers treat None as "shape-dependent passes don't apply"."""
        import jax.numpy as jnp

        hints = []
        for v in self.inputs:
            h = getattr(v, "shape_hint", None)
            if h is None or getattr(v, "dtype_hint", None) != 1:  # FLOAT
                return None
            hints.append(tuple(2 if not d else int(d) for d in h))
        shapes: dict[str, tuple] = {}

        def probe(float_args, params):
            input_tensors = {
                v.name: self._wrap_input_traced(a, v)
                for a, v in zip(float_args, self.inputs)}
            data = self._forward(input_tensors, params)
            for name, t in data.items():
                d = getattr(t, "data", None)
                if d is not None and hasattr(d, "shape"):
                    shapes[name] = tuple(int(s) for s in d.shape)
            return 0

        args = [jax.ShapeDtypeStruct(h, jnp.float32) for h in hints]
        try:
            jax.eval_shape(probe, args, self._device_params())
        except Exception:
            return None
        return shapes

    def smooth_outliers(self, inputs, alpha: float = 0.5) -> int:
        """SmoothQuant-style activation-outlier migration (Xiao et al.,
        arXiv:2211.10438): an exact reparameterization that divides
        each LayerNormalization output by a per-channel factor (folded
        into gamma/beta) and multiplies the consuming MatMul/Gemm
        weights back -- same float function, flatter activation ranges,
        so per-tensor activation quantization wastes fewer levels on
        outlier channels. Run on the FLOAT model before ``quantize``.
        Returns the number of smoothed LN groups. See
        numpy_quant_tpu/smoothquant.py."""
        from .smoothquant import smooth_outliers
        return smooth_outliers(self, inputs, alpha=alpha)

    def rotate_vo(self, seed: int = 0) -> int:
        """QuaRot-style orthogonal rotation of every attention's V/O
        projection pair (Ashkboos et al., arXiv:2404.00456): an exact
        data-free reparameterization (V' = V R, W_o' = R^T W_o per
        head) that spreads V-channel outliers across all lanes, so
        per-TENSOR quantization of the v/o weights stops being set by
        one wide channel. Run on the FLOAT model before ``quantize`` /
        ``quantize_weights``. Returns the number of attentions rotated.
        See numpy_quant_tpu/rotate.py."""
        from .rotate import rotate_vo
        return rotate_vo(self, seed=seed)

    def awq_scale_weights(self, inputs, bit_width: int = 4,
                          group_size: int = None, n_grid: int = 20,
                          **kw) -> dict:
        """AWQ-style activation-aware weight scaling (Lin et al.,
        arXiv:2306.00978): the same exact LN-to-weights
        reparameterization as ``smooth_outliers``, but the per-group
        exponent is GRID-SEARCHED to minimize the actual weight-only
        reconstruction error ``||(x/s) @ fakequant(W*s) - x @ W||^2``
        on calibration activations (alpha = 0 is in the grid, so no
        group gets worse). Run on the FLOAT model BEFORE
        ``quantize_weights`` with the same ``bit_width``/``group_size``.
        Pass the same ``per_channel=``/``group_size=`` you will give
        quantize_weights -- the search replicates its exact scale
        choice per weight (grouping eligibility included).
        Returns {ln_node_name: best_alpha}. See numpy_quant_tpu/awq.py."""
        from .awq import awq_scale_weights
        return awq_scale_weights(self, inputs, bit_width=bit_width,
                                 group_size=group_size, n_grid=n_grid,
                                 **kw)

    def equalize(self, iterations: int = 2) -> int:
        """Cross-layer equalization (Nagel et al., arXiv:1906.04721):
        DATA-FREE exact rescaling that balances per-channel weight
        ranges across consecutive Conv/MatMul/Gemm layers joined by
        ReLU/MaxPool chains -- per-tensor weight quantization then
        stops being set by a single wide channel. Run on the FLOAT
        model before ``quantize``. Returns the pairs equalized per
        sweep. See numpy_quant_tpu/equalize.py."""
        from .equalize import equalize
        return equalize(self, iterations=iterations)

    def fold_batchnorm(self) -> int:
        """Fold inference-mode BatchNormalization nodes into the
        preceding constant-weight Conv/Gemm (W' = W*k, b' = b*k + shift
        with k = gamma/sqrt(var+eps)) -- the standard PTQ preparation
        for BN networks (ResNet-style exports). Exact float
        reparameterization; run before ``quantize``. Returns the number
        of BN nodes folded. See numpy_quant_tpu/bnfold.py."""
        from .bnfold import fold_batchnorm
        return fold_batchnorm(self)

    def fuse_decode_attention(self) -> int:
        """Fuse KV-cache decode-step attention chains ([B,1,H] query,
        scores over [cache | current], slice/context) into single
        DecodeAttention nodes -- float dots with the cache dequantize
        fused into the operands, eliminating the per-step
        zero-point-correction reduces over the whole cache and the
        per-dot kernel zoo at M=1. Works on float models and QModels;
        on QModels, ulp-equal (not bit-identical: the dots run f32).
        Returns the number fused. See passes/decode_attention.py."""
        from .passes.decode_attention import fuse_decode_attention
        return fuse_decode_attention(self)

    def map_batches(self, inputs: List[np.ndarray], as_numpy: bool = True):
        """Throughput inference over a leading STEPS axis: all steps in
        ONE device program (``lax.scan``), a single host sync -- the
        production serving shape bench.py measures. See serving.py."""
        from .serving import map_batches
        return map_batches(self, inputs, as_numpy=as_numpy)

    def serve_stream(self, batches, depth: int = 2, as_numpy: bool = True):
        """Pipelined online request-stream inference: a generator
        keeping up to ``depth`` forwards in flight. See serving.py."""
        from .serving import serve_stream
        return serve_stream(self, batches, depth=depth, as_numpy=as_numpy)

    def serve_ring(self, batches, probe: bool = True):
        """Persistent device serving loop (ONE dispatched program
        pulling batches through host callbacks), GATED behind the
        ``serving.ring_supported()`` runtime probe: runtimes that
        cannot complete loop-embedded callbacks (remote-attached
        chips) get a RuntimeError instead of a hang. Niche shape --
        on most deployments ``map_batches``/``serve_stream`` measure
        faster. See serving.py and docs/DEPLOYMENT.md."""
        from .serving import serve_ring
        return serve_ring(self, batches, probe=probe)

    def _place_batched_input(self, array):
        """Shard a [steps, batch, ...] input over the mesh data axis
        (axis 1 -- the per-step batch)."""
        if self.mesh is None or self.data_axis is None:
            return array
        from jax.sharding import NamedSharding, PartitionSpec
        n = self.mesh.shape[self.data_axis]
        if array.ndim < 2 or array.shape[1] % n != 0:
            spec = PartitionSpec()
        else:
            spec = PartitionSpec(None, self.data_axis,
                                 *([None] * (array.ndim - 2)))
        return jax.device_put(array, NamedSharding(self.mesh, spec))

    # ------------------------------------------------------------------
    # Calibration + PTQ pass
    # ------------------------------------------------------------------

    def calibration_stats(self, inputs: List[np.ndarray],
                          mode: str = "auto", percentile: float = None):
        """Global min/max per value name, computed on device (the
        reference runs a full float forward and reduces on host,
        numpy_quant/model.py:329-336; same semantics: GLOBAL reduction).

        mode:
          'jit'   -- one jitted pass: the forward AND every reduction
                     compile into a single XLA program (fastest to run,
                     but a ~600-output HLO compiles slowly for big
                     graphs).
          'eager' -- eager node walk + per-value reductions; no large
                     compile. Right choice for one-shot calibration of
                     large graphs.
          'auto'  -- 'jit' below 150 nodes, else 'eager'.

        ``percentile`` (parity-plus; the reference knows only min/max):
        clip ACTIVATION ranges to the [100-p, p] percentiles (e.g.
        99.9), discarding outliers that would otherwise stretch the
        scale and waste quantization levels. Constants (weights) keep
        exact min/max -- clipping weights changes the stored model.
        """
        if mode == "auto":
            # a mesh forces jit: eagerly dispatching hundreds of sharded
            # ops issues GSPMD collectives from concurrent host threads,
            # which can deadlock the rendezvous on some backends --
            # one compiled program has a single well-ordered schedule
            if self.mesh is not None:
                mode = "jit"
            else:
                mode = "jit" if len(self.nodes) < 150 else "eager"
        arrays = [np.asarray(a) for a in inputs]
        device_names: list[str] = []
        host_stats: dict[str, tuple[float, float]] = {}
        const_names = {v.name for v in self.values if isinstance(v, Constant)}
        if percentile is not None:
            assert 50.0 < percentile <= 100.0, percentile
            q_hi = np.float32(percentile / 100.0)
            q_lo = np.float32(1.0 - percentile / 100.0)

        def fn(float_args: list, params: dict[str, Any]):
            input_tensors = {}
            fa = iter(float_args)
            for a, variable in zip(arrays, self.inputs):
                if a.dtype == np.int64:
                    input_tensors[variable.name] = ITensor(a)
                else:
                    input_tensors[variable.name] = FTensor(next(fa))
            data = self._forward(input_tensors, params)
            mins, maxs = [], []
            device_names.clear()
            host_stats.clear()
            for name, tensor in data.items():
                if isinstance(tensor, ITensor):
                    host_stats[name] = (float(tensor.data.min()),
                                        float(tensor.data.max()))
                else:
                    device_names.append(name)
                    flat = tensor.data.astype(jax.numpy.float32)
                    if percentile is not None and name not in const_names:
                        lo = jax.numpy.quantile(flat.reshape(-1), q_lo)
                        hi = jax.numpy.quantile(flat.reshape(-1), q_hi)
                    else:
                        lo = jax.numpy.min(flat)
                        hi = jax.numpy.max(flat)
                    mins.append(lo)
                    maxs.append(hi)
            return jax.numpy.stack(mins), jax.numpy.stack(maxs)

        float_args = [self._place_input(a) for a in arrays
                      if a.dtype != np.int64]
        if mode == "jit":
            mins, maxs = jax.jit(fn)(float_args, self._placed_params())
        else:
            mins, maxs = fn(float_args, self._placed_params())
        mins = np.asarray(mins)
        maxs = np.asarray(maxs)
        stats = {name: (np.float32(mins[i]), np.float32(maxs[i]))
                 for i, name in enumerate(device_names)}
        stats.update({k: (np.float32(v[0]), np.float32(v[1]))
                      for k, v in host_stats.items()})
        return stats

    def quantize(self, calibration_inputs: list[np.ndarray] = None,
                 bit_width: int = 8, calibration_mode: str = "auto",
                 stats: dict = None, quantize_conv: bool = False,
                 per_channel_weights: bool = False,
                 weight_bit_width: int = None,
                 percentile: float = None) -> "QModel":
        """Post-training quantization. Per-node parameter strategy follows
        reference: numpy_quant/model.py:328-442.

        ``stats``: optional precomputed {value name: (min, max)} dict
        (from calibration_stats), enabling calibration reuse across
        processes/deployments. When given, calibration_inputs is unused.

        ``quantize_conv``: run Conv nodes on the integer path too
        (im2col + int8 MXU matmul). Parity-plus: the reference executes
        quantized-graph Conv in float (SURVEY.md §3.4).

        ``per_channel_weights``: symmetric per-output-channel scales for
        2-D MatMul/Gemm weights (parity-plus; BASELINE.md config #4) --
        markedly better accuracy at low bit widths.

        ``weight_bit_width``: quantize weights/constants at a LOWER bit
        width than activations (W4A8-style mixed precision,
        parity-plus: the reference asserts equal operand widths,
        tensor.py:206). Sub-byte weights pack to exactly that many bits
        in HBM via pack_weights() while activations keep the accuracy
        of ``bit_width``. A dict ``{weight name: bits}`` assigns
        PER-WEIGHT widths (unlisted weights keep ``bit_width``) -- the
        sensitivity-planned mixed precision of
        utils.sensitivity.plan_mixed_precision.

        ``percentile``: percentile-clipped activation calibration
        (see calibration_stats) -- outlier-robust scales, markedly
        better at low bit widths.
        """
        if stats is None:
            stats = self.calibration_stats(calibration_inputs,
                                           mode=calibration_mode,
                                           percentile=percentile)
        # Weight quantization is many small EAGER ops; keep them on
        # the host CPU backend (config.host_eager): on a remote-
        # attached chip each eager op is an RPC round trip. The
        # finished payloads move to the device in ONE batched
        # transfer at _placed_params time. Bit-identical: quantize
        # is IEEE-exact f32 divide/rint/clip on either backend.
        from .config import host_eager
        with host_eager():
            node_dict = {node.name: node for node in self.nodes}
            value_dict = {value.name: value for value in self.values}

            wbw_map = weight_bit_width if isinstance(weight_bit_width, dict) \
                else None
            wbw = weight_bit_width \
                if isinstance(weight_bit_width, int) else bit_width

            def qparams_for(name: str, asymmetric: bool,
                            bits: int = None) -> QuantizationParams:
                mn, mx = stats[name]
                scale, zero_point = quant_parameters(
                    mn, mx, bit_width=bits if bits is not None else bit_width,
                    asymmetric=asymmetric)
                return QuantizationParams(scale, zero_point)

            qnodes_dict: dict[str, Node] = {}
            qvalues_dict: dict[str, Value] = {}
            qparams_per_value: dict[str, QuantizationParams] = {}

            # Graph inputs: asymmetric (reference: model.py:349-355).
            for value in self.inputs:
                qvar = Variable(value.name, [], [], None)
                # shape-dependent passes (narrow_gather) re-trace from these
                qvar.shape_hint = getattr(value, "shape_hint", None)
                qvar.dtype_hint = getattr(value, "dtype_hint", None)
                qvalues_dict[value.name] = qvar
                qparams_per_value[value.name] = qparams_for(
                    value.name, isinstance(value, Variable))

            # Constants: symmetric per-tensor (reference: model.py:357-365),
            # or per-output-channel for 2-D matmul weights when requested.
            from .quantization import per_channel_scales

            def _weight_channel_axis(value) -> int | None:
                """Output-channel axis if this constant is used exclusively
                as the weight (input 1) of MatMul/Gemm nodes; else None."""
                if not value.outputs:
                    return None
                axes = set()
                for n in value.outputs:
                    if len(n.inputs) < 2 or n.inputs[1] is not value:
                        return None
                    if n.op == "MatMul":
                        axes.add(1)          # [K, N] -> channels last
                    elif n.op == "Gemm":
                        axes.add(0 if n.attrs.get("transB") else 1)
                    else:
                        return None
                return axes.pop() if len(axes) == 1 else None

            # Float constants feeding only SHAPE-DOMAIN op positions carry
            # graph structure, not data (Resize scales/roi, Pad values):
            # quantizing them would corrupt semantics (and the reference has
            # no such ops). They stay float verbatim.
            def _is_shape_domain_const(value) -> bool:
                return bool(value.outputs) and all(
                    n.op in ("Resize", "Pad") and value is not n.inputs[0]
                    for n in value.outputs)

            for value in self.values:
                if isinstance(value, Constant):
                    if isinstance(value.data, ITensor):
                        qvalues_dict[value.name] = Constant(value.name, [],
                                                            value.data.copy())
                        continue
                    if _is_shape_domain_const(value):
                        qvalues_dict[value.name] = Constant(value.name, [],
                                                            value.data.copy())
                        continue
                    # weight_bit_width applies only to actual matmul weights
                    # (consumed as MatMul/Gemm rhs); other float constants
                    # keep the activation bit width
                    is_weight = bool(value.outputs) and all(
                        n.op in ("MatMul", "Gemm") and len(n.inputs) > 1
                        and n.inputs[1] is value for n in value.outputs)
                    if is_weight:
                        cbw = wbw_map.get(value.name, bit_width) \
                            if wbw_map is not None else wbw
                    else:
                        cbw = bit_width
                    ch_axis = _weight_channel_axis(value) if per_channel_weights \
                        else None
                    if ch_axis is not None and np.asarray(value.data.data).ndim == 2:
                        scale = per_channel_scales(np.asarray(value.data.data),
                                                   cbw, ch_axis)
                        qp = QuantizationParams(scale, None)
                    else:
                        qp = qparams_for(value.name, asymmetric=False, bits=cbw)
                    qvalues_dict[value.name] = Constant(
                        value.name, [],
                        quantize_tensor(value.data, cbw, qp.scale, qp.zero_point))
                    qparams_per_value[value.name] = qp

            # Per-node strategy (reference: model.py:367-425).
            for node in self.nodes:
                def register_out_asym():
                    out_val = node.outputs[0]
                    qvalues_dict[out_val.name] = Variable(out_val.name, [], [], None)
                    qparams_per_value[out_val.name] = qparams_for(out_val.name, True)
                    qnodes_dict[node.name] = Node(node.name, node.op, node.attrs, [], [])

                if node.op == "MatMul":
                    register_out_asym()
                elif node.op == "Gemm":
                    for input_value in node.inputs[:2]:
                        if isinstance(input_value, Variable):
                            qvalues_dict[input_value.name] = Variable(
                                input_value.name, [], [], None)
                            qparams_per_value[input_value.name] = qparams_for(
                                input_value.name, isinstance(input_value, Variable))
                    # Bias: symmetric at scale s1*s2, 4x bit width
                    # (int32 accumulator modelling; reference: model.py:383-389).
                    if len(node.inputs) > 2 and node.inputs[2] is not None:
                        bias = node.inputs[2]
                        qparams1 = qparams_per_value[node.inputs[0].name]
                        qparams2 = qparams_per_value[node.inputs[1].name]
                        bias_scale = qparams1.scale * qparams2.scale
                        # alpha/beta support on the int path (the reference
                        # ignores them, model.py:122-131): alpha folds into
                        # the accumulator scale at runtime (ops/registry.py
                        # Gemm), so the bias -- which is added IN accumulator
                        # units -- quantizes at scale alpha*s1*s2/beta so its
                        # dequantized contribution equals beta*bias.
                        alpha = np.float32(node.attrs.get("alpha", 1.0))
                        beta = np.float32(node.attrs.get("beta", 1.0))
                        if float(beta) != 0.0 and (float(alpha) != 1.0
                                                   or float(beta) != 1.0):
                            bias_scale = bias_scale * alpha / beta
                        if getattr(bias_scale, "ndim", 0) > 0:
                            bias_scale = np.asarray(bias_scale,
                                                    np.float32).reshape(-1)
                        qparams_per_value[bias.name] = QuantizationParams(bias_scale, None)
                        qbias = quantize_tensor(value_dict[bias.name].data,
                                                4 * bit_width, bias_scale, None)
                        qvalues_dict[bias.name] = Constant(bias.name, [], qbias)
                    register_out_asym()
                elif node.op == "Conv" and quantize_conv:
                    # Integer conv (parity-plus): bias at s_x*s_w and 4x bit
                    # width, output requantized -- mirrors the Gemm strategy.
                    if len(node.inputs) > 2 and node.inputs[2] is not None:
                        bias = node.inputs[2]
                        qparams1 = qparams_per_value[node.inputs[0].name]
                        qparams2 = qparams_per_value[node.inputs[1].name]
                        bias_scale = qparams1.scale * qparams2.scale
                        qparams_per_value[bias.name] = QuantizationParams(bias_scale, None)
                        qbias = quantize_tensor(value_dict[bias.name].data,
                                                4 * bit_width, bias_scale, None)
                        qvalues_dict[bias.name] = Constant(bias.name, [], qbias)
                    register_out_asym()
                elif node.op == "Add" and (isinstance(node.inputs[0], Constant)
                                           or isinstance(node.inputs[1], Constant)):
                    bias_ind = 0 if isinstance(node.inputs[0], Constant) else 1
                    x_ind = 1 - bias_ind
                    x_name = node.inputs[x_ind].name
                    bias_name = node.inputs[bias_ind].name
                    bias_data = value_dict[bias_name].data
                    bias_scale = qparams_per_value[x_name].scale
                    qbias = quantize_tensor(bias_data, 4 * bit_width, bias_scale, None)
                    qvalues_dict[bias_name] = Constant(bias_name, [], qbias)
                    qparams_per_value[bias_name] = QuantizationParams(bias_scale, None)
                    register_out_asym()
                elif node.op in ("Identity", "Relu"):
                    out_val = node.outputs[0]
                    qvalues_dict[out_val.name] = Variable(out_val.name, [], [], None)
                    qparams_per_value[out_val.name] = \
                        qparams_per_value[node.inputs[0].name]
                    qnodes_dict[node.name] = Node(node.name, node.op, node.attrs, [], [])
                else:
                    # every output registered (the reference's single-output
                    # TODO at model.py:422, implemented for real)
                    for out_val in node.outputs:
                        qvalues_dict[out_val.name] = Variable(out_val.name, [], [], None)
                        if out_val.name in stats:
                            qparams_per_value[out_val.name] = qparams_for(out_val.name, True)
                    qnodes_dict[node.name] = Node(node.name, node.op, node.attrs, [], [])

            # Re-link the cloned graph (reference: model.py:427-436).
            for name, qnode in qnodes_dict.items():
                qnode.inputs = [None if i is None else qvalues_dict[i.name]
                                for i in node_dict[name].inputs]
                qnode.outputs = [qvalues_dict[o.name] for o in node_dict[name].outputs]
            for name, qvalue in qvalues_dict.items():
                if isinstance(qvalue, Variable):
                    qvalue.inputs = [qnodes_dict[i.name] for i in value_dict[name].inputs]
                qvalue.outputs = [qnodes_dict[o.name] for o in value_dict[name].outputs]

            qoutputs = [qvalues_dict[o.name] for o in self.outputs]
            qinputs = [qvalues_dict[i.name] for i in self.inputs]

            quantized_ops = ("MatMul", "Gemm", "Conv") if quantize_conv \
                else ("MatMul", "Gemm")
            return QModel(list(qnodes_dict.values()), list(qvalues_dict.values()),
                          qinputs, qoutputs, bit_width, qparams_per_value,
                          quantized_ops=quantized_ops)

    def quantize_dynamic(self, bit_width: int = 8, **kw):
        """Dynamic quantization: integer matmuls whose activation scales
        are computed from the actual batch inside the jitted program --
        NO calibration data. See dynamic.quantize_dynamic for the knobs
        (granularity, weight_bit_width, per_channel_weights)."""
        from .dynamic import quantize_dynamic
        return quantize_dynamic(self, bit_width=bit_width, **kw)

    def quantize_weights(self, bit_width: int = 8,
                         per_channel: bool = True,
                         pack: bool = None,
                         group_size: int = None) -> int:
        """Weight-only quantization (W8A16/W4A16-style): replace 2-D
        float MatMul weights with symmetric integer containers while
        COMPUTE STAYS FLOAT -- the executor dequantizes in-program and
        XLA fuses the convert+scale into the dot's operand load, so
        weight HBM traffic drops to ``bit_width`` bits with no change
        to the math beyond weight rounding. No calibration data needed
        (scales come from the weights themselves). This is the
        memory-bound serving mode: single-token decode is weight-
        -bandwidth-bound, where full integer execution loses to its
        activation-quantize overhead (BENCH_HISTORY round-3 decode
        table) but weight-only wins the HBM traffic without it.

        ``per_channel``: symmetric abs-max scale per output channel
        (default) vs per tensor. ``group_size``: finer GROUPED scales
        -- one per (``group_size`` input rows x output channel), the
        GPTQ/AWQ-style grouping that recovers most of int4's accuracy
        loss; applies to weights whose K divides evenly (others fall
        back to per-channel). Grouped scales are stored compactly as a
        [K/g, N] array and expanded inside the dot's operand fusion;
        such weights are only consumable as MatMul rhs (enforced by
        selection). ``pack``: additionally bit-pack the payload
        (kernels/pack.py; default when ``bit_width < 8``). Mutates this
        float model in place and returns the number of converted
        weights. The reference has no weight-only mode; parity-plus."""
        if getattr(self, "quant_params", None) is not None:
            raise ValueError(
                "quantize_weights is a FLOAT-executor mode; this model "
                "is already integer-quantized (use pack_weights there)")
        from .config import host_eager
        with host_eager():
            from .quantization import per_channel_scales, qrange
            from .tensor import pack_qtensor, quantize_tensor

            if pack is None:
                pack = bit_width < 8

            def _channel_axis(value):
                """Output-channel axis if this constant is consumed only as
                MatMul/Gemm weight (input 1), else None."""
                axes = set()
                for nd in value.outputs:
                    if len(nd.inputs) < 2 or nd.inputs[1] is not value:
                        return None
                    if nd.op == "MatMul":
                        axes.add(1)
                    elif nd.op == "Gemm":
                        axes.add(0 if nd.attrs.get("transB") else 1)
                    else:
                        return None
                return axes.pop() if len(axes) == 1 else None

            converted = 0
            for value in self.values:
                if not isinstance(value, Constant) \
                        or not isinstance(value.data, FTensor):
                    continue
                arr = np.asarray(value.data.data)
                if arr.ndim != 2 or not value.outputs:
                    continue
                ch_axis = _channel_axis(value)
                if ch_axis is None:
                    continue
                # grouped scales assume the MatMul [K, N] orientation
                groupable = bool(group_size) and ch_axis == 1 \
                    and all(nd.op == "MatMul" for nd in value.outputs)
                from .quantization import weight_only_scales
                scale, store_scale = weight_only_scales(
                    arr, bit_width, ch_axis, per_channel=per_channel,
                    group_size=group_size, groupable=groupable)
                qt = quantize_tensor(value.data, bit_width, scale, None)
                qt = QTensor(np.asarray(qt.data), bit_width,
                             scale if store_scale is None else store_scale,
                             None)
                if pack and bit_width <= 8:
                    qt = pack_qtensor(qt)
                value.data = qt
                converted += 1
            self._jit_cache.clear()
            self._sharded_param_cache = None
            self._dp_cache = None
            return converted

    def qat_quantize(self, inputs: list[np.ndarray], **kw) -> "QModel":
        """Quantization-aware training: fine-tune the weights end-to-end
        under fake quantization (straight-through gradients through the
        whole forward via jax.grad + optax), then quantize with the same
        frozen calibration params. See qat.qat_quantize for the knobs;
        quantize() kwargs (bit_width, weight_bit_width, ...) pass
        through. The float model is left untouched."""
        from .qat import qat_quantize
        return qat_quantize(self, inputs, **kw)


# value-preserving ops the int8_dataflow pass propagates through
# (single definition: passes/toolkit.py)
from .passes.toolkit import PASSTHROUGH_OPS as _PASSTHROUGH_OPS  # noqa: E402


class QModel(Model):
    """Quantized executor. reference: numpy_quant/model.py:454-565."""

    def __init__(self, nodes, values, inputs, outputs, bit_width: int,
                 quant_params: dict[str, QuantizationParams],
                 quantized_ops: tuple = ("MatMul", "Gemm")):
        super().__init__(nodes, values, inputs, outputs)
        self.bit_width = bit_width
        self.quant_params = quant_params
        self.quantized_ops = tuple(quantized_ops)
        # ops whose outputs requantize to the model bit width
        self.requantized_ops = tuple(op for op in self.quantized_ops
                                     if op in ("Gemm", "Conv"))
        # values planned for early quantization (int8_dataflow pass)
        self._int8_values: set = set()
        # pipeline-stage boundary passthrough (parallel/pipeline.py):
        # interior stages carry the float residual activation verbatim
        # -- no entry quantize (_passthrough_wrap) and no exit
        # dequantize/f32-upcast (_passthrough_finalize) -- so a
        # pipelined QModel runs the exact op sequence of the
        # unpipelined one.
        self._passthrough_wrap = False
        self._passthrough_finalize = False

    def _wrap_input(self, array: np.ndarray, variable: Variable) -> Tensor:
        if self._passthrough_wrap and array.dtype != np.int64:
            return FTensor(jax.numpy.asarray(array))
        if array.dtype == np.float32:
            qp = self.quant_params[variable.name]
            return quantize_tensor(FTensor(jax.numpy.asarray(array)),
                                   self.bit_width, qp.scale, qp.zero_point)
        if array.dtype == np.int8:
            # pre-quantized input (int8 KV caches, utils/generate.py):
            # the caller quantized with THIS input's calibrated params,
            # so it enters the integer domain directly -- bit-identical
            # to feeding the dequantized float (quantize is idempotent)
            qp = self.quant_params[variable.name]
            return QTensor(jax.numpy.asarray(array), self.bit_width,
                           qp.scale, qp.zero_point)
        if array.dtype == np.int64:
            return ITensor(array)
        raise ValueError(f"Array dtype {array.dtype} not supported")

    def _profile_buckets(self) -> dict[str, float]:
        buckets = super()._profile_buckets()
        buckets["TinyqQuant"] = 0.0
        buckets["TinyqDequant"] = 0.0
        return buckets

    def _node_inputs(self, node: Node, data: dict[str, Tensor],
                     timings) -> list[Tensor]:
        ins = []
        if node.op == "DecodeAttention":
            # fused decode attention consumes RAW tensors: the op
            # replays the unfused chain's quantize/dequantize itself
            # (registry impl; passes/decode_attention.py), so int8
            # caches stream in untouched and nothing dequantizes here
            return [None if v is None else data[v.name]
                    for v in node.inputs]
        if node.op in self.quantized_ops:
            # Quantize any float inputs on the fly ("TinyqQuant",
            # reference: model.py:503-527).
            for idx, v in enumerate(node.inputs):
                if v is None:
                    ins.append(None)
                    continue
                t = data[v.name]
                if isinstance(t, FTensor):
                    qp = self.quant_params[v.name]
                    stime = time()
                    t = quantize_tensor(t, self.bit_width, qp.scale, qp.zero_point)
                    if timings is not None:
                        jax.block_until_ready(t.data)
                        timings["TinyqQuant"] += time() - stime
                elif (isinstance(t, QTensor)
                      and t.bit_width != self.bit_width
                      and (idx < 2
                           or (idx == 2 and node.op in
                               ("FusedAttention", "FusedAttentionHS")))):
                    # Directly-chained integer matmuls (e.g. GNN message
                    # passing): requantize a 4x-width accumulator OPERAND
                    # (never the 4x-width bias at input 2) to the model
                    # bit width with this value's calibrated params.
                    # (The reference asserts out here, tensor.py:206 --
                    # superset behavior.) Fused attention's V rides at
                    # input 2 (bias-free projections feed it a raw
                    # accumulator, e.g. models/t5.py); its optional
                    # score-bias constant at input 3 stays 4x-width --
                    # the kernel dequantizes it like the unfused Add.
                    # Value-identical to the unfused chain: the shape
                    # ops between the projection and the score/context
                    # MatMul preserve the per-value global min/max, so
                    # this value's calibrated params equal the
                    # transposed value's the unfused entry quantize
                    # uses.
                    qp = self.quant_params[v.name]
                    t = t.requantize(self.bit_width, qp.scale, qp.zero_point)
                ins.append(t)
        elif (node.op in _PASSTHROUGH_OPS
              and node.outputs
              and all(o.name in self._int8_values for o in node.outputs)
              and isinstance(data[node.inputs[0].name], QTensor)
              and data[node.inputs[0].name].bit_width == self.bit_width):
            # int8_dataflow: value-preserving shape op inside a planned
            # int8 region -- move int8 data, skip dequantize/requantize.
            ins = [None if v is None else data[v.name] for v in node.inputs]
        else:
            # Dequantize quantized inputs ("TinyqDequant",
            # reference: model.py:528-538).
            for v in node.inputs:
                if v is None:
                    ins.append(None)
                    continue
                t = data[v.name]
                if isinstance(t, QTensor):
                    stime = time()
                    t = t.dequantize()
                    if timings is not None:
                        jax.block_until_ready(t.data)
                        timings["TinyqDequant"] += time() - stime
                ins.append(t)
        return ins

    def _post_node(self, node: Node, outputs: list[Tensor]) -> list[Tensor]:
        if node.op in self.requantized_ops:
            # Gemm (and integer Conv) outputs requantize to the model bit
            # width; MatMul outputs stay 4x-bit-width accumulators
            # (reference: model.py:544-548).
            qp = self.quant_params[node.outputs[0].name]
            outputs = [t.requantize(self.bit_width, qp.scale, qp.zero_point)
                       for t in outputs]
        if self._int8_values:
            # int8_dataflow: produce planned values as int8 QTensors here
            # (the consumers' TinyqQuant/chained-requantize with the SAME
            # qparams then never runs -- bit-identical, one pass instead
            # of per-consumer, fused by XLA into the producing kernel).
            outs = []
            for value, t in zip(node.outputs, outputs):
                if value.name in self._int8_values:
                    qp = self.quant_params[value.name]
                    if isinstance(t, FTensor):
                        t = quantize_tensor(t, self.bit_width, qp.scale,
                                            qp.zero_point)
                    elif isinstance(t, QTensor) \
                            and t.bit_width != self.bit_width:
                        t = t.requantize(self.bit_width, qp.scale,
                                         qp.zero_point)
                outs.append(t)
            return outs
        return outputs

    def _finalize_output(self, tensor: Tensor):
        if isinstance(tensor, FTensor):
            data = tensor.data
            if self._passthrough_finalize:
                return data  # pipeline carry: keep the working dtype
            if data.dtype == jax.numpy.bfloat16:
                return data.astype(jax.numpy.float32)
            return data
        if isinstance(tensor, QTensor):
            return tensor.dequantize().data
        if isinstance(tensor, DITensor):
            return tensor.data
        raise ValueError(f"Unsupported output tensor {type(tensor)}")

    def fuse_attention(self) -> int:
        """Fuse MatMul -> scale -> [mask/bias] -> Softmax -> MatMul
        chains into fused-attention nodes backed by the VMEM-resident
        int8 kernels; head-split chains are swallowed too
        (FusedAttentionHS). Unfused Softmaxes are recorded with reasons
        in ``self.fusion_report``. See passes/attention.py."""
        from .passes import fuse_attention
        return fuse_attention(self)

    def fuse_gelu(self) -> int:
        """Fuse the exporter's exact-GELU chain into ONE FusedGelu node
        (bit-exact replay in f32 mode; sigmoid-form tanh approximation
        in the bf16 serving mode). See passes/gelu.py."""
        from .passes import fuse_gelu
        return fuse_gelu(self)

    def merge_parallel_matmuls(self) -> int:
        """Horizontally fuse MatMuls sharing one activation input into
        ONE wide MXU dot + in-graph splitting (the ViT Q/K/V pattern);
        bit-identical. See passes/matmul_merge.py."""
        from .passes import merge_parallel_matmuls
        return merge_parallel_matmuls(self)

    def int8_dataflow(self) -> int:
        """Plan EARLY quantization (bit-identical layout change): the
        residual stream stays int8 in HBM. Run AFTER fuse_attention()
        for full coverage. See passes/int8_dataflow.py."""
        from .passes import int8_dataflow
        return int8_dataflow(self)

    def narrow_gather(self) -> int:
        """Dead-token elimination: hoist a scalar token-axis Gather
        (the ViT CLS-token pick) backward through per-token ops so the
        classifier tail computes ONLY the consumed token; outputs are
        unchanged. See passes/narrow.py."""
        from .passes import narrow_gather
        return narrow_gather(self)

    def optimize(self, verbose: bool = False) -> dict:
        """Apply the graph-level performance passes that preserve the
        executor's numerics: attention fusion (bit-identical kernel)
        and early int8 quantization (bit-identical layout change).
        Returns a {pass: count} summary plus per-Softmax fusion
        failures (node name, reason) so a pattern miss on a foreign
        exporter's graph is visible, not a silent perf cliff.
        ``verbose=True`` prints the failures."""
        # the passes read constant payloads eagerly (np.asarray /
        # dequantize of scalars): keep those reads off the tunnel
        from .config import host_eager
        with host_eager():
            fused = self.fuse_attention()
            # decode-step graphs: the [B,1,H] KV-cache attention chain
            # (which fuse_attention's full-sequence patterns reject)
            # fuses into DecodeAttention -- float dots on operand-fused
            # dequantized caches, no per-step zero-point-correction
            # reduces over the cache. Ulp-equal, not bit-identical
            # (see passes/decode_attention.py).
            dec = self.fuse_decode_attention()
            # merge_parallel_matmuls is regime-gated on measured evidence
            # (BENCH_HISTORY.md round 3 experiment): at full single-chip
            # width (N=768) the wide dot is 1.66x SLOWER (XLA materializes
            # the int32 accumulator for the 3-consumer split), but at the
            # per-device widths TP produces it WINS (0.97x at N/tp=384,
            # 0.89x at N/tp=96 -- narrow dots underfeed the 128-wide MXU).
            # Auto-enable under a tensor-parallel mesh; `_opt_merge_matmuls`
            # (True/False) still forces either way.
            flag = getattr(self, "_opt_merge_matmuls", None)
            m_ax = getattr(self, "model_axis", "model")
            tp = self.mesh.shape[m_ax] if self.mesh is not None \
                and m_ax in getattr(self.mesh, "axis_names", ()) else 1
            do_merge = flag if flag is not None else tp >= 2
            merged = self.merge_parallel_matmuls() if do_merge else 0
            gelu = self.fuse_gelu()
            narrowed = self.narrow_gather()
            planned = self.int8_dataflow()
            failures = list(self.fusion_report["failures"])
            if verbose:
                for name, reason in failures:
                    print(f"optimize: Softmax {name!r} not fused: {reason}")
            return {"fuse_attention": fused,
                    "fuse_decode_attention": dec,
                    "merge_parallel_matmuls": merged,
                    "fuse_gelu": gelu, "narrow_gather": narrowed,
                    "int8_dataflow": planned, "fusion_failures": failures}

    def pack_weights(self) -> int:
        """Switch 2-D symmetric MatMul weights to packed storage
        (kernels/pack.py): exactly bit_width bits per value in HBM;
        TP-row-sharded payloads re-pack per device. See
        passes/weights.py."""
        from .passes import pack_weights
        return pack_weights(self)

    def correct_biases(self, float_model: "Model", inputs,
                       passes: int = 1) -> int:
        """Empirical bias correction (arXiv:2201.08442 section IV):
        subtract each quantized layer's mean output error over the
        calibration batch from its bias. Returns the number of
        corrected biases. See numpy_quant_tpu/bias_correction.py."""
        from .bias_correction import correct_biases_qmodel
        return correct_biases_qmodel(self, float_model, inputs,
                                     passes=passes)

    def adaround(self, float_model: "Model", inputs, **kw) -> int:
        """AdaRound (Nagel et al., arXiv:2004.10568): learn each weight
        element's rounding direction by minimizing per-layer output
        reconstruction error on calibration data -- rounding-to-nearest
        is optimal per weight, not per layer output. Mutates the
        quantized MatMul/Gemm weight payloads in place; call BEFORE
        pack_weights(). Returns the number of tuned weights. See
        numpy_quant_tpu/adaround.py for the full recipe."""
        from .adaround import adaround_qmodel
        return adaround_qmodel(self, float_model, inputs, **kw)

    def gptq(self, float_model: "Model", inputs, **kw) -> int:
        """GPTQ (Frantar et al., arXiv:2210.17323): requantize weights
        sequentially along the contraction axis, absorbing each slice's
        error into the remainder weighted by the inverse Hessian of the
        layer reconstruction loss. Same grid as the PTQ pass, different
        integers. Mutates MatMul/Gemm weight payloads in place; call
        BEFORE pack_weights(). Returns the number of requantized
        weights. See numpy_quant_tpu/gptq.py."""
        from .gptq import gptq_qmodel
        return gptq_qmodel(self, float_model, inputs, **kw)

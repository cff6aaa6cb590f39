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
        narrow = not x64_enabled()
        cached = getattr(self, "_dp_cache", None)
        if cached is not None and self._dp_cache_key == narrow:
            return cached
        params = {}
        for value in self.values:
            if isinstance(value, Constant):
                if isinstance(value.data, QTensor) and narrow \
                        and value.data.bit_width <= 8:
                    params[value.name] = value.data.data.astype(jnp.int8)
                elif isinstance(value.data, (FTensor, QTensor)):
                    params[value.name] = value.data.data
                elif isinstance(value.data, PackedQTensor):
                    params[value.name] = (value.data.planes, value.data.colsum)
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
        """Device params, placed per parameter_shardings when a mesh is
        attached (cached: placement happens once)."""
        if self.mesh is None or self.parameter_shardings is None:
            return self._device_params()
        if self._sharded_param_cache is None:
            self._sharded_param_cache = {
                name: jax.device_put(arr, self.parameter_shardings[name])
                for name, arr in self._device_params().items()}
        return self._sharded_param_cache

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
            data = self._forward(input_tensors, self._device_params(),
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

    def map_batches(self, inputs: List[np.ndarray], as_numpy: bool = True):
        """Throughput inference over a leading STEPS axis: each input is
        ``[steps, *per_call_shape]`` and all steps execute inside ONE
        device program (``lax.scan`` over forwards) with a single host
        sync at the end -- the production serving shape (what bench.py
        measures). Returns outputs stacked ``[steps, ...]``.

        Weights stay device-resident across steps, XLA overlaps the
        output transfer of step i with the compute of step i+1, and the
        per-call dispatch overhead of ``__call__`` is paid once for the
        whole dataset instead of per batch.
        """
        if any(_np_dtype(a) == np.int64 for a in inputs):
            raise ValueError("map_batches supports float inputs only "
                             "(int64 inputs are shape-domain, static "
                             "under jit)")
        arrays = list(inputs)
        key = ("map_batches",
               tuple((tuple(a.shape), str(a.dtype)) for a in arrays),
               bool(jax.config.jax_enable_x64))
        if key not in self._jit_cache:
            fwd = self.lowered_fn()

            def run(xs: list, params):
                def body(carry, step_inputs):
                    return carry, tuple(fwd(list(step_inputs), params))
                _, ys = jax.lax.scan(body, 0, tuple(xs))
                return ys

            self._jit_cache[key] = jax.jit(run)
        placed = [self._place_batched_input(a) for a in arrays]
        outs = self._jit_cache[key](placed, self._placed_params())
        if as_numpy:
            return [np.asarray(o) for o in outs]
        return list(outs)

    def serve_stream(self, batches, depth: int = 2, as_numpy: bool = True):
        """Pipelined request-stream inference: a generator yielding one
        output list per input batch (in order), keeping up to ``depth``
        forwards in flight.

        JAX dispatch is asynchronous -- ``__call__(as_numpy=False)``
        returns device futures without blocking -- so enqueueing the
        next request BEFORE synchronizing the previous one overlaps
        host->device transfer, dispatch and compute across requests.
        On a remote-attached chip each dispatch pays an RPC round trip;
        pipelining hides it behind the in-flight compute. This is the
        ONLINE serving shape: unlike ``map_batches`` (one device program
        over a fixed [steps, ...] dataset) it needs no inputs upfront
        and yields each result as it completes.

        ``batches``: iterable of input lists, each as ``__call__``'s
        ``inputs`` (all batches must share one shape signature to reuse
        the compiled program)."""
        from collections import deque

        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        inflight: deque = deque()

        def _finish(outs):
            return [np.asarray(o) for o in outs] if as_numpy else outs

        for batch in batches:
            inflight.append(self(list(batch), as_numpy=False))
            if len(inflight) >= depth:
                yield _finish(inflight.popleft())
        while inflight:
            yield _finish(inflight.popleft())

    def serve_ring(self, batches):
        """Persistent device serving loop: ONE dispatched XLA program
        owns the chip for the whole session. The compiled program is a
        ``lax.while_loop`` whose body pulls the next input batch from
        the host through an ordered ``io_callback`` (the input ring),
        runs the forward, and pushes the outputs back through another
        callback -- so per-step dispatch overhead is paid ONCE for the
        session, and the device, not the host loop, paces ingestion.

        This is the deployment shape beyond ``map_batches`` (which
        needs the whole ``[steps, ...]`` dataset upfront): ``batches``
        may be a LIVE generator -- each ``next()`` happens inside the
        pull callback when the device is ready for more work, and the
        session ends when it raises ``StopIteration``. Returns the list
        of per-batch output lists (host numpy -- the push callback
        crosses to the host by construction), in order.

        Cost model: one host round trip per step (outputs out + next
        batch in, fused into a single ordered callback). The shape pays
        off when per-call dispatch overhead exceeds that callback trip
        (locally-attached accelerators with non-trivial per-step
        compute); at tiny compute on the CPU backend the callback trip
        (~0.3 ms) exceeds jit dispatch (~0.2 ms) and plain ``__call__``
        is faster (BENCH_HISTORY.md round-3 ring measurement).

        All batches must share the first batch's shape/dtype signature
        (one compiled program). Float inputs only (int64 inputs are
        shape-domain, static under jit); unsupported on a sharded model
        (callbacks are single-host). Requires a runtime with host
        callback support: a LOCALLY-attached device (or CPU). On a
        remote-attached chip (e.g. a tunneled device plugin) host
        callbacks never complete and the session hangs -- use
        ``map_batches``/``serve_stream`` there
        (extras/serving_benchmark.py probes for this).
        """
        import itertools
        import weakref

        import jax.numpy as jnp
        from jax.experimental import io_callback

        if self.mesh is not None:
            raise ValueError("serve_ring runs single-device (host "
                             "callbacks); use map_batches on a sharded "
                             "model")
        it = iter(batches)
        try:
            first = [np.asarray(a) for a in next(it)]
        except StopIteration:
            return []
        if any(_np_dtype(a) == np.int64 for a in first):
            raise ValueError("serve_ring supports float inputs only "
                             "(int64 inputs are shape-domain, static "
                             "under jit)")
        sig = tuple((tuple(a.shape), str(a.dtype)) for a in first)
        key = ("serve_ring", sig, bool(jax.config.jax_enable_x64))
        if key in self._ring_state:
            raise RuntimeError("a serve_ring session with this input "
                               "signature is already running on this "
                               "model")
        if key not in self._jit_cache:
            fwd = self.lowered_fn()
            in_specs = tuple(jax.ShapeDtypeStruct(a.shape, a.dtype)
                             for a in first)
            out_shapes = jax.eval_shape(
                lambda xs, params: tuple(fwd(list(xs), params)),
                in_specs, self._placed_params())
            out_specs = tuple(jax.ShapeDtypeStruct(o.shape, o.dtype)
                              for o in out_shapes)
            pull_spec = (jax.ShapeDtypeStruct((), jnp.int32),) + in_specs
            model_ref = weakref.proxy(self)

            def host_pull():
                state = model_ref._ring_state[key]
                try:
                    batch = next(state["it"])
                except StopIteration:
                    return ((np.int32(0),)
                            + tuple(np.zeros(s.shape, s.dtype)
                                    for s in in_specs))
                arrs = [np.asarray(a) for a in batch]
                got = tuple((tuple(a.shape), str(a.dtype)) for a in arrs)
                if got != sig:
                    raise ValueError(
                        f"serve_ring batch signature changed mid-"
                        f"session: expected {sig}, got {got}")
                return (np.int32(1),) + tuple(arrs)

            def host_exchange(*ys):
                # one host round trip per step: deliver this step's
                # outputs AND fetch the next batch in the same callback
                model_ref._ring_state[key]["out"].append(
                    [np.asarray(y) for y in ys])
                return host_pull()

            def session(params):
                def cond(carry):
                    return carry[0] > 0

                def body(carry):
                    ys = fwd(list(carry[1:]), params)
                    return io_callback(host_exchange, pull_spec, *ys,
                                       ordered=True)

                first = io_callback(host_pull, pull_spec, ordered=True)
                final = jax.lax.while_loop(cond, body, first)
                return final[0]

            self._jit_cache[key] = jax.jit(session)
        state = {"it": itertools.chain([first], it), "out": []}
        self._ring_state[key] = state
        try:
            jax.block_until_ready(
                self._jit_cache[key](self._placed_params()))
        finally:
            del self._ring_state[key]
        return state["out"]

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


_PASSTHROUGH_OPS = ("Reshape", "Transpose", "Identity", "Squeeze",
                    "Unsqueeze", "Flatten", "Gather")


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

    def _wrap_input(self, array: np.ndarray, variable: Variable) -> Tensor:
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
            if data.dtype == jax.numpy.bfloat16:
                return data.astype(jax.numpy.float32)
            return data
        if isinstance(tensor, QTensor):
            return tensor.dequantize().data
        if isinstance(tensor, DITensor):
            return tensor.data
        raise ValueError(f"Unsupported output tensor {type(tensor)}")

    def fuse_attention(self) -> int:
        """Fuse MatMul -> Mul/Div(const) -> Softmax -> MatMul chains into
        fused-attention nodes backed by the VMEM-resident int8 attention
        kernels (kernels/attention.py), avoiding the [B, H, N, N]
        score/probability tensors in HBM. When the surrounding
        head-split Reshape/Transpose chains match the standard
        multi-head export pattern they are swallowed too
        (FusedAttentionHS): the kernel consumes the raw [B, N, H*D]
        projection outputs and splits/merges heads in VMEM, so none of
        the head shuffles or d-padding ever touch HBM. Returns the
        number of fused blocks.

        Every Softmax that does NOT fuse is recorded with the reason in
        ``self.fusion_report["failures"]`` (a silent fall-back to the
        slow path on a foreign exporter's graph would otherwise be an
        invisible perf cliff)."""
        self.fusion_report = {"fused": 0, "failures": []}
        if self.bit_width > 8:
            for n in self.nodes:
                if n.op == "Softmax":
                    self.fusion_report["failures"].append(
                        (n.name, f"bit_width {self.bit_width} > 8: the "
                         "int8 attention kernels do not apply"))
            return 0
        producer = {}
        for node in self.nodes:
            for out in node.outputs:
                producer[out.name] = node

        def consumers(value):
            return [n for n in self.nodes if value in n.inputs]

        def single_consumer_chain_back(value, specs):
            """Walk producers back through ops matching ``specs``
            (list of (op, attr check) from nearest to farthest); returns
            (chain nodes nearest-first, source value) or None."""
            chain = []
            for op, check in specs:
                node = producer.get(value.name)
                if node is None or node.op != op or not check(node):
                    return None
                if len(consumers(node.outputs[0])) != 1:
                    return None
                chain.append(node)
                value = node.inputs[0]
            return chain, value

        def perm_is(node, perm):
            return tuple(int(p) for p in node.attrs.get("perm", ())) == perm

        fused = 0

        def fail(sm, reason):
            self.fusion_report["failures"].append((sm.name, reason))

        for sm in [n for n in self.nodes if n.op == "Softmax"]:
            if int(sm.attrs.get("axis", -1)) != -1:
                fail(sm, f"softmax axis {sm.attrs.get('axis')} != -1")
                continue
            # optional additive causal mask (decoder graphs): the
            # Softmax input may be Add(scaled scores, triangular const);
            # the kernel applies the same additive value in VMEM.
            # A non-causal constant Add matches as a general per-head
            # score BIAS instead (T5 relative position bias, ALiBi,
            # sliding-window masks) -- fused as a kernel operand.
            mask_node, mask_val = self._match_causal_mask(
                producer, consumers, sm.inputs[0])
            bias_node, bias_const = (None, None) if mask_node is not None \
                else self._match_score_bias(producer, sm.inputs[0])
            add_node = mask_node if mask_node is not None else bias_node
            scale_val = sm.inputs[0] if add_node is None else \
                add_node.inputs[1 if isinstance(add_node.inputs[0],
                                                Constant) else 0]
            mul = producer.get(scale_val.name)
            if mul is not None and mul.op == "MatMul":
                # exporter pre-scaled q (or k): scores feed softmax
                # directly; the kernel's scaling factor is 1
                mm1, mul, scaling = mul, None, 1.0
            elif mul is None or mul.op not in ("Mul", "Div"):
                fail(sm, "input is not a Mul/Div scale node or MatMul "
                     f"(got {mul.op if mul else 'graph input'})")
                continue
            else:
                mm1 = producer.get(mul.inputs[0].name)
                if mm1 is None or mm1.op != "MatMul":
                    fail(sm, "scale node's input is not a MatMul "
                         f"(got {mm1.op if mm1 else 'graph input'})")
                    continue
                # scale factor: a Constant NODE's attrs (torch exporter)
                # or an initializer Constant -- dequantized if the PTQ
                # pass quantized it, exactly what the executor would use
                scal_val = mul.inputs[1]
                scal_node = producer.get(scal_val.name)
                scaling = None
                if scal_node is not None and scal_node.op == "Constant":
                    arr = np.asarray(scal_node.attrs["value"])
                    if arr.size == 1:
                        scaling = float(arr.reshape(-1)[0])
                elif isinstance(scal_val, Constant) \
                        and scal_val.data is not None:
                    d = scal_val.data
                    arr = np.asarray(d.data)
                    if arr.size == 1:
                        scaling = float(arr.reshape(-1)[0])
                        if isinstance(d, QTensor):
                            if d.zero_point is not None:
                                scaling -= float(np.asarray(d.zero_point)
                                                 .reshape(-1)[0])
                            scaling *= float(np.float32(d.scale))
                if scaling is None:
                    fail(sm, "scale factor is not a scalar constant")
                    continue
                if mul.op == "Div":
                    scaling = 1.0 / scaling
            cons = consumers(sm.outputs[0])
            if len(cons) != 1 or cons[0].op != "MatMul" \
                    or cons[0].inputs[0] is not sm.outputs[0]:
                fail(sm, "softmax output does not feed exactly one "
                     "MatMul as its lhs")
                continue
            mm2 = cons[0]
            chain_vals = [mm1.outputs[0]]
            if mul is not None:
                chain_vals.append(mul.outputs[0])
            if add_node is not None:
                chain_vals.append(add_node.outputs[0])
            if any(len(consumers(v)) != 1 for v in chain_vals):
                fail(sm, "scores/probabilities have consumers outside "
                     "the attention chain")
                continue
            probs_qp = self.quant_params[sm.outputs[0].name]
            attrs = {"scaling": scaling,
                     "probs_scale": float(np.float32(probs_qp.scale)),
                     "probs_zero_point": 0 if probs_qp.zero_point is None
                     else int(probs_qp.zero_point)}
            if mask_node is not None:
                attrs["causal_mask_val"] = mask_val[0]
                if mask_val[1] is not None:
                    # banded (sliding-window) causal mask
                    attrs["causal_window"] = mask_val[1]
            # calibrated max of the softmax INPUT: the fast serving
            # kernel uses it as a STATIC exp2 shift instead of the
            # per-row max-subtract reduce pass (softmax is shift-
            # invariant; a clamp keeps pathological out-of-calibration
            # scores finite) -- kernels/attention.py fast path
            # (for causal graphs: the PRE-mask scores -- the masked
            # value's range is dominated by the -1e9 mask entries)
            sm_in_qp = self.quant_params.get(scale_val.name)
            if sm_in_qp is not None and sm_in_qp.zero_point is not None \
                    and getattr(sm_in_qp.scale, "ndim", 0) == 0:
                qmax = 2.0 ** (self.bit_width - 1) - 1
                attrs["score_max"] = float(
                    (qmax - int(sm_in_qp.zero_point))
                    * np.float32(sm_in_qp.scale))

            # -- try the head-splitting superset pattern --------------
            hs = self._match_attention_hs(mm1, mm2, producer, consumers)
            if hs is not None:
                xq, xk, xv, out_value, num_heads, dead = hs
                f_inputs = [xq, xk, xv]
                if bias_node is not None:
                    bshape = bias_const.data.data.shape
                    if len(bshape) >= 3 \
                            and bshape[-3] not in (1, num_heads):
                        fail(sm, f"score-bias constant head dim "
                             f"{bshape[-3]} is not 1 or num_heads "
                             f"{num_heads}")
                        continue
                    # the bias CONSTANT rides as a 4th input: the
                    # executor dequantizes it exactly as the unfused
                    # Add would, then the kernel adds it per head in
                    # VMEM (kernels/attention.py score_bias)
                    f_inputs.append(bias_const)
                fnode = Node(f"{mm2.name}/fused_attention_hs",
                             "FusedAttentionHS",
                             dict(attrs, num_heads=num_heads),
                             f_inputs, [out_value])
                idx = self.nodes.index(mm2)
                self.nodes[idx] = fnode
                for dn in dead:
                    if dn in self.nodes:
                        self.nodes.remove(dn)
                for dn in (mm1, mul, add_node, sm):
                    if dn is not None:
                        self.nodes.remove(dn)
                fused += 1
                continue

            if bias_node is not None:
                # the plain kernel's [BH, N, D] layout has no head index
                # to slice a per-head bias by -- only the shape-checked
                # head-split pattern fuses biased attention
                fail(sm, "score-bias constant present but the head-split"
                     " pattern did not match (bias fuses via"
                     " FusedAttentionHS only)")
                continue

            if mul is None:
                # pre-scaled scores carry no standalone scale node to
                # anchor a safe plain fusion (the bare MatMul operands
                # may be 2-D / batch-broadcast, which the plain kernel's
                # [BH, N, D] layout cannot express) -- only the
                # shape-checked head-split pattern fuses this form
                fail(sm, "pre-scaled scores (no Mul/Div before Softmax):"
                     " only the head-split pattern fuses this form, and"
                     " it did not match")
                continue

            # plain (non-head-split) fusion: still fused, but the head
            # Reshape/Transpose shuffles stay in the graph -- note it.
            # Causal graphs take this path too (causal_mask_val is in
            # attrs; the kernel applies it in VMEM) when the head-split
            # chains carry extra structure, e.g. RoPE/repeat_kv in
            # models/llama.py.
            self.fusion_report.setdefault("plain_fusions", []).append(
                (sm.name, "head-split pattern not matched; fused the "
                 "core only (head shuffles remain in the graph)"))
            fnode = Node(
                f"{mm2.name}/fused_attention", "FusedAttention", attrs,
                [mm1.inputs[0], mm1.inputs[1], mm2.inputs[1]],
                [mm2.outputs[0]])
            idx = self.nodes.index(mm2)
            self.nodes[idx] = fnode
            for dead in (mm1, mul, mask_node, sm):
                if dead is not None:
                    self.nodes.remove(dead)
            fused += 1
        if fused:
            self.quantized_ops = tuple(self.quantized_ops) \
                + ("FusedAttention", "FusedAttentionHS")
            self._jit_cache.clear()
        self.fusion_report["fused"] = fused
        return fused

    def _match_causal_mask(self, producer, consumers, value):
        """Match ``Add(x, C)`` feeding a Softmax where C dequantizes to
        a causal additive mask: 0 on a (possibly BANDED) region at or
        below the diagonal, ONE large negative value everywhere else --
        the decoder-exporter idiom (models/gpt.py), including
        Mistral-style sliding windows (models/llama.py
        mistral_causal_lm). Returns (add_node, (mask_value, window)) --
        mask_value is the EXECUTOR-exact dequantized constant and
        window the band width (None = full causal), so the fused
        kernel's in-VMEM add is bit-identical to the unfused graph's --
        or (None, None)."""
        from .tensor import FTensor

        node = producer.get(value.name)
        if node is None or node.op != "Add":
            return None, None
        consts = [v for v in node.inputs if isinstance(v, Constant)]
        if len(consts) != 1 or consts[0].data is None:
            return None, None
        d = consts[0].data
        if isinstance(d, QTensor):
            arr = np.asarray(d.dequantize().data)
        elif isinstance(d, FTensor):
            arr = np.asarray(d.data)
        else:
            return None, None
        if arr.ndim < 2 or arr.shape[-1] != arr.shape[-2] \
                or any(s != 1 for s in arr.shape[:-2]):
            return None, None
        m = arr.reshape(arr.shape[-2], arr.shape[-1])
        n = m.shape[0]
        # band width from the last row's visible run (full causal = n)
        window = int((m[n - 1] == 0).sum())
        if window == 0:
            return None, None
        i, j = np.indices(m.shape)
        visible = (j <= i) & (j > i - window)
        if not (m[visible] == 0).all():
            return None, None
        masked = m[~visible]
        if masked.size == 0:
            return None, None  # window == n == 1: nothing to fuse on
        if not (masked == masked[0]).all() or not masked[0] < -1e4:
            return None, None
        return node, (float(masked[0]), None if window >= n else window)

    def _match_score_bias(self, producer, value):
        """Match ``Add(x, C)`` feeding a Softmax where C is a general
        additive score-bias constant: T5 relative position bias, ALiBi
        slopes, sliding-window/document masks, or a combined
        bias+causal-mask constant (T5 decoder) -- anything the causal
        matcher above did not claim. The constant must broadcast over
        the batch dim (every dim before the last three is 1); its last
        three dims broadcast to the scores' [H, Nq, Nk]. Returns
        (add_node, bias_constant_value) or (None, None). The VALUE is
        returned, not a folded array, so execution dequantizes it
        exactly as the unfused Add would (bit-identical fusion)."""
        from .tensor import FTensor

        node = producer.get(value.name)
        if node is None or node.op != "Add":
            return None, None
        consts = [v for v in node.inputs if isinstance(v, Constant)]
        if len(consts) != 1 or consts[0].data is None:
            return None, None
        d = consts[0].data
        if not isinstance(d, (QTensor, FTensor)):
            return None, None
        shape = tuple(d.data.shape)
        if len(shape) < 2 or any(s != 1 for s in shape[:-3]):
            return None, None
        return node, consts[0]

    def _match_attention_hs(self, mm1, mm2, producer, consumers):
        """Match the standard multi-head split/merge around a fused
        attention core:

            x{q,k,v} -> Reshape[B,N,H,D] -> Transpose(0,2,1,3)   (q, v)
            xk       -> Reshape -> Transpose(0,2,1,3) -> Transpose(0,1,3,2)
                        (or the composed single Transpose(0,2,3,1) some
                        exporters emit for the key side)
            mm2 out  -> Transpose(0,2,1,3) -> Reshape[B,N,H*D]

        The head-split Reshape's target shape may be the torch
        exporter's Concat(batch_dim, [-1, H, D] constant) or a plain
        4-dim shape constant (node or initializer).

        Returns (xq, xk, xv, merged_out_value, num_heads, dead_nodes)
        or None."""

        def perm_is(node, perm):
            return tuple(int(p) for p in node.attrs.get("perm", ())) == perm

        def heads_from_reshape(node):
            """Head count from a head-split Reshape's target shape."""
            shp = node.inputs[1]
            shape_src = producer.get(shp.name)
            if shape_src is not None and shape_src.op == "Concat":
                # Concat(batch_dim, Constant[-1 (or N), H, D])
                tail = producer.get(shape_src.inputs[-1].name)
                if tail is None or tail.op != "Constant":
                    return None
                tail_arr = np.asarray(tail.attrs["value"]).reshape(-1)
                return int(tail_arr[1]) if tail_arr.size == 3 else None
            # plain 4-dim shape constant: [B|-1, N|-1, H, D]
            if shape_src is not None and shape_src.op == "Constant":
                arr = np.asarray(shape_src.attrs["value"]).reshape(-1)
            elif isinstance(shp, Constant) and shp.data is not None:
                arr = np.asarray(shp.data.data).reshape(-1)
            else:
                return None
            return int(arr[2]) if arr.size == 4 and int(arr[2]) > 0 \
                else None

        def back(value, perm_alts):
            """value <- Transpose chain (one of ``perm_alts``) <-
            Reshape <- src"""
            for perms in perm_alts:
                dead = []
                v = value
                ok = True
                for perm in perms:
                    node = producer.get(v.name)
                    if node is None or node.op != "Transpose" \
                            or not perm_is(node, perm) \
                            or len(consumers(node.outputs[0])) != 1:
                        ok = False
                        break
                    dead.append(node)
                    v = node.inputs[0]
                if not ok:
                    continue
                node = producer.get(v.name)
                if node is None or node.op != "Reshape" \
                        or len(consumers(node.outputs[0])) != 1:
                    continue
                num_heads = heads_from_reshape(node)
                if num_heads is None:
                    continue
                dead.append(node)
                return node.inputs[0], num_heads, dead
            return None

        rq = back(mm1.inputs[0], [[(0, 2, 1, 3)]])
        # key side: the two-step transpose, or its composition
        rk = back(mm1.inputs[1], [[(0, 1, 3, 2), (0, 2, 1, 3)],
                                  [(0, 2, 3, 1)]])
        rv = back(mm2.inputs[1], [[(0, 2, 1, 3)]])
        if rq is None or rk is None or rv is None:
            return None
        if not (rq[1] == rk[1] == rv[1]):
            return None
        # forward: mm2 -> Transpose(0,2,1,3) -> Reshape -> merged
        cons = consumers(mm2.outputs[0])
        if len(cons) != 1 or cons[0].op != "Transpose" \
                or not perm_is(cons[0], (0, 2, 1, 3)):
            return None
        tr_out = cons[0]
        cons2 = consumers(tr_out.outputs[0])
        if len(cons2) != 1 or cons2[0].op != "Reshape":
            return None
        rs_out = cons2[0]
        dead = rq[2] + rk[2] + rv[2] + [tr_out, rs_out]
        return (rq[0], rk[0], rv[0], rs_out.outputs[0], rq[1], dead)

    def fuse_gelu(self) -> int:
        """Fuse the exporter's exact-GELU chain
        Div(x, sqrt2) -> Erf -> Add(1) -> Mul(x, .) -> Mul(., 0.5)
        into ONE FusedGelu node. In f32 exact mode the node replays the
        identical op sequence (bit-exact); in the bf16 serving mode it
        computes x * sigmoid(K1*x + K3*x^3) -- the tanh approximation
        in sigmoid form, where the +1 / x0.5 fold into the logistic
        identity 0.5*(1+tanh(z)) == sigmoid(2z) -- removing four full
        VPU passes over the [tokens, intermediate] tensor inside the
        MLP mega-fusion, which is VPU-bound (BENCH_HISTORY.md round 3).
        Returns the number of fused chains."""
        producer = {}
        for node in self.nodes:
            for out in node.outputs:
                producer[out.name] = node

        def consumers(value):
            return [n for n in self.nodes if value in n.inputs]

        def scalar_const(value):
            """Scalar value the executor computes for this graph value:
            a Constant NODE's attrs (exporters emit sqrt2/1/0.5 that
            way -- exact), an initializer Constant, or its dequantized
            value when the PTQ pass quantized the initializer."""
            prod = producer.get(getattr(value, "name", None))
            if prod is not None and prod.op == "Constant":
                arr = np.asarray(prod.attrs["value"])
                return float(arr.reshape(-1)[0]) if arr.size == 1 else None
            if not isinstance(value, Constant) or value.data is None:
                return None
            d = value.data
            arr = np.asarray(d.data)
            if arr.size != 1:
                return None
            v = float(arr.reshape(-1)[0])
            if isinstance(d, QTensor):
                if d.zero_point is not None:
                    v -= float(np.asarray(d.zero_point).reshape(-1)[0])
                v *= float(np.float32(d.scale))
            return v

        fused = 0
        for erf in [n for n in self.nodes if n.op == "Erf"]:
            div = producer.get(erf.inputs[0].name)
            if div is None or div.op not in ("Div", "Mul"):
                continue
            c = scalar_const(div.inputs[1])
            via_div = div.op == "Div"
            # the GELU constant (sqrt2 / its reciprocal), allowing the
            # PTQ pass's int8 rounding of the scalar (up to ~1%)
            target = np.sqrt(2.0) if via_div else 1 / np.sqrt(2.0)
            if c is None or abs(c - target) > 0.02 * target:
                continue
            x_val = div.inputs[0]
            cons = consumers(erf.outputs[0])
            if len(cons) != 1 or cons[0].op != "Add":
                continue
            add = cons[0]
            one_val = add.inputs[1] if add.inputs[0] is erf.outputs[0] \
                else add.inputs[0]
            one = scalar_const(one_val)
            if one is None or abs(one - 1.0) > 0.01:
                continue
            cons2 = consumers(add.outputs[0])
            if len(cons2) != 1 or cons2[0].op != "Mul":
                continue
            mul1 = cons2[0]
            m_other = mul1.inputs[1] if mul1.inputs[0] is add.outputs[0] \
                else mul1.inputs[0]
            if m_other is not x_val:
                continue
            cons3 = consumers(mul1.outputs[0])
            if len(cons3) != 1 or cons3[0].op != "Mul":
                continue
            mul2 = cons3[0]
            half_val = mul2.inputs[1] if mul2.inputs[0] is mul1.outputs[0] \
                else mul2.inputs[0]
            half = scalar_const(half_val)
            if half is None or abs(half - 0.5) > 0.005:
                continue
            if any(len(consumers(v)) != 1
                   for v in (div.outputs[0], mul1.outputs[0])):
                continue
            # constants ride as INPUTS so the executor dequantizes them
            # through the normal path -- the exact-mode replay is then
            # bitwise identical in every numerics mode (f32 and x64)
            fnode = Node(f"{mul2.name}/fused_gelu", "FusedGelu",
                         {"via_div": via_div,
                          # exactly-1/0.5 constants make the sigmoid
                          # identity pure: y = x * sigmoid(z), no
                          # affine correction passes
                          "pure": one == 1.0 and half == 0.5},
                         [x_val, div.inputs[1], one_val, half_val],
                         [mul2.outputs[0]])
            idx = self.nodes.index(mul2)
            self.nodes[idx] = fnode
            for dead in (div, erf, add, mul1):
                self.nodes.remove(dead)
            x_val.outputs = [fnode if n in (div, mul1) else n
                             for n in x_val.outputs]
            x_val.outputs = list(dict.fromkeys(x_val.outputs))
            for cv in (div.inputs[1], one_val, half_val):
                cv.outputs = [fnode if n in (div, add, mul2) else n
                              for n in cv.outputs]
                cv.outputs = list(dict.fromkeys(cv.outputs))
            mul2.outputs[0].inputs = [fnode]
            fused += 1
        if fused:
            self._jit_cache.clear()
        return fused

    def merge_parallel_matmuls(self) -> int:
        """Horizontally fuse MatMul nodes that share the same activation
        input into ONE wide dot (weights concatenated along the
        output-channel axis) plus in-graph splitting -- the ViT Q/K/V
        projection pattern. One MXU dot of [M, K] x [K, 3N] replaces
        three [M, K] x [K, N] dots: the wider N feeds the 128x128
        systolic array better and the activation tile is read once
        instead of three times.

        Bit-identical: the merged weight carries a per-column scale
        vector, each output column's dequantize multiplies by the SAME
        f32 scale as before, and the per-segment output slices carry
        the original scalar qparams -- every downstream f32 op is
        unchanged (asserted in tests/test_kernels.py).

        Returns the number of merged groups.
        """
        # group mergeable MatMuls by their shared activation value
        groups: dict[int, list[Node]] = {}
        order = {id(n): i for i, n in enumerate(self.nodes)}
        for node in self.nodes:
            if node.op != "MatMul" or len(node.inputs) != 2:
                continue
            w = node.inputs[1]
            if not isinstance(w, Constant) or not isinstance(w.data, QTensor):
                continue
            qt = w.data
            if np.asarray(qt.data).ndim != 2 or qt.zero_point is not None:
                continue
            if getattr(qt.scale, "ndim", 0) > 0:
                continue  # per-channel weights: scales are already vectors
            if len(w.outputs) != 1:
                continue  # weight shared by several nodes: leave alone
            groups.setdefault(id(node.inputs[0]), []).append(node)

        merged = 0
        for nodes in groups.values():
            nodes = [n for n in nodes
                     if np.asarray(n.inputs[1].data.data).shape[0]
                     == np.asarray(nodes[0].inputs[1].data.data).shape[0]
                     and n.inputs[1].data.bit_width
                     == nodes[0].inputs[1].data.bit_width]
            if len(nodes) < 2:
                continue
            nodes.sort(key=lambda n: order[id(n)])
            x_val = nodes[0].inputs[0]
            weights = [n.inputs[1].data for n in nodes]
            segs = [int(np.asarray(w.data).shape[1]) for w in weights]
            seg_scales = [float(np.float32(w.scale)) for w in weights]
            wdata = np.concatenate([np.asarray(w.data) for w in weights],
                                   axis=1)
            scale_vec = np.concatenate(
                [np.full((1, s), np.float32(sc), np.float32)
                 for s, sc in zip(segs, seg_scales)], axis=1)
            bw = weights[0].bit_width
            mname = f"{nodes[0].name}/merged_w"
            mconst = Constant(mname, [], QTensor(wdata, bw, scale_vec, None))
            self.quant_params[mname] = QuantizationParams(scale_vec, None)

            fnode = Node(f"{nodes[0].name}/merged", "MatMulSplit",
                         {"segments": segs, "segment_scales": seg_scales,
                          # original weight initializer names, so
                          # export_qdq can re-slice per-initializer
                          # int8 payloads out of the merged tensor
                          "source_weights": [n.inputs[1].name
                                             for n in nodes]},
                         [x_val, mconst],
                         [n.outputs[0] for n in nodes])
            mconst.outputs = [fnode]
            # splice: new node at the first group member's position
            idx = self.nodes.index(nodes[0])
            self.nodes[idx] = fnode
            for n in nodes[1:]:
                self.nodes.remove(n)
            # relink values
            x_val.outputs = [fnode if n in nodes else n for n in x_val.outputs]
            x_val.outputs = list(dict.fromkeys(x_val.outputs))
            for n in nodes:
                old_w = n.inputs[1]
                if old_w in self.values:
                    self.values.remove(old_w)
                n.outputs[0].inputs = [fnode]
            self.values.append(mconst)
            merged += 1

        if merged:
            if "MatMulSplit" not in self.quantized_ops:
                self.quantized_ops = tuple(self.quantized_ops) \
                    + ("MatMulSplit",)
            self._jit_cache.clear()
            self._dp_cache = None
            self._sharded_param_cache = None
            if self.mesh is not None:
                # merged '<node>/merged_w' params inherit the SOURCE
                # weights' sharding rule (the group shares one spec --
                # Q/K/V all column-shard), then refresh the shardings
                rules = getattr(self, "_shard_rules", None)
                if rules is not None:
                    src_of = {}
                    for node in self.nodes:
                        if node.op == "MatMulSplit" \
                                and "source_weights" in node.attrs:
                            src_of[node.inputs[1].name] = \
                                node.attrs["source_weights"][0]

                    def rules2(name, ndim, _orig=rules, _map=src_of):
                        return _orig(_map.get(name, name), ndim)

                    self._shard_rules = rules2
                from .parallel.sharding import param_shardings
                self.parameter_shardings = param_shardings(
                    self, self.mesh, getattr(self, "_shard_rules", None))
        return merged

    def int8_dataflow(self) -> int:
        """Plan EARLY quantization: a value whose consumers all quantize
        it anyway -- quantized ops directly ("TinyqQuant",
        reference: numpy_quant/model.py:503-527), or value-preserving
        shape ops leading only to such consumers with identical
        calibrated qparams -- is produced as an int8 QTensor at its
        producer instead of a float tensor.

        This is a LAYOUT optimization, not a numerics change: the same
        quantize() with the same qparams runs, just once at the
        producer instead of per consumer, so outputs are bit-identical
        to the unplanned executor. XLA then fuses the whole
        dot -> dequantize -> bias-add -> quantize chain into the matmul
        kernel and the residual stream stays int8 in HBM (~4x less
        activation traffic than f32 accumulators).

        Returns the number of values planned. Run AFTER fuse_attention()
        for full coverage of the attention block.
        """
        out_names = {o.name for o in self.outputs}
        qp = self.quant_params

        def scalar_qp(name):
            p = qp.get(name)
            if p is None or p.scale is None:
                return None
            if getattr(p.scale, "ndim", 0) > 0:
                return None  # per-channel scales stay on the float path
            if float(np.float32(p.scale)) == 0.0:
                return None  # degenerate (constant-valued activation)
            return p

        def qp_equal(a, b):
            if a is None or b is None:
                return False
            if np.float32(a.scale) != np.float32(b.scale):
                return False
            if (a.zero_point is None) != (b.zero_point is None):
                return False
            return a.zero_point is None or int(a.zero_point) == int(b.zero_point)

        planned: set[str] = set()
        # nodes are topologically ordered; walking them in reverse decides
        # every passthrough consumer's outputs before its inputs
        for node in reversed(self.nodes):
            for value in node.outputs:
                if value.name in out_names or not value.outputs:
                    continue
                p = scalar_qp(value.name)
                if p is None:
                    continue
                ok = True
                for consumer in value.outputs:
                    if consumer.op == "Shape":
                        # metadata-only consumer: Shape reads dims, never
                        # data, and handles QTensor directly
                        continue
                    if consumer.op in self.quantized_ops:
                        # only operand positions that quantize at the
                        # model bit width (never a Gemm bias)
                        if consumer.op == "Gemm" and len(consumer.inputs) > 2 \
                                and consumer.inputs[2] is value:
                            ok = False
                            break
                        continue
                    if consumer.op in _PASSTHROUGH_OPS \
                            and consumer.inputs[0] is value \
                            and all(o.name in planned
                                    and qp_equal(p, scalar_qp(o.name))
                                    for o in consumer.outputs):
                        continue
                    ok = False
                    break
                if ok:
                    planned.add(value.name)
        # fused-attention nodes with planned outputs requantize inside
        # the Pallas kernel epilogue (no separate XLA quantize pass)
        for node in self.nodes:
            if node.op in ("FusedAttention", "FusedAttentionHS") \
                    and node.outputs[0].name in planned:
                p = qp[node.outputs[0].name]
                node.attrs["out_requant"] = (
                    float(np.float32(p.scale)),
                    None if p.zero_point is None else int(p.zero_point))
        self._int8_values = planned
        self._jit_cache.clear()
        return len(planned)

    def narrow_gather(self) -> int:
        """Dead-token elimination: hoist a scalar token-axis Gather
        (e.g. the ViT CLS-token pick before the classifier head,
        reference models/vit.py:40-66 exports `hidden[:, 0]` this way)
        backward through per-token ops, so everything between the last
        token-mixing op and the Gather computes ONLY the consumed
        token.

        On ViT-Base this narrows the last encoder layer's MLP
        (fc1 -> GELU -> fc2), its attention out-projection, both of its
        LayerNorms' tails and the final LayerNorm from 197 tokens to 1.
        The surviving row sees the same op sequence on the same values
        (integer matmuls are exact; float LN/erf are per token with the
        same within-row reduce order), so outputs are unchanged.

        An op hoists when slicing its inputs at the gathered token is
        value-identical to slicing its output:

        * per-token unary: LayerNormalization(axis=-1), FusedGelu, Erf,
          Identity, Tanh, Sigmoid, Relu, Neg, Sqrt;
        * ``MatMul x @ W`` with a rank-2 constant rhs (output rows are
          per input token);
        * binary Add/Sub/Mul/Div whose every operand either matches the
          full token shape (it gets its own hoisted Gather) or has
          rank <= 1 (broadcasts below the token axis);
        * ``FusedAttentionHS`` via its q input only (each output row
          depends on its own q row and all of K/V): the kernel then
          computes ONE query row (narrow-q path, kernels/attention.py)
          and the hoist continues up the q-projection chain.

        The hoist stops at multi-consumer values (anything still
        consumed full-width, e.g. the residual trunk the next layer's
        LayerNorm reads), graph outputs, and token-mixing ops
        (Softmax, Concat). Requires static shapes
        (``_infer_shapes``); returns the number of hoist steps."""
        shapes = self._infer_shapes()
        if shapes is None:
            return 0
        out_names = {o.name for o in self.outputs}

        UNARY = {"LayerNormalization", "FusedGelu", "Erf", "Identity",
                 "Tanh", "Sigmoid", "Relu", "Neg", "Sqrt"}
        BINARY = {"Add", "Sub", "Mul", "Div"}

        def consumers(value):
            return [n for n in self.nodes if value in n.inputs]

        def producer_of(value):
            for n in self.nodes:
                if value in n.outputs:
                    return n
            return None

        moved = 0
        progress = True
        while progress:
            progress = False
            for gnode in [n for n in self.nodes if n.op == "Gather"]:
                if int(gnode.attrs.get("axis", 0)) != 1 \
                        or len(gnode.inputs) < 2:
                    continue
                idx_val = gnode.inputs[1]
                if shapes.get(idx_val.name, None) != ():
                    continue  # non-scalar index: axis survives
                v = gnode.inputs[0]
                if not isinstance(v, Variable) or v.name in out_names \
                        or len(shapes.get(v.name, ())) != 3:
                    continue
                if consumers(v) != [gnode]:
                    continue  # still consumed full-width elsewhere
                p = producer_of(v)
                if p is None or len(p.outputs) != 1:
                    continue
                if p.op in UNARY:
                    if p.op == "LayerNormalization":
                        if int(p.attrs.get("axis", -1)) not in (-1, 2):
                            continue
                        p.attrs["axis"] = -1  # rank drops below
                    slice_idx = [0]
                elif p.op == "MatMul":
                    w = p.inputs[1]
                    if not isinstance(w, Constant) \
                            or len(shapes.get(w.name, ())) != 2:
                        continue
                    slice_idx = [0]
                elif p.op == "FusedAttentionHS":
                    # each attention output row depends on its own q row
                    # and ALL of K/V, so gathering the output token is
                    # gathering the q input token: the kernel runs with
                    # one query row against full K/V (narrow-q path,
                    # kernels/attention.py) -- on ViT this narrows the
                    # LAST layer's score/context work and its whole
                    # q-projection chain from 197 rows to 1
                    if "causal_mask_val" in p.attrs or len(p.inputs) > 3:
                        # causal masking / the per-head score bias (4th
                        # input) index q rows by absolute position; a
                        # gathered q row would be masked/biased as row 0
                        continue
                    slice_idx = [0]
                elif p.op in BINARY:
                    vshape = shapes[v.name]
                    slice_idx, ok = [], True
                    for i, iv in enumerate(p.inputs):
                        ish = shapes.get(iv.name)
                        if ish == vshape:
                            slice_idx.append(i)
                        elif ish is not None and len(ish) <= 1:
                            pass  # broadcasts below the token axis
                        else:
                            ok = False
                            break
                    if not ok or not slice_idx:
                        continue
                else:
                    continue  # token-mixing or unknown: stop here

                out_val = gnode.outputs[0]
                p_pos = self.nodes.index(p)
                # the index's producer (a no-input Constant node) must
                # run before the hoisted Gathers it feeds
                idx_prod = producer_of(idx_val)
                if idx_prod is not None \
                        and self.nodes.index(idx_prod) > p_pos:
                    if idx_prod.inputs:
                        continue  # non-constant index source: don't move
                    self.nodes.remove(idx_prod)
                    self.nodes.insert(p_pos, idx_prod)
                    p_pos += 1
                new_inputs = list(p.inputs)
                for i in slice_idx:
                    iv = p.inputs[i]
                    # reuse an identical Gather on iv (two hoist fronts
                    # meeting on the residual trunk)
                    reuse = None
                    for n in self.nodes:
                        if n is not gnode and n.op == "Gather" \
                                and len(n.inputs) > 1 \
                                and n.inputs[0] is iv \
                                and n.inputs[1] is idx_val \
                                and int(n.attrs.get("axis", 0)) == 1:
                            reuse = n
                            break
                    if reuse is not None:
                        rpos = self.nodes.index(reuse)
                        if rpos > p_pos:  # keep topological order
                            self.nodes.remove(reuse)
                            self.nodes.insert(p_pos, reuse)
                            p_pos += 1
                        new_inputs[i] = reuse.outputs[0]
                        if p not in reuse.outputs[0].outputs:
                            reuse.outputs[0].outputs.append(p)
                        continue
                    gv = Variable(f"{iv.name}/narrowed", inputs=[],
                                  outputs=[p])
                    gn = Node(f"{p.name}/narrow_gather_{i}", "Gather",
                              {"axis": 1}, [iv, idx_val], [gv])
                    gv.inputs = [gn]
                    iv.outputs = list(iv.outputs) + [gn]
                    self.values.append(gv)
                    qp = self.quant_params.get(iv.name)
                    if qp is not None:
                        self.quant_params[gv.name] = qp
                    ish = shapes[iv.name]
                    shapes[gv.name] = (ish[0],) + ish[2:]
                    self.nodes.insert(p_pos, gn)
                    p_pos += 1
                    new_inputs[i] = gv
                p.inputs = new_inputs
                p.outputs = [out_val]
                out_val.inputs = [p]
                self.nodes.remove(gnode)
                if v in self.values:
                    self.values.remove(v)
                self.quant_params.pop(v.name, None)
                moved += 1
                progress = True
                break
        if moved:
            self._jit_cache.clear()
        return moved

    def optimize(self, verbose: bool = False) -> dict:
        """Apply the graph-level performance passes that preserve the
        executor's numerics: attention fusion (bit-identical kernel)
        and early int8 quantization (bit-identical layout change).
        Returns a {pass: count} summary plus per-Softmax fusion
        failures (node name, reason) so a pattern miss on a foreign
        exporter's graph is visible, not a silent perf cliff.
        ``verbose=True`` prints the failures."""
        fused = self.fuse_attention()
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
        return {"fuse_attention": fused, "merge_parallel_matmuls": merged,
                "fuse_gelu": gelu, "narrow_gather": narrowed,
                "int8_dataflow": planned, "fusion_failures": failures}

    def pack_weights(self) -> int:
        """Switch 2-D symmetric MatMul weights to packed storage
        (kernels/pack.py; split-K layout for bits 1/2/4/8, bit-planes
        for odd widths): exactly bit_width bits per value in HBM.
        Returns the number of packed weights.

        Under a tensor-parallel mesh, a weight the sharding rules
        row-(K-)shard re-packs per device into the stacked layout
        (tensor.pack_qtensor shards=...), so TP memory scales for
        row-sharded payloads too instead of silently replicating."""
        from .tensor import pack_qtensor

        def _row_shards(name: str) -> int:
            """Mesh size of the model axis if the rules row-shard this
            2-D weight, else 1."""
            rules = getattr(self, "_shard_rules", None)
            if self.mesh is None or rules is None:
                return 1
            m_ax = getattr(self, "model_axis", "model")
            if m_ax not in self.mesh.axis_names or self.mesh.shape[m_ax] < 2:
                return 1
            parts = tuple(rules(name, 2))
            if parts and parts[0] == m_ax \
                    and all(p is None for p in parts[1:]):
                return self.mesh.shape[m_ax]
            return 1

        packed = 0
        for value in self.values:
            if not isinstance(value, Constant) or not isinstance(value.data, QTensor):
                continue
            qt = value.data
            if qt.zero_point is not None or np.asarray(qt.data).ndim != 2:
                continue
            if qt.bit_width > 8:
                continue
            # only weights consumed exclusively as MatMul rhs
            if not value.outputs or not all(
                    n.op in ("MatMul", "MatMulSplit") and len(n.inputs) > 1
                    and n.inputs[1] is value for n in value.outputs):
                continue
            shards = _row_shards(value.name) if qt.bit_width in (1, 2, 4, 8) \
                else 1
            value.data = pack_qtensor(qt, shards=shards)
            packed += 1
        self._jit_cache.clear()
        self._sharded_param_cache = None
        self._dp_cache = None
        if packed and self.mesh is not None:
            # refresh shardings: packed payloads column-shard over the
            # model axis where the logical weight did (parallel/sharding)
            from .parallel.sharding import param_shardings
            self.parameter_shardings = param_shardings(
                self, self.mesh, getattr(self, "_shard_rules", None))
        return packed

    def correct_biases(self, float_model: "Model", inputs,
                       passes: int = 1) -> int:
        """Empirical bias correction (PTQ accuracy pass; the empirical
        variant of AIMET's bias correction, arXiv:2201.08442 §IV):
        quantization shifts each weight layer's expected output --
        E[y_q] != E[y_f] -- and a per-output-channel shift folds exactly
        into the layer's additive bias. For every quantized weight op,
        the mean error over the calibration batch is SUBTRACTED from
        the bias:

        * Gemm / integer Conv bias: the 4x-bit-width payload (scale
          s_x*s_w) absorbs ``rint(corr / bias_scale)``;
        * MatMul followed by a rank-1-constant Add (the exporter's
          linear form): the float bias absorbs ``corr`` directly,
          measured at the Add output (the additive bias commutes, so
          the error there equals the error at the MatMul output).

        ``float_model`` is the unquantized source executor (the oracle);
        ``inputs`` the calibration batch. Runs both executors eagerly in
        record mode; ``passes > 1`` re-measures after correcting so
        downstream layers see corrected upstream activations. Returns
        the number of corrected biases (summed over passes).

        Parity-plus like per-channel/percentile calibration: the
        reference has no accuracy passes beyond min/max PTQ
        (reference model.py:328-442). Most useful for low-bit weights
        (W4A8), where weight rounding error is largest."""
        import jax.numpy as jnp

        from .utils.parity import record_all_values

        corrected = 0
        for _ in range(int(passes)):
            f_acts = record_all_values(float_model, inputs)
            q_acts = record_all_values(self, inputs)
            for node in self.nodes:
                if node.op not in ("MatMul", "Gemm", "Conv") \
                        or len(node.inputs) < 2:
                    continue
                w = node.inputs[1]
                if not isinstance(w, Constant) \
                        or not isinstance(w.data, (QTensor, PackedQTensor)):
                    continue  # activation-activation matmul: no weight
                if node.op in ("Gemm", "Conv"):
                    if len(node.inputs) < 3 \
                            or not isinstance(node.inputs[2], Constant) \
                            or not isinstance(node.inputs[2].data, QTensor):
                        continue
                    name = node.outputs[0].name
                    if name not in f_acts or name not in q_acts:
                        continue
                    err = q_acts[name].astype(np.float64) \
                        - f_acts[name].astype(np.float64)
                    if node.op == "Conv":
                        if err.ndim != 4:
                            continue
                        corr = err.mean(axis=(0, 2, 3))  # NCHW channel
                    else:
                        corr = err.reshape(-1, err.shape[-1]).mean(0)
                    corrected += self._shift_q_bias(node.inputs[2], corr)
                else:  # MatMul: bias lives in a consuming rank-1 Add
                    out_val = node.outputs[0]
                    cons = [n for n in self.nodes if out_val in n.inputs]
                    if len(cons) != 1 or cons[0].op != "Add":
                        continue
                    add = cons[0]
                    other = add.inputs[1] if add.inputs[0] is out_val \
                        else add.inputs[0]
                    if not isinstance(other, Constant) or not isinstance(
                            other.data, (FTensor, QTensor)):
                        continue
                    if np.asarray(getattr(other.data, "data")).ndim != 1:
                        continue
                    name = add.outputs[0].name
                    if name not in f_acts or name not in q_acts:
                        continue
                    err = q_acts[name].astype(np.float64) \
                        - f_acts[name].astype(np.float64)
                    corr = err.reshape(-1, err.shape[-1]).mean(0)
                    if isinstance(other.data, FTensor):
                        bias_arr = np.asarray(other.data.data, np.float32)
                        if corr.shape != bias_arr.shape:
                            continue
                        other.data = FTensor(bias_arr
                                             - corr.astype(np.float32))
                        corrected += 1
                    else:
                        # the PTQ pass quantized the Add constant: shift
                        # in its integer domain (one bias-scale step
                        # granularity, clipped to the bias bit range)
                        corrected += self._shift_q_bias(other, corr)
            self._dp_cache = None
            self._sharded_param_cache = None
        return corrected

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

    def _shift_q_bias(self, value: Constant, corr: np.ndarray) -> int:
        """Subtract a per-channel float correction from a quantized bias
        Constant, in its integer domain: q -= rint(corr / scale), clipped
        to the bias bit range. Returns 1 if applied, 0 if skipped."""
        from .quantization import qrange
        import jax.numpy as jnp

        qt = value.data
        scale = np.asarray(qt.scale, np.float32).reshape(-1)
        arr = np.asarray(qt.data)
        if corr.shape != arr.shape or np.any(scale == 0):
            return 0
        delta = np.rint(corr / scale.astype(np.float64))
        if not np.all(np.isfinite(delta)):
            return 0
        lo, hi = qrange(qt.bit_width)
        newq = np.clip(arr - delta, lo, hi).astype(arr.dtype)
        value.data = QTensor(jnp.asarray(newq), qt.bit_width, qt.scale,
                             qt.zero_point)
        return 1

"""ONNX operator implementations over the tensor layer.

Covers the reference's 26-op set (reference: numpy_quant/model.py:65-213)
plus a handful of common extras. Class-polymorphic: the same code path
serves FTensor and QTensor where the reference's does. Spec deviations
of the reference are implemented spec-correct here (SURVEY.md §5.5-5.7):
Unsqueeze returns a list, Gather removes the axis for rank-0 indices,
ReduceMean reads ``axes``, Slice honours ``steps``, Gemm honours
alpha/beta.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..tensor import (
    DITensor,
    FTensor,
    ITensor,
    PackedQTensor,
    QTensor,
    Tensor,
    concat,
    fconv2d,
    where,
)


# (mesh, data_axis, model_axis) execution context, set by Model._forward:
# Pallas kernels cannot run under plain GSPMD partitioning, so mesh-aware
# ops wrap their kernels in shard_map over these axes.
_EXEC_MESH = None


def _shard_map_kernel(fn, operands, specs, out_spec):
    """Run ``fn(*operands)`` under shard_map on the current exec mesh."""
    import jax

    mesh = _EXEC_MESH[0]
    try:
        from jax import shard_map as _sm
    except ImportError:
        from jax.experimental.shard_map import shard_map as _sm
    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # annotation, which the checker would otherwise reject
    return _sm(fn, mesh=mesh, in_specs=specs, out_specs=out_spec,
               check_vma=False)(*operands)


def _attention_shard_spec(batch_dim_size: int, num_heads: int, ndim: int):
    """(PartitionSpec, local num_heads divisor) for fused attention
    inputs [B, N, H*D] (or [BH, N, D] -> heads replicated) under the
    current mesh. Axes that do not divide evenly stay replicated."""
    from jax.sharding import PartitionSpec as P

    mesh, data_axis, model_axis = _EXEC_MESH
    d_ax = data_axis if data_axis in mesh.axis_names \
        and batch_dim_size % mesh.shape[data_axis] == 0 \
        and mesh.shape[data_axis] > 1 else None
    m_ax = model_axis if ndim == 3 and model_axis in mesh.axis_names \
        and mesh.shape[model_axis] > 1 \
        and num_heads % mesh.shape[model_axis] == 0 else None
    tp = mesh.shape[m_ax] if m_ax else 1
    spec = P(d_ax, None, m_ax)
    return spec, tp


def _packed_matmul(a: QTensor, b: PackedQTensor) -> FTensor:
    """Quantized activation x packed sub-byte weight -> dequantized f32,
    via the fused Pallas kernel (kernels/qmatmul.py). Falls back to the
    generic path when the activation carries a tensor zero point or the
    payload is the TP-stacked layout (whose unpack is shard-local XLA;
    the GSPMD dot then contracts per device and psums)."""
    import jax

    if b.layout == "splitk_stacked" \
            or (a.zero_point is not None
                and getattr(a.zero_point, "ndim", 0) > 0):
        return a.matmul(b.unpack()).dequantize()
    from ..kernels.qmatmul import packed_qmatmul, splitk_qmatmul

    data = a.data
    lead = data.shape[:-1]
    x2 = data.reshape(-1, data.shape[-1])
    if getattr(b.scale, "ndim", 0) > 0:
        scale_kw = {"w_scale_vec": np.asarray(b.scale, np.float32)
                    .reshape(1, b.n)}
    else:
        scale_kw = {"w_scale": float(np.float32(b.scale))}
    kernel_fn = splitk_qmatmul if b.layout == "splitk" else packed_qmatmul
    y2 = kernel_fn(
        x2, b.planes, b.colsum, None,
        bits=b.bit_width, bit_width=a.bit_width,
        x_scale=float(np.float32(a.scale)),
        x_zp=None if a.zero_point is None else int(a.zero_point),
        quantize_x=False,
        interpret=jax.default_backend() == "cpu", **scale_kw)
    return FTensor(y2.reshape(*lead, b.n))


# simple float-only unary ops: ONNX name -> jnp ufunc (spec admits only
# float inputs for all of these, so they live in the device float domain)
_UNARY_FLOAT_FNS = {
    "Exp": jnp.exp, "Log": jnp.log,
    "Sin": jnp.sin, "Cos": jnp.cos, "Tan": jnp.tan,
    "Asin": jnp.arcsin, "Acos": jnp.arccos, "Atan": jnp.arctan,
    "Sinh": jnp.sinh, "Cosh": jnp.cosh,
    "Asinh": jnp.arcsinh, "Acosh": jnp.arccosh, "Atanh": jnp.arctanh,
    "Floor": jnp.floor, "Ceil": jnp.ceil,
    "Reciprocal": jnp.reciprocal,
}


def _gather_nd(xp, data, indices, batch_dims: int):
    """ONNX GatherND: index the leading ``indices.shape[-1]`` dims of
    ``data`` (after ``batch_dims`` shared leading batch axes) with the
    int tuples in ``indices``. Vectorised advanced indexing; works for
    both numpy (host fold) and jnp (device)."""
    k = indices.shape[-1]
    loc_shape = indices.shape[:-1]
    loc = []
    for d in range(batch_dims):
        # broadcasted batch index: arange over dim d, shaped to align
        # with the shared leading axes of ``indices``
        shape = [1] * len(loc_shape)
        shape[d] = data.shape[d]
        loc.append(xp.arange(data.shape[d]).reshape(shape))
    for i in range(k):
        loc.append(indices[..., i])
    return data[tuple(loc)]


def _resolve_reshape_shape(x_shape, shape: np.ndarray, allowzero: int) -> tuple:
    """ONNX Reshape: 0 copies the input dim (unless allowzero), -1 infers."""
    out = list(int(d) for d in shape)
    if not allowzero:
        for i, d in enumerate(out):
            if d == 0:
                out[i] = int(x_shape[i])
    return tuple(out)


def _resize_coords(out_size: int, in_size: int, scale: float, ctm: str):
    """Source coordinate of each output index per the ONNX Resize
    coordinate_transformation_mode."""
    i = np.arange(out_size, dtype=np.float64)
    if ctm == "half_pixel":
        return (i + 0.5) / scale - 0.5
    if ctm == "pytorch_half_pixel":
        return (i + 0.5) / scale - 0.5 if out_size > 1 else np.zeros(1)
    if ctm == "asymmetric":
        return i / scale
    if ctm == "align_corners":
        if out_size == 1:
            return np.zeros(1)
        return i * (in_size - 1) / (out_size - 1)
    raise ValueError(f"Resize coordinate_transformation_mode {ctm!r} "
                     "not supported")


def _resize(inputs, attrs):
    """ONNX Resize (nearest/linear), axis-separable implementation:
    each resized axis is one static gather (nearest) or a two-gather
    lerp (linear) -- XLA-friendly static shapes, no dynamic indexing."""
    x = inputs[0]
    xd = x.data
    rank = len(xd.shape)

    def _s(v, default):
        v = attrs.get(v, default)
        return v.decode() if isinstance(v, bytes) else v

    mode = _s("mode", "nearest")
    ctm = _s("coordinate_transformation_mode", "half_pixel")
    nearest_mode = _s("nearest_mode", "round_prefer_floor")
    if mode not in ("nearest", "linear"):
        raise ValueError(f"Resize mode {mode!r} not supported")
    if int(attrs.get("antialias", 0)):
        raise ValueError("Resize antialias not supported")
    if int(attrs.get("exclude_outside", 0)):
        raise ValueError("Resize exclude_outside not supported")
    karp = _s("keep_aspect_ratio_policy", "stretch")
    if karp != "stretch":
        raise ValueError(f"Resize keep_aspect_ratio_policy {karp!r} "
                         "not supported")

    axes = attrs.get("axes")
    axes = list(range(rank)) if axes is None \
        else [int(a) % rank for a in axes]
    # optional inputs are positional (absent slots arrive as None,
    # graph.import_onnx): [x, roi, scales, sizes]. roi only matters in
    # tf_crop_and_resize (unsupported ctm), so it is ignored. Float
    # scales carry a trace-time host shadow (model._wrap_constant);
    # Resize output shapes are static under jit, so runtime-computed
    # scales cannot be supported.
    scales = sizes = None
    if len(inputs) > 2 and inputs[2] is not None:
        t = inputs[2]
        host = getattr(t, "host", None)
        if host is None:
            raise ValueError(
                "Resize scales must be graph constants (static shapes)")
        if host.size:
            scales = host.astype(np.float64).reshape(-1)
    if len(inputs) > 3 and inputs[3] is not None:
        arr = np.asarray(inputs[3].data)
        if arr.size:
            sizes = arr.astype(np.int64).reshape(-1)
    if scales is None and sizes is None:
        raise ValueError("Resize needs scales or sizes")

    in_shape = [int(d) for d in xd.shape]
    out_shape = list(in_shape)
    ax_scale = {}
    for i, a in enumerate(axes):
        if sizes is not None:
            out_shape[a] = int(sizes[i])
            ax_scale[a] = out_shape[a] / in_shape[a]
        else:
            out_shape[a] = int(np.floor(in_shape[a] * scales[i]))
            ax_scale[a] = float(scales[i])

    y = xd
    for a in range(rank):
        if out_shape[a] == in_shape[a] and ax_scale.get(a, 1.0) == 1.0:
            continue
        coords = _resize_coords(out_shape[a], in_shape[a], ax_scale[a], ctm)
        if mode == "nearest":
            if nearest_mode == "floor":
                idx = np.floor(coords)
            elif nearest_mode == "ceil":
                idx = np.ceil(coords)
            elif nearest_mode == "round_prefer_ceil":
                idx = np.floor(coords + 0.5)
            else:  # round_prefer_floor (default)
                idx = np.ceil(coords - 0.5)
            idx = np.clip(idx, 0, in_shape[a] - 1).astype(np.int64)
            y = jnp.take(y, jnp.asarray(idx), axis=a)
        else:  # linear, separable per axis
            # clamp the source coordinate BEFORE the floor/lerp (edge
            # pixels replicate past the border, like torch/ORT)
            coords = np.clip(coords, 0.0, in_shape[a] - 1)
            i0 = np.floor(coords).astype(np.int64)
            i1 = np.clip(i0 + 1, 0, in_shape[a] - 1)
            w = (coords - i0).astype(np.float32)
            wshape = [1] * rank
            wshape[a] = -1
            wj = jnp.asarray(w.reshape(wshape))
            y0 = jnp.take(y, jnp.asarray(i0), axis=a)
            y1 = jnp.take(y, jnp.asarray(i1), axis=a)
            y = y0 * (1.0 - wj) + y1 * wj
    if isinstance(x, ITensor):
        # ONNX: output type == input type; linear interpolation on an
        # integer tensor rounds back to the integer domain (host)
        y = np.asarray(y)
        if mode == "linear":
            y = np.rint(y)
        return ITensor(y.astype(np.int64))
    return FTensor(y)


def _recurrent(op: str, inputs: list[Tensor], attrs: dict) -> list[Tensor]:
    """ONNX LSTM / GRU via lax.scan (compiler-friendly recurrence: one
    compiled loop body, weights resident, no Python unrolling).

    Supported subset: layout=0 (seq-major), default activations
    (sigmoid/tanh), forward / reverse / bidirectional, optional bias and
    initial states, GRU linear_before_reset both ways. sequence_lens
    must be absent or uniform (static shapes under jit).
    """
    import jax

    from .. import config

    hidden = int(attrs["hidden_size"])
    direction = attrs.get("direction", "forward")
    if isinstance(direction, bytes):
        direction = direction.decode()
    if int(attrs.get("layout", 0)) != 0:
        raise ValueError(f"{op} layout=1 not supported")
    n_gates = 4 if op == "LSTM" else 3
    lbr = int(attrs.get("linear_before_reset", 0))

    x, w, r = inputs[0], inputs[1], inputs[2]
    xd = x.data  # [seq, batch, input]
    seq, batch, _ = xd.shape

    # optional inputs are positional (absent slots arrive as None,
    # graph.import_onnx): [X, W, R, B, sequence_lens, initial_h,
    # initial_c, P] for LSTM; [X, W, R, B, sequence_lens, initial_h]
    # for GRU.
    def opt(i):
        return inputs[i] if len(inputs) > i and inputs[i] is not None \
            else None

    b = opt(3).data if opt(3) is not None else None
    seq_lens = np.asarray(opt(4).data) if opt(4) is not None else None
    h_init = opt(5)
    c_init = opt(6) if op == "LSTM" else None
    if op == "LSTM" and opt(7) is not None:
        raise ValueError("LSTM peephole weights not supported")
    if seq_lens is not None and not np.all(seq_lens == seq):
        raise ValueError(f"{op} per-sample sequence_lens not supported "
                         "(static shapes)")

    num_dir = w.data.shape[0]
    dirs = []
    for d in range(num_dir):
        wd = w.data[d]          # [n_gates*H, input]
        rd = r.data[d]          # [n_gates*H, H]
        if b is not None:
            wb = b[d, :n_gates * hidden]
            rb = b[d, n_gates * hidden:]
        else:
            wb = rb = jnp.zeros((n_gates * hidden,), xd.dtype)
        h0 = h_init.data[d] if h_init is not None \
            else jnp.zeros((batch, hidden), xd.dtype)
        c0 = c_init.data[d] if c_init is not None \
            else jnp.zeros((batch, hidden), xd.dtype)
        reverse = (direction == "reverse") or (d == 1)
        xs = xd[::-1] if reverse else xd
        # hoist the input projections out of the scan: one big matmul
        xproj = jnp.einsum("sbi,gi->sbg", xs, wd,
                           precision=config.float_matmul_precision) + wb

        if op == "LSTM":
            def step(carry, xp, rd=rd, rb=rb):
                h, c = carry
                gates = xp + h @ rd.T + rb
                i, o, f, g = (gates[:, k * hidden:(k + 1) * hidden]
                              for k in range(4))  # ONNX iofc order
                i = jax.nn.sigmoid(i)
                o = jax.nn.sigmoid(o)
                f = jax.nn.sigmoid(f)
                c_new = f * c + i * jnp.tanh(g)
                h_new = o * jnp.tanh(c_new)
                return (h_new, c_new), h_new

            (hT, cT), ys = jax.lax.scan(step, (h0, c0), xproj)
        else:  # GRU, ONNX zrh order
            def step(h, xp, rd=rd, rb=rb):
                z_x, r_x, h_x = (xp[:, k * hidden:(k + 1) * hidden]
                                 for k in range(3))
                rproj = h @ rd.T + rb
                z_r, r_r, h_r = (rproj[:, k * hidden:(k + 1) * hidden]
                                 for k in range(3))
                z = jax.nn.sigmoid(z_x + z_r)
                rt = jax.nn.sigmoid(r_x + r_r)
                if lbr:
                    ht = jnp.tanh(h_x + rt * h_r)
                else:
                    rh = rd[2 * hidden:3 * hidden]
                    rbh = rb[2 * hidden:3 * hidden]
                    ht = jnp.tanh(h_x + (rt * h) @ rh.T + rbh)
                h_new = (1 - z) * ht + z * h
                return h_new, h_new

            hT, ys = jax.lax.scan(step, h0, xproj)
            cT = None
        if reverse:
            ys = ys[::-1]
        dirs.append((ys, hT, cT))

    y = jnp.stack([d[0] for d in dirs], axis=1)    # [seq, nd, batch, H]
    y_h = jnp.stack([d[1] for d in dirs], axis=0)  # [nd, batch, H]
    outs = [FTensor(y), FTensor(y_h)]
    if op == "LSTM":
        outs.append(FTensor(jnp.stack([d[2] for d in dirs], axis=0)))
    return outs


def onnx_operator_implementation(op: str, inputs: list[Tensor],
                                 attrs: dict[str, object]) -> list[Tensor]:
    if op == "Add":
        return [inputs[0] + inputs[1]]
    elif op == "Sub":
        return [inputs[0] + (-inputs[1])]
    elif op == "Concat":
        return [concat(list(inputs), axis=attrs["axis"])]
    elif op == "Constant":
        value = attrs["value"]
        if value.dtype == np.float32:
            return [FTensor(value)]
        elif value.dtype in (np.int64, np.int32):
            return [ITensor(value)]
        raise ValueError(f"Constant value dtype {value.dtype} not supported.")
    elif op == "ConstantOfShape":
        shape = inputs[0]
        value = attrs.get("value")
        if value is None:
            value = np.zeros(1, dtype=np.float32)
        value = np.asarray(value)
        y = np.full(tuple(int(d) for d in shape.data), fill_value=value.reshape(-1)[0],
                    dtype=value.dtype)
        if value.dtype == np.float32:
            return [FTensor(y)]
        elif value.dtype == np.int64:
            return [ITensor(y)]
        raise ValueError(f"ConstantOfShape dtype {value.dtype} not supported.")
    elif op == "Conv":
        x, w = inputs[0], inputs[1]
        b = inputs[2] if len(inputs) > 2 else None
        group = int(attrs.get("group", 1))
        n_spatial = x.data.ndim - 2  # ONNX Conv is rank-generic
        pads = tuple(attrs.get("pads", (0,) * (2 * n_spatial)))
        strides = tuple(attrs.get("strides", (1,) * n_spatial))
        dils = tuple(attrs.get("dilations", (1,) * n_spatial))
        if n_spatial == 1:
            # 1-D conv (audio frontends, e.g. models/whisper.py) always
            # runs in float -- the reference's quantized-graph Conv
            # semantics (SURVEY.md §3.4); the integer im2col path
            # (quantize_conv) covers 2-D convs only, so under
            # quantize_conv the executor-quantized operands dequantize
            # back here.
            from .conv import conv1d_ncl
            x, w, b = (t.dequantize() if isinstance(t, QTensor) else t
                       for t in (x, w, b))
            return [FTensor(conv1d_ncl(
                x.data, w.data, None if b is None else b.data,
                pads, strides, dils, group))]
        if isinstance(x, QTensor):
            from ..tensor import qconv2d
            return [qconv2d(x, w, b, pads, strides, dils, group)]
        return [fconv2d(x, w, b, pads, strides, dils, group)]
    elif op == "Div":
        return [inputs[0].div(inputs[1])]
    elif op == "Equal":
        return [inputs[0] == inputs[1]]
    elif op == "Erf":
        return [inputs[0].erf()]
    elif op == "Expand":
        return [inputs[0].expand(inputs[1])]
    elif op == "Gather":
        x, idx = inputs[0], inputs[1]
        axis = int(attrs.get("axis", 0))
        if isinstance(x, ITensor) and isinstance(idx, DITensor):
            # host table gathered by DEVICE indices: result is traced
            return [DITensor(jnp.take(jnp.asarray(x.data, jnp.int32),
                                      idx.data, axis=axis))]
        return [x.take(idx, axis=axis)]
    elif op == "Gemm":
        x, w = inputs[0], inputs[1]
        if isinstance(x, FTensor) and isinstance(w, (QTensor,
                                                     PackedQTensor)):
            # weight-only mode (Model.quantize_weights): dequantize
            # BEFORE the transB handling so the stored per-channel
            # scale keeps its orientation; XLA fuses convert+scale
            # into the dot operand load (see the MatMul branch)
            w = (w.unpack() if isinstance(w, PackedQTensor) else w) \
                .dequantize()
        b = inputs[2] if len(inputs) > 2 else None
        alpha = float(attrs.get("alpha", 1.0))
        beta = float(attrs.get("beta", 1.0))
        if attrs.get("transA"):
            x = x.T
        if attrs.get("transB"):
            w = w.T
        y = x.matmul(w)
        if alpha != 1.0:
            if isinstance(y, QTensor):
                # quantized path: alpha folds into the accumulator scale
                # exactly (real = (acc - zp) * scale, so alpha*real just
                # scales `scale`); beta is folded into the bias scale at
                # quantize() time (model.py Gemm strategy).
                y = QTensor(y.data, y.bit_width,
                            np.asarray(y.scale, np.float32) * np.float32(alpha),
                            y.zero_point)
            else:
                y = y * FTensor(np.array(alpha, np.float32))
        if b is not None and beta != 0.0:
            if beta != 1.0 and not isinstance(b, QTensor):
                b = b * FTensor(np.array(beta, np.float32))
            y = y + b
        return [y]
    elif op == "Identity":
        return [inputs[0].copy()]
    elif op == "LayerNormalization":
        x, scale, bias = inputs[0], inputs[1], inputs[2] if len(inputs) > 2 else None
        axis = int(attrs.get("axis", -1))
        epsilon = float(attrs.get("epsilon", 1e-5))
        from .. import config as _config
        if isinstance(x, FTensor) and _config.float_dtype == jnp.bfloat16:
            # fp-tolerance serving mode: ONE-PASS moments. Both reduces
            # (sum x, sum x*x) read x once and fuse into a single XLA
            # reduce kernel; the reference's two-pass form (mean, then
            # var of the differences) re-reads the full activation for
            # the second reduce. f32 accumulation keeps E[x^2] - mean^2
            # well-conditioned at LN activation ranges.
            import jax

            xd = x.data.astype(jnp.float32)
            mean = jnp.mean(xd, axis=axis, keepdims=True)
            msq = jnp.mean(xd * xd, axis=axis, keepdims=True)
            var = msq - mean * mean
            inv = jax.lax.rsqrt(var + np.float32(epsilon))
            y = (xd - mean) * inv
            y = y.astype(x.data.dtype) * scale.data
            if bias is not None:
                y = y + bias.data
            return [FTensor(y)]
        # Same decomposition as the reference
        # (numpy_quant/model.py:134-152) for bit-compatible numerics.
        mean = x.mean(axis=axis, keepdims=True)
        d = x + (-mean)
        dd = d * d
        var = dd.mean(axis=axis, keepdims=True)
        vareps = var + epsilon
        stddev = vareps.sqrt()
        normalized = d * stddev.inv()
        y = normalized * scale
        if bias is not None:
            y = y + bias
        return [y]
    elif op == "MatMul":
        a, b = inputs[0], inputs[1]
        if isinstance(a, FTensor) and isinstance(b, (QTensor,
                                                     PackedQTensor)):
            # weight-only quantization (Model.quantize_weights): int
            # weights, FLOAT compute. The dequantize runs in-program;
            # XLA fuses the int->float convert + per-channel scale into
            # the dot's operand load, so weight HBM traffic stays at
            # bit_width bits while the MXU runs the float dot -- the
            # memory-bound serving regime (single-token decode) where
            # full integer execution loses to its quantize overhead.
            if isinstance(b, PackedQTensor) and b.layout == "splitk":
                from .. import config as _config
                sc = b.scale
                grouped_ok = True
                if getattr(sc, "ndim", 0) == 2 and sc.shape[0] > 1 \
                        and b.bit_width != 8:
                    # groups must tile the split-K bit fields evenly
                    kr_ = b.planes.shape[0]
                    gszf = b.k // int(sc.shape[0])
                    grouped_ok = gszf > 0 and (
                        kr_ % gszf == 0 or gszf % kr_ == 0)
                if _config.packed_execution == "kernel" and grouped_ok:
                    # fused Pallas path: the PACKED payload streams
                    # from HBM (bits/8 bytes/value -- the "unpack"
                    # path's hoisted int8 copy reads 8 bits/value per
                    # step) and dequantizes in VMEM, grouped scales
                    # included (kernels/qmatmul.py::splitk_wo_matmul).
                    # Dequantize-then-dot numerics.
                    import jax as _jax
                    from ..kernels.qmatmul import splitk_wo_matmul
                    xd = a.data
                    x2 = xd.reshape(-1, xd.shape[-1])
                    y2 = splitk_wo_matmul(
                        x2, b.planes, b.scale, bits=b.bit_width,
                        interpret=_jax.default_backend() == "cpu")
                    return [FTensor(y2.reshape(*xd.shape[:-1], b.n))]
            w = b.unpack() if isinstance(b, PackedQTensor) else b
            s = w.scale
            if getattr(s, "ndim", 0) == 2 and s.shape[0] > 1:
                # grouped scales (quantize_weights group_size=): stored
                # compactly [K/g, N]. The dot runs GROUP-BATCHED --
                # y = sum_g (x_g @ W_g) * s[g] -- instead of expanding
                # the scales to a full [K, N] dequantized weight: the
                # reshape-multiply-reshape expansion cannot fuse into
                # the dot's operand load, so XLA materializes (and, in
                # a decode loop, HOISTS) a full f32 weight copy whose
                # per-step HBM read erases the narrow-weight win
                # (measured: w4-grouped == float at 3.65 ms/step vs
                # w8's 2.51, BENCH_HISTORY round 4). The group-batched
                # form reads the int payload + the small scale grid;
                # the [..., K/g, N] partial sums scale in registers.
                from .. import config as _config
                kdim, ncol = w.data.shape
                g = int(s.shape[0])
                gsz = kdim // g
                xd = a.data
                x3 = xd.reshape(*xd.shape[:-1], g, gsz)
                wq = jnp.asarray(w.data).reshape(g, gsz, ncol) \
                    .astype(xd.dtype)
                part = jnp.einsum(
                    "...gk,gkn->...gn", x3, wq,
                    precision=_config.float_matmul_precision)
                sg = jnp.asarray(s, jnp.float32).astype(xd.dtype)
                y = jnp.sum(part * sg, axis=-2)
                return [FTensor(y)]
            return [a.matmul(w.dequantize())]
        if isinstance(b, PackedQTensor):
            from .. import config as _config
            if _config.packed_execution == "kernel" and isinstance(a, QTensor):
                return [_packed_matmul(a, b)]
            # "unpack" mode: bit-planes -> int8 once per compiled
            # program (hoisted out of serving loops), then XLA's
            # full-speed int8 dot -- same values, HBM stays sub-byte
            return [a.matmul(b.unpack())]
        return [a.matmul(b)]
    elif op == "DynamicQuantizeLinear":
        # ONNX opset-11 dynamic quantization (the op onnxruntime's
        # quantize_dynamic emits): uint8 asymmetric params from THIS
        # tensor's min/max, all traced. Outputs ride as float-valued
        # FTensors (y in [0, 255] is exact in f32; the framework keeps
        # traced ints out of the tensor layer by design) -- the
        # MatMulInteger consumer re-enters the integer domain exactly.
        x = inputs[0].data.astype(jnp.float32)
        mn = jnp.minimum(jnp.min(x), np.float32(0.0))
        mx = jnp.maximum(jnp.max(x), np.float32(0.0))
        scale = (mx - mn) / np.float32(255.0)
        scale = jnp.where(scale > 0, scale, np.float32(1.0))
        zp = jnp.clip(jnp.rint(-mn / scale), 0.0, 255.0)
        y = jnp.clip(jnp.rint(x / scale) + zp, 0.0, 255.0)
        return [FTensor(y), FTensor(scale.reshape(())),
                FTensor(zp.reshape(()))]
    elif op == "MatMulInteger":
        # ONNX opset-10: integer matmul with zero-point subtraction,
        # int32 accumulation (exact -- the f32 cast happens at the
        # consumer Cast, exactly as in onnxruntime). Activations arrive
        # as float-valued FTensors (DynamicQuantizeLinear above) or
        # host int initializers; zero points either way.
        def as_int(t):
            if t is None:
                return None
            d = t.data
            if isinstance(d, np.ndarray):
                return jnp.asarray(d.astype(np.int32))
            return jnp.asarray(d).astype(jnp.int32)

        a, b = as_int(inputs[0]), as_int(inputs[1])
        azp = as_int(inputs[2]) if len(inputs) > 2 else None
        bzp = as_int(inputs[3]) if len(inputs) > 3 else None
        if azp is not None:
            a = a - azp
        if bzp is not None:
            b = b - bzp
        acc = jnp.matmul(a, b, preferred_element_type=jnp.int32)
        return [FTensor(acc.astype(jnp.float32))]
    elif op == "DynamicMatMul":
        # Dynamic quantization (dynamic.py): the float input quantizes
        # on the fly with scales from THIS batch -- min/max reduce, rint,
        # int8 MXU dot, zero-point-corrected dequantize, all traced (no
        # calibration constants anywhere). Weight is a symmetric QTensor.
        from ..quantization import _int_matmul, container_int_dtype, qrange
        x, w = inputs[0], inputs[1]
        bw = int(attrs["bit_width"])
        lo, hi = qrange(bw)
        xd = x.data.astype(jnp.float32)
        if attrs.get("granularity", "row") == "row":
            mn = jnp.minimum(jnp.min(xd, axis=-1, keepdims=True), 0.0)
            mx = jnp.maximum(jnp.max(xd, axis=-1, keepdims=True), 0.0)
        else:
            mn = jnp.minimum(jnp.min(xd), 0.0)
            mx = jnp.maximum(jnp.max(xd), 0.0)
        scale = (mx - mn) / np.float32(hi - lo)
        scale = jnp.where(scale > 0, scale, np.float32(1.0))  # const slices
        zp = jnp.rint(np.float32(lo) - mn / scale)
        xq = jnp.rint(jnp.clip(xd / scale + zp, lo, hi))
        acc = _int_matmul(xq.astype(container_int_dtype()), w.data,
                          max(bw, w.bit_width))
        colsum = w.colsum
        if colsum is None:
            colsum = jnp.sum(jnp.asarray(w.data, acc.dtype), axis=-2,
                             keepdims=True)
        corr = jnp.asarray(zp, acc.dtype) * jnp.asarray(colsum, acc.dtype)
        y = (acc - corr).astype(jnp.float32) \
            * (scale * jnp.asarray(w.scale, jnp.float32))
        return [FTensor(y)]
    elif op == "MatMulSplit":
        # Produced by QModel.merge_parallel_matmuls(): one wide MXU dot
        # against horizontally-concatenated weights, split back into the
        # original per-matmul outputs. Each segment keeps its original
        # scalar (s_x * s_w) f32 scale, so downstream values are
        # bit-identical to the unmerged dots.
        a, w = inputs[0], inputs[1]
        segments = [int(s) for s in attrs["segments"]]
        seg_scales = [np.float32(s) for s in attrs["segment_scales"]]
        if isinstance(w, PackedQTensor):
            w = w.unpack()
        y = a.matmul(w)
        a_scale = np.float32(a.scale) if isinstance(a, QTensor) else None
        outs = []
        start = 0
        for n_i, s_i in zip(segments, seg_scales):
            sl = (Ellipsis, slice(start, start + n_i))
            if isinstance(y, QTensor):
                zp = y.zero_point
                if zp is not None and getattr(zp, "ndim", 0) > 0:
                    zp = zp[sl]
                # same f32 product q_matmul computes for the unmerged dot
                outs.append(QTensor(y.data[sl], y.bit_width,
                                    np.float32(a_scale * s_i), zp))
            else:
                outs.append(FTensor(y.data[sl]))
            start += n_i
        return outs
    elif op == "Mul":
        return [inputs[0] * inputs[1]]
    elif op == "ReduceMean":
        x = inputs[0]
        # opset<18 puts axes in attrs; the reference reads the wrong key
        # ('axis', numpy_quant/model.py:165) -- we are spec-correct but
        # accept both spellings.
        if len(inputs) > 1 and inputs[1] is not None:
            axes = tuple(int(a) for a in inputs[1].data)
        elif "axes" in attrs:
            axes = tuple(int(a) for a in attrs["axes"])
        elif "axis" in attrs:
            axes = (int(attrs["axis"]),)
        else:
            axes = None
        keepdims = bool(attrs.get("keepdims", 1))
        if axes is not None and len(axes) == 1:
            return [x.mean(axis=axes[0], keepdims=keepdims)]
        return [x.mean(axis=axes, keepdims=keepdims)]
    elif op == "Relu":
        return [inputs[0].relu()]
    elif op == "Reshape":
        x, shape = inputs[0], inputs[1]
        x_shape = tuple(int(d) for d in x.shape.data) if not isinstance(x, QTensor) \
            else x.shape
        resolved = _resolve_reshape_shape(x_shape, shape.data,
                                          int(attrs.get("allowzero", 0)))
        return [x.reshape(ITensor(np.array(resolved, dtype=np.int64)))]
    elif op == "Sigmoid":
        return [inputs[0].sigmoid()]
    elif op == "Shape":
        x = inputs[0]
        if isinstance(x, QTensor):
            return [ITensor(np.array(x.shape, dtype=np.int64))]
        return [x.shape]
    elif op == "Slice":
        x = inputs[0]
        starts = inputs[1].data
        ends = inputs[2].data
        ndim = x.shape.size if not isinstance(x, QTensor) else len(x.shape)
        axes = inputs[3].data if len(inputs) > 3 and inputs[3] is not None \
            else np.arange(len(starts))
        steps = inputs[4].data if len(inputs) > 4 and inputs[4] is not None \
            else np.ones(len(starts), dtype=np.int64)
        slices = [slice(None, None, None)] * ndim
        for s, e, a, st in zip(starts, ends, axes, steps):
            slices[int(a)] = slice(int(s), int(e), int(st))
        return [x.__getitem__(tuple(slices))]
    elif op == "Softmax":
        return [inputs[0].softmax(axis=int(attrs.get("axis", -1)))]
    elif op == "Sqrt":
        return [inputs[0].sqrt()]
    elif op == "Tanh":
        return [inputs[0].tanh()]
    elif op == "Transpose":
        x = inputs[0]
        perm = attrs.get("perm")
        if perm is None:
            ndim = x.shape.size if not isinstance(x, QTensor) else len(x.shape)
            perm = tuple(reversed(range(ndim)))
        return [x.transpose(tuple(int(p) for p in perm))]
    elif op == "Unsqueeze":
        x = inputs[0]
        if len(inputs) > 1 and inputs[1] is not None:
            axes = inputs[1]
        else:
            axes = ITensor(np.array(attrs["axes"], dtype=np.int64))
        return [x.expand_dims(axis=axes)]
    elif op == "Where":
        return [where(inputs[0], inputs[1], inputs[2])]
    elif op == "DecodeAttention":
        # Fused decode-step attention (passes/decode_attention.py):
        # scores over [cache | current], scale/mask/bias epilogue,
        # softmax, context -- computed in FLOAT with the int8 cache
        # dequantize fused into the dot operands. Replays every
        # quantization the unfused executor applies (fake-quant of q
        # and the probabilities with the same calibrated params), but
        # runs the M=1 dots in f32 -- no per-step zero-point-correction
        # reduces over the whole cache, one multiply-reduce per dot.
        from .. import config as _config
        from ..quantization import dequantize as _dq, quantize as _qz

        q, kc, kh, vc, vh = inputs[:5]
        extras = list(inputs[5:])
        L = int(attrs["cache_len"])
        bw = attrs.get("bit_width")
        prec = _config.float_matmul_precision

        def as_float(t, qp_key, fake_quant):
            """The value the unfused executor's dot would consume,
            dequantized: int8 tensors dequantize (4x-bw accumulators
            requantize first, the chained-matmul rule); float tensors
            fake-quant with the recorded calibrated params when the
            unfused chain would have quantized them."""
            if isinstance(t, QTensor):
                if bw is not None and t.bit_width != bw \
                        and attrs.get(qp_key) is not None:
                    s, z = attrs[qp_key]
                    t = t.requantize(bw, np.float32(s), z)
                return t.dequantize().data
            x = t.data
            if fake_quant and attrs.get(qp_key) is not None:
                s, z = attrs[qp_key]
                return _dq(_qz(x, bw, np.float32(s), z),
                           np.float32(s), z)
            return x

        qf = as_float(q, "q_qp", True)        # [B,H,1,D]
        kcf = as_float(kc, "ktc_qp", True)    # [B,H,L,D]
        khf = as_float(kh, "kts_qp", True)    # [B,H,1,D]
        s_past = jnp.einsum("bhqd,bhld->bhql", qf, kcf,
                            precision=prec)
        s_self = jnp.einsum("bhqd,bhsd->bhqs", qf, khf,
                            precision=prec)
        s = jnp.concatenate([s_past, s_self], axis=-1)
        for kind, val in attrs["epilogue"]:
            if kind == "mul":
                s = s * np.float32(val)
            else:
                e = extras[int(val)]
                s = s + (e.dequantize().data if isinstance(e, QTensor)
                         else e.data)
        probs = FTensor(s).softmax(axis=-1).data
        p_past, p_self = probs[..., :L], probs[..., L:]
        if bw is not None and attrs.get("p_qp") is not None:
            sp, zp_ = attrs["p_qp"]
            p_past = _dq(_qz(p_past, bw, np.float32(sp), zp_),
                         np.float32(sp), zp_)
        vcf = as_float(vc, "vc_qp", True)     # [B,H,L,D]
        ctx = jnp.einsum("bhql,bhld->bhqd",
                         p_past.astype(vcf.dtype), vcf,
                         precision=prec)
        vhf = vh.dequantize().data if isinstance(vh, QTensor) \
            else vh.data
        ctx = ctx + p_self.astype(vhf.dtype) * vhf
        return [FTensor(ctx)]
    elif op == "FusedAttention":
        # Produced by QModel.fuse_attention(): the whole quantized
        # attention block in one VMEM-resident Pallas kernel
        # (kernels/attention.py). Inputs are the quantized q-heads
        # [B,H,N,D], transposed k-heads [B,H,D,N] and v-heads [B,H,N,D].
        import jax

        from ..kernels.attention import fused_attention

        q, kt, v = inputs[0], inputs[1], inputs[2]
        assert isinstance(q, QTensor) and isinstance(kt, QTensor) \
            and isinstance(v, QTensor)
        lead = q.data.shape[:-2]
        n, d = q.data.shape[-2], q.data.shape[-1]

        def zp_of(t):
            return 0 if t.zero_point is None else int(t.zero_point)

        out_requant = attrs.get("out_requant")  # set by int8_dataflow
        causal_mask_val = attrs.get("causal_mask_val")  # decoder graphs
        # banded (Mistral sliding-window) variant of the causal mask
        causal_window = attrs.get("causal_window")
        if causal_window is not None:
            causal_window = int(causal_window)
        operands = (q.data.astype(jnp.int8).reshape(-1, n, d),
                    kt.data.astype(jnp.int8).reshape(-1, d, n),
                    v.data.astype(jnp.int8).reshape(-1, n, d))

        def call(q_, kt_, v_):
            return fused_attention(
                q_, kt_, v_,
                causal_mask_val=None if causal_mask_val is None
                else float(causal_mask_val),
                causal_window=causal_window,
                scaling=float(attrs["scaling"]),
                sq=float(np.float32(q.scale)), zq=zp_of(q),
                sk=float(np.float32(kt.scale)), zk=zp_of(kt),
                sv=float(np.float32(v.scale)), zv=zp_of(v),
                sp=float(attrs["probs_scale"]),
                zp_p=int(attrs["probs_zero_point"]),
                bit_width=q.bit_width,
                out_requant=out_requant,
                interpret=jax.default_backend() == "cpu")

        if _EXEC_MESH is not None and _EXEC_MESH[0] is not None:
            # GSPMD: shard the flattened batch*head dim over 'data'
            spec, _ = _attention_shard_spec(operands[0].shape[0], 1, 4)
            out = _shard_map_kernel(call, operands, (spec,) * 3, spec)
        else:
            out = call(*operands)
        if out_requant is not None:
            scale, zp = out_requant
            return [QTensor(out.reshape(*lead, n, d), q.bit_width,
                            np.float32(scale),
                            None if zp is None else np.int64(zp))]
        return [FTensor(out.reshape(*lead, n, d))]
    elif op == "FusedAttentionHS":
        # Head-splitting variant (QModel.fuse_attention): consumes the
        # raw [B, N, H*D] Q/K/V projection outputs; head split/merge,
        # scores, softmax and context all happen inside the kernel
        # (kernels/attention.py::fused_attention_hs).
        import jax

        from ..kernels.attention import fused_attention_hs

        xq, xk, xv = inputs[0], inputs[1], inputs[2]
        assert isinstance(xq, QTensor) and isinstance(xk, QTensor) \
            and isinstance(xv, QTensor)

        def zp_of(t):
            return 0 if t.zero_point is None else int(t.zero_point)

        out_requant = attrs.get("out_requant")  # set by int8_dataflow
        from .. import config as _config
        num_heads = int(attrs["num_heads"])
        # optional 4th input (fuse_attention's score-bias match): the
        # graph's Add(scaled scores, constant) before Softmax -- T5
        # relative position bias, ALiBi, sliding-window masks.
        # Dequantized here exactly as the unfused executor would, then
        # broadcast from its [1.., H|1, nq|1, n] graph shape to the
        # kernel's per-head [H, nq, n] layout.
        score_bias = None
        if len(inputs) > 3 and inputs[3] is not None:
            bt = inputs[3]
            if isinstance(bt, QTensor):
                bt = bt.dequantize()
            barr = jnp.asarray(bt.data, jnp.float32)
            while barr.ndim > 3:
                assert barr.shape[0] == 1, barr.shape
                barr = barr[0]
            if barr.ndim == 2:
                barr = barr[None]
            score_bias = jnp.broadcast_to(
                barr, (num_heads, xq.data.shape[-2], xk.data.shape[-2]))
        # narrow q (dead-token elimination): a scalar token Gather
        # hoisted through the q input leaves a rank-2 [B, H*D] tensor --
        # run the kernel with ONE query row against full K/V and drop
        # the token axis again on the way out
        narrow_q = xq.data.ndim == 2
        qdata = xq.data[:, None, :] if narrow_q else xq.data
        operands = (qdata.astype(jnp.int8), xk.data.astype(jnp.int8),
                    xv.data.astype(jnp.int8))

        score_max = attrs.get("score_max")
        causal_mask_val = attrs.get("causal_mask_val")  # decoder graphs
        # banded (Mistral sliding-window) variant of the causal mask
        causal_window = attrs.get("causal_window")
        if causal_window is not None:
            causal_window = int(causal_window)

        def call(q_, k_, v_, bias_=None, heads=num_heads):
            return fused_attention_hs(
                q_, k_, v_, bias_,
                num_heads=heads,
                causal_mask_val=None if causal_mask_val is None
                else float(causal_mask_val),
                causal_window=causal_window,
                # fp-tolerance serving mode (bfloat16 float segments):
                # fewer-VPU-passes softmax; f32 keeps the bit-exact path
                fast=_config.float_dtype == jnp.bfloat16,
                score_max=None if score_max is None else float(score_max),
                scaling=float(attrs["scaling"]),
                sq=float(np.float32(xq.scale)), zq=zp_of(xq),
                sk=float(np.float32(xk.scale)), zk=zp_of(xk),
                sv=float(np.float32(xv.scale)), zv=zp_of(xv),
                sp=float(attrs["probs_scale"]),
                zp_p=int(attrs["probs_zero_point"]),
                bit_width=xq.bit_width,
                out_requant=out_requant,
                interpret=jax.default_backend() == "cpu")

        if _EXEC_MESH is not None and _EXEC_MESH[0] is not None:
            # GSPMD: Pallas kernels need shard_map -- batch over the
            # data axis, heads over the model axis (heads independent);
            # the per-head bias shards along its head axis (axis 0) so
            # each model shard sees exactly its heads' bias rows
            import functools as _ft
            from jax.sharding import PartitionSpec as _P
            spec, tp = _attention_shard_spec(operands[0].shape[0],
                                             num_heads, 3)
            specs = (spec,) * 3
            ops = operands
            if score_bias is not None:
                ops = operands + (score_bias,)
                specs = specs + (_P(spec[2], None, None),)
            out = _shard_map_kernel(
                _ft.partial(call, heads=num_heads // tp), ops,
                specs, spec)
        elif score_bias is not None:
            out = call(*operands, score_bias)
        else:
            out = call(*operands)
        if narrow_q:
            out = out[:, 0, :]
        if out_requant is not None:
            scale, zp = out_requant
            return [QTensor(out, xq.bit_width, np.float32(scale),
                            None if zp is None else np.int64(zp))]
        return [FTensor(out)]
    elif op == "ScatterElements":
        # Message-passing aggregation for GNN graphs (opset 16+:
        # reduction='add'). indices are shape-domain (host) so the
        # scatter lowers to a static XLA scatter.
        data, indices, updates = inputs[0], inputs[1], inputs[2]
        axis = int(attrs.get("axis", 0))
        reduction = attrs.get("reduction", b"none")
        if isinstance(reduction, bytes):
            reduction = reduction.decode()
        idx = np.asarray(indices.data)
        grids = list(np.indices(idx.shape))
        grids[axis] = idx
        grids = tuple(grids)
        if isinstance(data, FTensor):
            ref = data.data.at[grids]
            out = ref.add(updates.data) if reduction == "add" \
                else ref.set(updates.data)
            return [FTensor(out)]
        if isinstance(data, ITensor):
            out = np.array(data.data, copy=True)
            if reduction == "add":
                np.add.at(out, grids, updates.data)
            else:
                out[grids] = updates.data
            return [ITensor(out)]
        raise ValueError("ScatterElements on QTensor not supported")
    elif op == "GatherElements":
        data, indices = inputs[0], inputs[1]
        axis = int(attrs.get("axis", 0))
        idx = np.asarray(indices.data)
        grids = list(np.indices(idx.shape))
        grids[axis] = idx
        grids = tuple(grids)
        if isinstance(data, FTensor):
            return [FTensor(data.data[grids])]
        return [ITensor(np.asarray(data.data)[grids])]
    elif op == "Cast":
        x = inputs[0]
        to = int(attrs["to"])
        if to == 1:  # FLOAT
            if isinstance(x, FTensor):
                return [x.copy()]
            if isinstance(x, DITensor):
                return [FTensor(x.data.astype(jnp.float32))]
            return [FTensor(np.asarray(x.data, dtype=np.float32))]
        if to in (6, 7):  # INT32 / INT64
            if isinstance(x, (ITensor, DITensor)):
                return [x.copy()]
            raise ValueError("Cast of traced float data to int is not "
                             "supported under jit (shape domain only)")
        raise ValueError(f"Cast to elem_type {to} not supported")
    elif op == "Flatten":
        x = inputs[0]
        axis = int(attrs.get("axis", 1))
        dims = tuple(int(d) for d in x.shape.data) if not isinstance(x, QTensor) \
            else x.shape
        lead = int(np.prod(dims[:axis])) if axis > 0 else 1
        return [x.reshape(ITensor(np.array([lead, -1], dtype=np.int64)))]
    elif op == "Squeeze":
        x = inputs[0]
        if len(inputs) > 1 and inputs[1] is not None:
            axes = tuple(int(a) for a in inputs[1].data)
        elif "axes" in attrs:
            axes = tuple(int(a) for a in attrs["axes"])
        else:
            axes = None
        dims = tuple(int(d) for d in x.shape.data) if not isinstance(x, QTensor) \
            else x.shape
        if axes is None:
            new = [d for d in dims if d != 1]
        else:
            axes = tuple(a % len(dims) for a in axes)
            new = [d for i, d in enumerate(dims) if i not in axes]
        return [x.reshape(ITensor(np.array(new, dtype=np.int64)))]
    elif op == "Pow":
        a, b = inputs[0], inputs[1]
        if isinstance(a, ITensor):
            # host (shape) domain stays numpy so trace-time folding holds
            return [ITensor(np.power(a.data, np.asarray(b.data, np.int64)))]
        return [FTensor(jnp.power(a.data, jnp.asarray(b.data, a.data.dtype)))]
    elif op == "Neg":
        return [-inputs[0]]
    elif op == "Abs":
        x = inputs[0]
        if isinstance(x, ITensor):
            return [ITensor(np.abs(x.data))]
        return [FTensor(jnp.abs(x.data))]
    elif op == "Clip":
        x = inputs[0]
        lo = inputs[1].data if len(inputs) > 1 and inputs[1] is not None \
            else attrs.get("min")
        hi = inputs[2].data if len(inputs) > 2 and inputs[2] is not None \
            else attrs.get("max")
        if isinstance(x, ITensor):
            # host (shape) domain stays numpy so trace-time folding holds
            y = x.data
            if lo is not None:
                y = np.maximum(y, np.asarray(lo, np.int64))
            if hi is not None:
                y = np.minimum(y, np.asarray(hi, np.int64))
            return [ITensor(y)]
        y = x.data
        if lo is not None:
            y = jnp.maximum(y, jnp.asarray(lo, y.dtype))
        if hi is not None:
            y = jnp.minimum(y, jnp.asarray(hi, y.dtype))
        return [FTensor(y)]
    elif op == "ReduceSum":
        x = inputs[0]
        if len(inputs) > 1 and inputs[1] is not None:
            axes = tuple(int(a) for a in inputs[1].data)
        else:
            axes = tuple(int(a) for a in attrs.get("axes", ())) or None
        keepdims = bool(attrs.get("keepdims", 1))
        if isinstance(x, ITensor):
            # host (shape) domain stays numpy so trace-time folding holds
            return [ITensor(np.sum(x.data, axis=axes, keepdims=keepdims))]
        return [FTensor(jnp.sum(x.data, axis=axes, keepdims=keepdims))]
    elif op in ("ReduceMax", "ReduceMin"):
        x = inputs[0]
        # axes moved from attr to input at opset 18
        if len(inputs) > 1 and inputs[1] is not None:
            axes = tuple(int(a) for a in inputs[1].data) or None
        else:
            axes = tuple(int(a) for a in attrs.get("axes", ())) or None
        keepdims = bool(attrs.get("keepdims", 1))
        if isinstance(x, ITensor):
            nfn = np.max if op == "ReduceMax" else np.min
            return [ITensor(nfn(x.data, axis=axes, keepdims=keepdims))]
        fn = jnp.max if op == "ReduceMax" else jnp.min
        return [FTensor(fn(x.data, axis=axes, keepdims=keepdims))]
    elif op in ("ArgMax", "ArgMin"):
        x = inputs[0]
        axis = int(attrs.get("axis", 0))
        keepdims = bool(attrs.get("keepdims", 1))
        last = bool(attrs.get("select_last_index", 0))
        if isinstance(x, ITensor):  # host shape domain stays host
            fn = np.argmax if op == "ArgMax" else np.argmin
            d = np.flip(x.data, axis) if last else x.data
            idx = fn(d, axis=axis)
            if last:
                idx = x.data.shape[axis] - 1 - idx
            if keepdims:
                idx = np.expand_dims(idx, axis)
            return [ITensor(idx)]
        fn = jnp.argmax if op == "ArgMax" else jnp.argmin
        d = x.data
        if last:
            idx = d.shape[axis] - 1 - fn(jnp.flip(d, axis), axis=axis)
        else:
            idx = fn(d, axis=axis)
        if keepdims:
            idx = jnp.expand_dims(idx, axis)
        return [DITensor(idx)]
    elif op == "TopK":
        import jax

        x = inputs[0]
        if not isinstance(inputs[1], ITensor):
            raise ValueError("TopK k must be a graph constant (static "
                             "output shapes under jit)")
        k = int(np.asarray(inputs[1].data).reshape(-1)[0])
        axis = int(attrs.get("axis", -1))
        largest = bool(attrs.get("largest", 1))
        # jax.lax.top_k returns sorted results; sorted=0 only relaxes
        # the spec's ordering guarantee, so sorted output still conforms
        d = x.data
        rank = len(d.shape)
        axis = axis % rank
        moved = jnp.moveaxis(d, axis, -1)
        vals, idx = jax.lax.top_k(moved if largest else -moved, k)
        if not largest:
            vals = -vals
        vals = jnp.moveaxis(vals, -1, axis)
        idx = jnp.moveaxis(idx, -1, axis)
        return [FTensor(vals), DITensor(idx)]
    elif op in ("Min", "Max"):
        fn = jnp.minimum if op == "Min" else jnp.maximum
        y = inputs[0].data
        for t in inputs[1:]:
            y = fn(y, t.data)
        return [ITensor(np.asarray(y)) if isinstance(inputs[0], ITensor)
                else FTensor(y)]
    elif op == "Pad":
        x = inputs[0]
        mode = attrs.get("mode", "constant")
        if isinstance(mode, bytes):
            mode = mode.decode()
        rank = len(x.data.shape)
        if len(inputs) > 1 and inputs[1] is not None:
            pads = np.asarray(inputs[1].data, np.int64).reshape(-1)
        else:  # opset <11 carried pads as an attribute
            pads = np.asarray(attrs["pads"], np.int64).reshape(-1)
        # optional inputs are positional (absent slots arrive as None,
        # graph.import_onnx): [x, pads, constant_value, axes]
        cval = inputs[2] if len(inputs) > 2 and inputs[2] is not None else 0.0
        if len(inputs) > 3 and inputs[3] is not None:
            axes = [int(a) % rank
                    for a in np.asarray(inputs[3].data).reshape(-1)]
        else:
            axes = list(range(rank))
        if isinstance(cval, (FTensor, ITensor)):
            cval = jnp.reshape(cval.data, ()) \
                if not isinstance(cval, ITensor) else \
                np.asarray(cval.data).reshape(())
        before = {a: int(pads[i]) for i, a in enumerate(axes)}
        after = {a: int(pads[i + len(axes)]) for i, a in enumerate(axes)}
        widths = [(max(before.get(a, 0), 0), max(after.get(a, 0), 0))
                  for a in range(rank)]
        kw = {"constant_values": cval} if mode == "constant" else {}
        mode_names = {"constant": "constant", "edge": "edge",
                      "reflect": "reflect", "wrap": "wrap"}
        if mode not in mode_names:
            raise ValueError(f"Pad mode {mode!r} not supported")
        mode_name = mode_names[mode]
        if isinstance(x, ITensor):
            # host (shape) domain stays numpy -- jnp would trace it
            if mode == "constant":
                kw = {"constant_values": int(np.asarray(cval).reshape(-1)[0])
                      if not isinstance(cval, float) else int(cval)}
            y = np.pad(x.data, widths, mode=mode_name, **kw)
        else:
            y = jnp.pad(x.data, widths, mode=mode_name, **kw)
        # negative pads crop (ONNX allows them)
        if any(before.get(a, 0) < 0 or after.get(a, 0) < 0
               for a in range(rank)):
            sl = tuple(slice(-min(before.get(a, 0), 0),
                             y.shape[a] + min(after.get(a, 0), 0))
                       for a in range(rank))
            y = y[sl]
        return [ITensor(np.asarray(y)) if isinstance(x, ITensor)
                else FTensor(y)]
    elif op == "Resize":
        return [_resize(inputs, attrs)]
    elif op in ("LSTM", "GRU"):
        return _recurrent(op, inputs, attrs)
    elif op in ("QuantizeLinear", "DequantizeLinear"):
        # Standard ONNX QDQ interop: quantized models produced by OTHER
        # tools (ORT quantizer, torch exporters) execute directly.
        # ONNX semantics, NOT the reference's: QuantizeLinear saturates
        # round(x/scale) + zp to the STORAGE dtype's range (uint8 by
        # default -- the original narrow dtype survives import via
        # ITensor.orig_dtype, graph.py::wrap_array).
        x, scale = inputs[0], inputs[1]
        zp = inputs[2] if len(inputs) > 2 else None
        axis = int(attrs.get("axis", 1))
        sdata = scale.data
        rank = len(x.data.shape)
        if getattr(sdata, "ndim", 0) > 0 and sdata.size > 1:
            bshape = [1] * rank
            bshape[axis % rank] = -1
            sdata = sdata.reshape(bshape)
        zdata = None
        if zp is not None:
            zdata = np.asarray(zp.data)
            if zdata.size > 1:
                zdata = zdata.reshape(np.shape(sdata))
        if op == "QuantizeLinear":
            dtype = np.dtype(np.uint8) if zp is None \
                else getattr(zp, "orig_dtype", np.dtype(np.uint8))
            info = np.iinfo(dtype)
            # bit_width in this framework is SIGNED-range semantics
            # (QTensor); an unsigned storage dtype needs one extra bit
            # so [0, 2^b - 1] fits in [-2^b, 2^b - 1] and downstream
            # consumers (requantize clip, matmul carrier selection)
            # stay correct. 16-bit QDQ (opset 21) exceeds the exact
            # integer paths and is rejected explicitly.
            bits = int(info.bits) + (1 if info.min == 0 else 0)
            if info.bits > 8:
                raise ValueError(
                    f"QuantizeLinear storage dtype {dtype} not supported "
                    "(int8/uint8 QDQ only)")
            q = jnp.rint(jnp.asarray(x.data, jnp.float32) / sdata)
            if zdata is not None:
                q = q + zdata
            q = jnp.clip(q, info.min, info.max)
            out = QTensor(q.astype(jnp.int32), bits, scale.data,
                          None if zdata is None else zdata)
            out.orig_dtype = dtype
            return [out]
        # DequantizeLinear: int payload (narrow initializer or a
        # QuantizeLinear output) -> float, using THIS node's scale/zp
        xd = x.data
        if isinstance(x, ITensor):
            xd = jnp.asarray(xd)
        y = jnp.asarray(xd, jnp.float32)
        if zdata is not None:
            y = y - zdata
        return [FTensor(y * jnp.asarray(sdata, jnp.float32))]
    elif op in ("QLinearMatMul", "QLinearConv"):
        # Standard ONNX QOperator-format interop (the QDQ form's
        # sibling): the integer op is explicit in the graph, so runtimes
        # without QDQ pattern fusion still run integer kernels. Executed
        # integer-exact through q_matmul / qconv2d plus ONE output
        # requantize: y = clip(rint(acc * s_a*s_b / s_y) + zp_y) to the
        # storage dtype's range -- the same rint-then-add-zp convention
        # as this registry's QuantizeLinear import above.
        a, a_s, a_z = inputs[0], inputs[1], inputs[2]
        b, b_s, b_z = inputs[3], inputs[4], inputs[5]
        y_s, y_z = inputs[6], inputs[7] if len(inputs) > 7 else None
        bias = inputs[8] if len(inputs) > 8 else None

        def _host_scale(t):
            """Scale initializers must be readable at trace time (they
            parameterize QTensors): the host shadow model._wrap_constant
            attaches to scalar/1-D float constants."""
            h = getattr(t, "host", None)
            if h is None:
                h = t.data  # eager mode / raw constants: already host
            return np.asarray(h, np.float32)

        def _storage(zp_t, payload_t):
            """Storage dtype from the zero point (or payload) initializer;
            bits use the signed-range convention (QuantizeLinear above)."""
            dtype = getattr(zp_t, "orig_dtype", None) \
                if zp_t is not None else None
            if dtype is None:
                dtype = getattr(payload_t, "orig_dtype", None) \
                    or np.dtype(np.uint8)
            info = np.iinfo(dtype)
            if info.bits > 8:
                raise ValueError(f"{op}: only 8-bit storage supported")
            return int(info.bits) + (1 if info.min == 0 else 0), info, dtype

        def _operand(t, st, zt, per_channel=False):
            sdata = _host_scale(st)
            if sdata.size != 1 and not per_channel:
                raise ValueError(f"{op}: per-axis operand scales are only "
                                 "supported for QLinearConv weights")
            bits, _, _ = _storage(zt, t)
            zp = None
            if zt is not None:
                z = np.asarray(zt.data).reshape(-1)
                if z.size != 1:
                    # the common per-channel form carries an all-zero
                    # zp vector beside the per-channel scales
                    if np.any(z != 0):
                        raise ValueError(f"{op}: per-axis zero points "
                                         "are not supported")
                elif int(z[0]) != 0:
                    zp = np.int64(int(z[0]))
            scale = np.float32(sdata.reshape(-1)[0]) if sdata.size == 1 \
                else sdata.reshape(-1)
            return QTensor(jnp.asarray(t.data, jnp.int32), bits, scale, zp)

        qa = _operand(a, a_s, a_z)
        qb = _operand(b, b_s, b_z, per_channel=(op == "QLinearConv"))
        if op == "QLinearConv":
            from ..tensor import qconv2d
            qbias = None
            if bias is not None:
                # int32 bias at scale s_x*s_w, zero point 0 (ONNX spec)
                bscale = np.float32(qa.scale) \
                    * np.asarray(qb.scale, np.float32)
                qbias = QTensor(jnp.asarray(bias.data, jnp.int32), 32,
                                bscale, None)
            acc = qconv2d(qa, qb, qbias,
                          tuple(attrs.get("pads", (0, 0, 0, 0))),
                          tuple(attrs.get("strides", (1, 1))),
                          tuple(attrs.get("dilations", (1, 1))),
                          int(attrs.get("group", 1)))
        else:
            acc = qa.matmul(qb)
        bits_y, info_y, dtype_y = _storage(y_z, None)
        ys = np.float32(_host_scale(y_s).reshape(-1)[0])
        q = jnp.rint(jnp.asarray(acc.dequantize().data, jnp.float32) / ys)
        zy = None
        if y_z is not None:
            z = int(np.asarray(y_z.data).reshape(-1)[0])
            if z:
                q = q + z
                zy = np.int64(z)
        q = jnp.clip(q, info_y.min, info_y.max)
        out = QTensor(q.astype(jnp.int32), bits_y, ys, zy)
        out.orig_dtype = dtype_y
        return [out]
    elif op == "FusedGelu":
        # Produced by QModel.fuse_gelu() from the exporter's exact-GELU
        # chain Div(x, c) -> Erf -> Add(one) -> Mul(x) -> Mul(half).
        # The chain's scalar constants arrive as (dequantized) inputs
        # 1..3, carrying the PTQ pass's int8 rounding of sqrt2/1/0.5
        # exactly like the unfused executor sees them. Exact mode
        # replays the chain's op sequence bit-for-bit; the bf16 serving
        # mode computes the sigmoid form
        #   x * (half*(one-1) + 2*half * sigmoid(K1*x + K3*x^3))
        # (tanh approximation, max erf-term error 3.6e-4) in about half
        # the VPU passes -- the MLP mega-fusion is VPU-bound with GELU
        # on the critical path (BENCH_HISTORY.md round 3).
        import jax

        from .. import config as _config

        x, c_t, one_t, half_t = inputs[0], inputs[1], inputs[2], inputs[3]
        xd = x.data
        if _config.float_dtype == jnp.bfloat16:
            # tanh-form coefficients of erf(u), u = x/c: scalar math in
            # f32 (bf16 scalars would cost ~1e-2 relative error)
            t1 = np.float32(1.1283791670955126)
            t3 = np.float32(0.10091094891335077)
            c32 = c_t.data.astype(jnp.float32)
            inv_c = 1.0 / c32 if attrs.get("via_div") else c32
            k1 = (2.0 * t1 * inv_c).astype(xd.dtype)
            k3 = (2.0 * t3 * inv_c * inv_c * inv_c).astype(xd.dtype)
            z = xd * (k1 + k3 * (xd * xd))
            if attrs.get("pure"):
                # one == 1, half == 0.5 exactly: 0.5*(1+tanh) IS
                # sigmoid -- no affine correction passes
                return [FTensor(xd * jax.nn.sigmoid(z))]
            one32 = one_t.data.astype(jnp.float32)
            half32 = half_t.data.astype(jnp.float32)
            cc = (half32 * (one32 - 1.0)).astype(xd.dtype)
            dd = (2.0 * half32).astype(xd.dtype)
            return [FTensor(xd * (cc + dd * jax.nn.sigmoid(z)))]
        from .erf import exact_erf
        u = xd / c_t.data if attrs.get("via_div") else xd * c_t.data
        e = exact_erf(u)
        a = e + one_t.data
        m = xd * a
        return [FTensor(m * half_t.data)]
    elif op == "Gelu":
        # exact mode composes the SAME erf the float path uses
        # (ops/erf.py A&S polynomial) for bit-compatible numerics
        x = inputs[0]
        approximate = attrs.get("approximate", "none")
        if isinstance(approximate, bytes):
            approximate = approximate.decode()
        if approximate == "tanh":
            xd = x.data
            inner = np.float32(np.sqrt(2.0 / np.pi)) \
                * (xd + np.float32(0.044715) * xd * xd * xd)
            return [FTensor(np.float32(0.5) * xd * (1.0 + jnp.tanh(inner)))]
        half = FTensor(np.float32(0.5))
        one = FTensor(np.float32(1.0))
        u = x * FTensor(np.float32(1.0 / np.sqrt(2.0)))
        return [x * half * (u.erf() + one)]
    elif op == "LeakyRelu":
        alpha = np.float32(attrs.get("alpha", 0.01))
        xd = inputs[0].data
        return [FTensor(jnp.where(xd >= 0, xd, alpha * xd))]
    elif op == "Elu":
        alpha = np.float32(attrs.get("alpha", 1.0))
        xd = inputs[0].data
        return [FTensor(jnp.where(xd >= 0, xd,
                                  alpha * (jnp.exp(xd) - np.float32(1))))]
    elif op == "Selu":
        alpha = np.float32(attrs.get("alpha", 1.67326319217681884765625))
        gamma = np.float32(attrs.get("gamma", 1.05070102214813232421875))
        xd = inputs[0].data
        return [FTensor(gamma * jnp.where(
            xd > 0, xd, alpha * (jnp.exp(xd) - np.float32(1))))]
    elif op == "Softplus":
        return [FTensor(jnp.logaddexp(inputs[0].data, np.float32(0)))]
    elif op == "Softsign":
        xd = inputs[0].data
        return [FTensor(xd / (np.float32(1) + jnp.abs(xd)))]
    elif op == "HardSigmoid":
        alpha = np.float32(attrs.get("alpha", 0.2))
        beta = np.float32(attrs.get("beta", 0.5))
        xd = inputs[0].data
        return [FTensor(jnp.clip(alpha * xd + beta, 0.0, 1.0))]
    elif op == "HardSwish":
        xd = inputs[0].data  # x * HardSigmoid(x; 1/6, 1/2), spec constants
        return [FTensor(xd * jnp.clip(
            xd * np.float32(1 / 6) + np.float32(0.5), 0.0, 1.0))]
    elif op == "Mish":
        xd = inputs[0].data  # x * tanh(softplus(x))
        return [FTensor(xd * jnp.tanh(jnp.logaddexp(xd, np.float32(0))))]
    elif op == "PRelu":
        xd = inputs[0].data
        slope = inputs[1].data  # unidirectional broadcast per spec
        return [FTensor(jnp.where(xd >= 0, xd, slope * xd))]
    elif op == "BatchNormalization":
        # Inference form only (spec test_mode semantics): normalize with
        # the SAVED running statistics, broadcast over channel axis 1 of
        # any rank >= 2. Training outputs (running_mean/var updates) are
        # not produced -- this is an inference framework.
        if int(attrs.get("training_mode", 0)):
            raise ValueError("BatchNormalization training_mode=1 is not "
                             "supported (inference framework)")
        x, scale, bias, mean, var = inputs[:5]
        eps = float(attrs.get("epsilon", 1e-5))
        xd = x.data
        bshape = (1, -1) + (1,) * (len(xd.shape) - 2)
        k = (scale.data / jnp.sqrt(var.data + np.float32(eps)))
        y = (xd - mean.data.reshape(bshape)) * k.reshape(bshape) \
            + bias.data.reshape(bshape)
        return [FTensor(y)]
    elif op == "ConvTranspose":
        import jax

        x, w = inputs[0], inputs[1]
        b = inputs[2] if len(inputs) > 2 and inputs[2] is not None else None
        xd, wd = x.data, w.data
        n_sp = len(xd.shape) - 2
        strides = [int(s) for s in attrs.get("strides", [1] * n_sp)]
        dil = [int(d) for d in attrs.get("dilations", [1] * n_sp)]
        group = int(attrs.get("group", 1))
        out_pad = [int(p) for p in attrs.get("output_padding", [0] * n_sp)]
        ksp = [int(k) for k in attrs.get("kernel_shape", wd.shape[2:])]
        if "output_shape" in attrs:
            raise ValueError("ConvTranspose output_shape attr not "
                             "supported (use pads/output_padding)")
        ap = attrs.get("auto_pad", b"NOTSET")
        if isinstance(ap, bytes):
            ap = ap.decode()
        if ap not in ("NOTSET", ""):
            raise ValueError(f"ConvTranspose auto_pad {ap!r} not supported")
        pads = [int(p) for p in attrs.get("pads", [0] * (2 * n_sp))]
        # ConvTranspose == conv over the s-dilated input with the
        # spatially-flipped, in/out-swapped kernel; ONNX pads become
        # conv padding (d*(k-1) - pad) per edge (+output_padding at the
        # trailing edge).
        ci = wd.shape[0]
        co_g = wd.shape[1]
        wg = wd.reshape(group, ci // group, co_g, *wd.shape[2:])
        wg = jnp.swapaxes(wg, 1, 2).reshape(group * co_g, ci // group,
                                            *wd.shape[2:])
        wg = jnp.flip(wg, axis=tuple(range(2, 2 + n_sp)))
        padding = [(dil[i] * (ksp[i] - 1) - pads[i],
                    dil[i] * (ksp[i] - 1) - pads[n_sp + i] + out_pad[i])
                   for i in range(n_sp)]
        from .. import config as _config

        y = jax.lax.conv_general_dilated(
            xd, wg.astype(xd.dtype), window_strides=[1] * n_sp,
            padding=padding, lhs_dilation=strides, rhs_dilation=dil,
            feature_group_count=group,
            precision=_config.float_matmul_precision)
        if b is not None:
            y = y + b.data.reshape((1, -1) + (1,) * n_sp)
        return [FTensor(y)]
    elif op == "GroupNormalization":
        x, scale, bias = inputs[0], inputs[1], inputs[2]
        eps = float(attrs.get("epsilon", 1e-5))
        groups = int(attrs["num_groups"])
        xd = x.data
        n, c = xd.shape[0], xd.shape[1]
        sp = xd.shape[2:]
        xg = xd.reshape(n, groups, c // groups, *sp)
        red = tuple(range(2, xg.ndim))
        mean = jnp.mean(xg, axis=red, keepdims=True)
        d = xg - mean
        var = jnp.mean(d * d, axis=red, keepdims=True)
        y = (d / jnp.sqrt(var + np.float32(eps))).reshape(xd.shape)
        sd, bd = scale.data, bias.data
        if sd.shape[0] == groups and groups != c:
            # opset-18 per-group affine; opset-21 made it per-channel
            sd = jnp.repeat(sd, c // groups)
            bd = jnp.repeat(bd, c // groups)
        bshape = (1, -1) + (1,) * len(sp)
        return [FTensor(y * sd.reshape(bshape) + bd.reshape(bshape))]
    elif op == "InstanceNormalization":
        x, scale, bias = inputs[0], inputs[1], inputs[2]
        eps = float(attrs.get("epsilon", 1e-5))
        xd = x.data
        sp = tuple(range(2, len(xd.shape)))  # spatial axes of [B, C, ...]
        mean = jnp.mean(xd, axis=sp, keepdims=True)
        d = xd - mean
        var = jnp.mean(d * d, axis=sp, keepdims=True)
        bshape = (1, -1) + (1,) * len(sp)
        y = d / jnp.sqrt(var + np.float32(eps)) \
            * scale.data.reshape(bshape) + bias.data.reshape(bshape)
        return [FTensor(y)]
    elif op == "GlobalAveragePool":
        x = inputs[0]  # [B, C, H, W]
        return [FTensor(jnp.mean(x.data, axis=(2, 3), keepdims=True))]
    elif op in ("MaxPool", "AveragePool"):
        import jax

        x = inputs[0]  # [B, C, H, W]
        kh, kw = (int(k) for k in attrs["kernel_shape"])
        sh, sw = (int(s) for s in attrs.get("strides", (1, 1)))
        ph0, pw0, ph1, pw1 = (int(p) for p in attrs.get("pads", (0, 0, 0, 0)))
        if op == "MaxPool":
            init, fn = -jnp.inf, jax.lax.max
        else:
            init, fn = 0.0, jax.lax.add
        y = jax.lax.reduce_window(
            x.data, init, fn,
            window_dimensions=(1, 1, kh, kw),
            window_strides=(1, 1, sh, sw),
            padding=((0, 0), (0, 0), (ph0, ph1), (pw0, pw1)))
        if op == "AveragePool":
            if int(attrs.get("count_include_pad", 0)) or \
                    (ph0, pw0, ph1, pw1) == (0, 0, 0, 0):
                y = y / float(kh * kw)
            else:
                ones = jnp.ones_like(x.data)
                counts = jax.lax.reduce_window(
                    ones, 0.0, jax.lax.add,
                    window_dimensions=(1, 1, kh, kw),
                    window_strides=(1, 1, sh, sw),
                    padding=((0, 0), (0, 0), (ph0, ph1), (pw0, pw1)))
                y = y / counts
        return [FTensor(y)]
    elif op == "Tile":
        x, rep = inputs[0], inputs[1]
        reps = tuple(int(r) for r in np.asarray(rep.data).reshape(-1))
        if isinstance(x, ITensor):
            return [ITensor(np.tile(x.data, reps))]
        if isinstance(x, DITensor):
            return [DITensor(jnp.tile(x.data, reps))]
        return [FTensor(jnp.tile(x.data, reps))]
    elif op == "Range":
        def _host_scalar(t):
            if isinstance(t, ITensor):
                return int(np.asarray(t.data).reshape(-1)[0])
            host = getattr(t, "host", None)  # float constant's shadow
            if host is not None:
                return float(np.asarray(host).reshape(-1)[0])
            raise ValueError("Range start/limit/delta must be graph "
                             "constants (static shapes under jit)")
        start, limit, delta = (_host_scalar(t) for t in inputs[:3])
        if all(isinstance(t, ITensor) for t in inputs[:3]):
            return [ITensor(np.arange(start, limit, delta, dtype=np.int64))]
        return [FTensor(np.arange(start, limit, delta, dtype=np.float32))]
    elif op == "CumSum":
        x = inputs[0]
        axis = int(np.asarray(inputs[1].data).reshape(-1)[0])
        exclusive = int(attrs.get("exclusive", 0))
        reverse = int(attrs.get("reverse", 0))
        xp = np if isinstance(x, ITensor) else jnp
        d = x.data
        if reverse:
            d = xp.flip(d, axis)
        c = xp.cumsum(d, axis=axis)
        if exclusive:
            c = c - d  # shift: y_i = sum_{j<i}
        if reverse:
            c = xp.flip(c, axis)
        d = c
        cls = ITensor if isinstance(x, ITensor) else \
            (DITensor if isinstance(x, DITensor) else FTensor)
        return [cls(d)]
    elif op == "Trilu":
        x = inputs[0]
        k = int(np.asarray(inputs[1].data).reshape(-1)[0]) \
            if len(inputs) > 1 and inputs[1] is not None else 0
        upper = int(attrs.get("upper", 1))
        xp = np if isinstance(x, ITensor) else jnp
        d = (xp.triu if upper else xp.tril)(x.data, k)
        cls = ITensor if isinstance(x, ITensor) else \
            (DITensor if isinstance(x, DITensor) else FTensor)
        return [cls(d)]
    elif op == "OneHot":
        idx, depth, values = inputs[0], inputs[1], inputs[2]
        axis = int(attrs.get("axis", -1))
        n = int(np.asarray(depth.data).reshape(-1)[0])
        host = isinstance(idx, ITensor)
        xp = np if host else jnp
        ids = xp.asarray(idx.data)
        ids = xp.where(ids < 0, ids + n, ids)  # spec: negative wraps
        mask = ids[..., None] == xp.arange(n)  # one-hot on a NEW last axis
        if axis != -1 and axis != mask.ndim - 1:
            mask = xp.moveaxis(mask, -1, axis % mask.ndim)
        vals = values.data
        if isinstance(values, FTensor):
            # float values may be traced device params: compute on device
            return [FTensor(jnp.where(jnp.asarray(mask), vals[1], vals[0]))]
        out = xp.where(mask, int(vals[1]), int(vals[0]))
        return [ITensor(out) if host else DITensor(out)]
    elif op == "Einsum":
        eq = attrs.get("equation", "")
        if isinstance(eq, bytes):
            eq = eq.decode()
        from .. import config as _config

        arrs = [t.data for t in inputs]
        return [FTensor(jnp.einsum(
            eq, *arrs, precision=_config.float_matmul_precision))]
    elif op == "Split":
        x = inputs[0]
        axis = int(attrs.get("axis", 0))
        dims = tuple(int(d) for d in x.shape.data)
        if len(inputs) > 1 and inputs[1] is not None:
            sizes = [int(s) for s in inputs[1].data]
        elif "split" in attrs:
            sizes = [int(s) for s in attrs["split"]]
        else:
            n_out = int(attrs.get("num_outputs", 2))
            q, r = divmod(dims[axis], n_out)
            sizes = [q + (1 if i < r else 0) for i in range(n_out)]
        outs = []
        start = 0
        for s in sizes:
            sl = [slice(None)] * len(dims)
            sl[axis] = slice(start, start + s)
            outs.append(x.__getitem__(tuple(sl)))
            start += s
        return outs
    elif op in _UNARY_FLOAT_FNS:
        # spec: these accept float tensors only -> device float domain
        return [FTensor(_UNARY_FLOAT_FNS[op](inputs[0].data))]
    elif op == "Round":
        # ONNX Round is round-half-to-even, which jnp.round implements
        return [FTensor(jnp.round(inputs[0].data))]
    elif op == "Sign":
        x = inputs[0]
        if isinstance(x, ITensor):
            return [ITensor(np.sign(x.data))]
        if isinstance(x, DITensor):
            return [DITensor(jnp.sign(x.data))]
        return [FTensor(jnp.sign(x.data))]
    elif op == "Mod":
        a, b = inputs[0], inputs[1]
        fmod = bool(attrs.get("fmod", 0))
        if isinstance(a, ITensor) and isinstance(b, ITensor):
            y = np.fmod(a.data, b.data) if fmod else np.mod(a.data, b.data)
            return [ITensor(np.asarray(y, np.int64))]
        fn = jnp.fmod if fmod else jnp.mod
        y = fn(jnp.asarray(a.data), jnp.asarray(b.data))
        if jnp.issubdtype(y.dtype, jnp.integer):
            return [DITensor(y)]
        return [FTensor(y)]
    elif op in ("Greater", "Less", "GreaterOrEqual", "LessOrEqual"):
        import operator as _operator

        fn = {"Greater": _operator.gt, "Less": _operator.lt,
              "GreaterOrEqual": _operator.ge,
              "LessOrEqual": _operator.le}[op]
        a, b = inputs[0], inputs[1]
        if isinstance(a, ITensor) and isinstance(b, ITensor):
            # host shape domain stays numpy so trace-time folding holds
            return [ITensor(np.asarray(fn(a.data, b.data), np.int64))]
        y = fn(jnp.asarray(a.data), jnp.asarray(b.data))
        return [DITensor(jnp.asarray(y, jnp.int32))]
    elif op == "Not":
        x = inputs[0]
        if isinstance(x, ITensor):
            return [ITensor(np.asarray(x.data == 0, np.int64))]
        return [DITensor(jnp.asarray(jnp.asarray(x.data) == 0, jnp.int32))]
    elif op in ("And", "Or", "Xor"):
        a, b = inputs[0], inputs[1]
        if isinstance(a, ITensor) and isinstance(b, ITensor):
            av, bv = a.data != 0, b.data != 0
            y = {"And": av & bv, "Or": av | bv, "Xor": av ^ bv}[op]
            return [ITensor(np.asarray(y, np.int64))]
        av = jnp.asarray(a.data) != 0
        bv = jnp.asarray(b.data) != 0
        y = {"And": av & bv, "Or": av | bv, "Xor": av ^ bv}[op]
        return [DITensor(jnp.asarray(y, jnp.int32))]
    elif op in ("IsNaN", "IsInf"):
        x = jnp.asarray(inputs[0].data)
        if op == "IsNaN":
            y = jnp.isnan(x)
        else:
            pos = bool(attrs.get("detect_positive", 1))
            neg = bool(attrs.get("detect_negative", 1))
            y = jnp.isinf(x) & ((x > 0) if pos and not neg else
                                (x < 0) if neg and not pos else
                                jnp.full(x.shape, pos or neg, bool))
        return [DITensor(jnp.asarray(y, jnp.int32))]
    elif op == "LogSoftmax":
        import jax

        axis = int(attrs.get("axis", -1))
        return [FTensor(jax.nn.log_softmax(inputs[0].data, axis=axis))]
    elif op in ("ReduceProd", "ReduceL1", "ReduceL2", "ReduceSumSquare",
                "ReduceLogSum", "ReduceLogSumExp"):
        x = inputs[0]
        # axes moved from attr to input at opset 18
        if len(inputs) > 1 and inputs[1] is not None:
            axes = tuple(int(a) for a in inputs[1].data) or None
        else:
            axes = tuple(int(a) for a in attrs.get("axes", ())) or None
        keepdims = bool(attrs.get("keepdims", 1))
        if isinstance(x, ITensor):
            # host (shape) domain stays numpy so trace-time folding holds
            d = x.data
            if op == "ReduceProd":
                return [ITensor(np.prod(d, axis=axes, keepdims=keepdims))]
            if op == "ReduceL1":
                return [ITensor(np.sum(np.abs(d), axis=axes,
                                       keepdims=keepdims))]
            if op == "ReduceSumSquare":
                return [ITensor(np.sum(d * d, axis=axes,
                                       keepdims=keepdims))]
            raise ValueError(f"{op} on host integer data is not defined")
        d = x.data
        if op == "ReduceProd":
            y = jnp.prod(d, axis=axes, keepdims=keepdims)
        elif op == "ReduceL1":
            y = jnp.sum(jnp.abs(d), axis=axes, keepdims=keepdims)
        elif op == "ReduceL2":
            y = jnp.sqrt(jnp.sum(d * d, axis=axes, keepdims=keepdims))
        elif op == "ReduceSumSquare":
            y = jnp.sum(d * d, axis=axes, keepdims=keepdims)
        elif op == "ReduceLogSum":
            y = jnp.log(jnp.sum(d, axis=axes, keepdims=keepdims))
        else:  # ReduceLogSumExp
            from jax.scipy.special import logsumexp

            y = logsumexp(d, axis=axes, keepdims=keepdims)
        return [FTensor(y)]
    elif op == "GatherND":
        x, idx = inputs[0], inputs[1]
        batch_dims = int(attrs.get("batch_dims", 0))
        if isinstance(x, ITensor) and isinstance(idx, ITensor):
            return [ITensor(_gather_nd(np, x.data, idx.data, batch_dims))]
        y = _gather_nd(jnp, jnp.asarray(x.data),
                       jnp.asarray(idx.data), batch_dims)
        if isinstance(x, (ITensor, DITensor)):
            return [DITensor(y)]
        return [FTensor(y)]
    elif op == "ScatterND":
        x, idx, upd = inputs[0], inputs[1], inputs[2]
        red = attrs.get("reduction", "none")
        if isinstance(red, bytes):
            red = red.decode()
        k = idx.shape[-1] if isinstance(idx, QTensor) \
            else int(np.asarray(idx.data).shape[-1])
        if isinstance(x, ITensor) and isinstance(idx, ITensor):
            d = np.array(x.data)
            loc = tuple(np.asarray(idx.data)[..., i] for i in range(k))
            if red == "add":
                np.add.at(d, loc, upd.data)
            elif red == "mul":
                np.multiply.at(d, loc, upd.data)
            elif red == "max":
                np.maximum.at(d, loc, upd.data)
            elif red == "min":
                np.minimum.at(d, loc, upd.data)
            else:
                d[loc] = upd.data
            return [ITensor(d)]
        d = jnp.asarray(x.data)
        loc = tuple(jnp.asarray(idx.data)[..., i] for i in range(k))
        at = d.at[loc]
        y = {"add": at.add, "mul": at.multiply, "max": at.max,
             "min": at.min}.get(red, at.set)(jnp.asarray(upd.data, d.dtype))
        if isinstance(x, FTensor):
            return [FTensor(y)]
        return [DITensor(y)]
    elif op in ("DepthToSpace", "SpaceToDepth"):
        x = inputs[0]
        bs = int(attrs["blocksize"])
        n, c, h, w = (int(dim) for dim in x.shape.data)
        d = x.data
        if op == "SpaceToDepth":
            y = d.reshape(n, c, h // bs, bs, w // bs, bs) \
                 .transpose(0, 3, 5, 1, 2, 4) \
                 .reshape(n, c * bs * bs, h // bs, w // bs)
        else:
            mode = attrs.get("mode", "DCR")
            if isinstance(mode, bytes):
                mode = mode.decode()
            if mode == "DCR":
                y = d.reshape(n, bs, bs, c // (bs * bs), h, w) \
                     .transpose(0, 3, 4, 1, 5, 2)
            else:  # CRD
                y = d.reshape(n, c // (bs * bs), bs, bs, h, w) \
                     .transpose(0, 1, 4, 2, 5, 3)
            y = y.reshape(n, c // (bs * bs), h * bs, w * bs)
        return [ITensor(y) if isinstance(x, ITensor) else FTensor(y)]
    elif op in ("Sum", "Mean"):
        # variadic elementwise (spec: float-only), numpy broadcasting
        y = inputs[0].data
        for t in inputs[1:]:
            y = y + t.data
        if op == "Mean":
            y = y / np.float32(len(inputs))
        return [FTensor(y)]
    elif op == "GlobalMaxPool":
        x = inputs[0]
        spatial = tuple(range(2, int(x.shape.size)))
        return [FTensor(jnp.max(x.data, axis=spatial, keepdims=True))]
    elif op == "Hardmax":
        import jax

        x = inputs[0].data
        axis = int(attrs.get("axis", -1))
        am = jnp.argmax(x, axis=axis, keepdims=True)
        idx = jax.lax.broadcasted_iota(jnp.int32, x.shape,
                                       axis % x.ndim)
        return [FTensor(jnp.where(idx == am, jnp.float32(1.0),
                                  jnp.float32(0.0)))]
    elif op == "Shrink":
        x = inputs[0].data
        bias = np.float32(attrs.get("bias", 0.0))
        lambd = np.float32(attrs.get("lambd", 0.5))
        y = jnp.where(x < -lambd, x + bias,
                      jnp.where(x > lambd, x - bias, jnp.float32(0.0)))
        return [FTensor(y)]
    elif op == "ThresholdedRelu":
        x = inputs[0].data
        alpha = np.float32(attrs.get("alpha", 1.0))
        return [FTensor(jnp.where(x > alpha, x, jnp.float32(0.0)))]
    elif op == "Celu":
        x = inputs[0].data
        alpha = np.float32(attrs.get("alpha", 1.0))
        y = jnp.maximum(x, 0.0) \
            + jnp.minimum(0.0, alpha * (jnp.exp(x / alpha) - 1.0))
        return [FTensor(y)]
    elif op == "EyeLike":
        x = inputs[0]
        n, m = (int(d) for d in x.shape.data)
        k = int(attrs.get("k", 0))
        # shapes are static, so the identity folds to a host constant
        eye = np.eye(n, m, k=k)
        to = attrs.get("dtype")
        as_int = (int(to) in (6, 7)) if to is not None \
            else isinstance(x, (ITensor, DITensor))
        if as_int:
            return [ITensor(eye.astype(np.int64))]
        return [FTensor(eye.astype(np.float32))]
    elif op == "CastLike":
        x, like = inputs[0], inputs[1]
        if isinstance(like, FTensor):
            if isinstance(x, FTensor):
                return [x.copy()]
            if isinstance(x, DITensor):
                return [FTensor(x.data.astype(jnp.float32))]
            return [FTensor(np.asarray(x.data, dtype=np.float32))]
        if isinstance(like, (ITensor, DITensor)):
            if isinstance(x, (ITensor, DITensor)):
                return [x.copy()]
            raise ValueError("CastLike of traced float data to int is "
                             "not supported under jit (shape domain "
                             "only)")
        raise ValueError(f"CastLike target {type(like).__name__} not "
                         "supported")
    elif op == "NonZero":
        # output width = number of nonzeros -> dynamic shape; only the
        # host shape domain can carry it under jit
        x = inputs[0]
        if not isinstance(x, ITensor):
            raise ValueError(
                "NonZero needs host-resident (shape-domain) data: its "
                "output shape is data-dependent, which cannot trace "
                "under jit")
        return [ITensor(np.stack(np.nonzero(np.asarray(x.data)), 0)
                        .astype(np.int64))]
    elif op == "Compress":
        # condition must fold on the host (the output length is
        # data-dependent); the DATA may be traced -- selection becomes
        # a static gather
        x, cond = inputs[0], inputs[1]
        if not isinstance(cond, ITensor):
            raise ValueError(
                "Compress condition must be host-resident: the output "
                "shape is data-dependent under jit otherwise")
        keep = np.flatnonzero(np.asarray(cond.data) != 0)
        axis = attrs.get("axis")
        if isinstance(x, ITensor):
            d = np.asarray(x.data)
            y = d.reshape(-1)[keep] if axis is None \
                else np.take(d, keep, axis=int(axis))
            return [ITensor(y.astype(np.int64))]
        d = x.data
        y = jnp.take(d.reshape(-1), keep) if axis is None \
            else jnp.take(d, keep, axis=int(axis))
        return [FTensor(y)]
    elif op == "Unique":
        # all four outputs have data-dependent shapes -> host only
        x = inputs[0]
        if not isinstance(x, ITensor):
            raise ValueError(
                "Unique needs host-resident data: every output shape "
                "is data-dependent, which cannot trace under jit")
        axis = attrs.get("axis")
        d = np.asarray(x.data)
        flat = d if axis is not None else d.reshape(-1)
        y, first, inverse, counts = np.unique(
            flat, axis=None if axis is None else int(axis),
            return_index=True, return_inverse=True, return_counts=True)
        if not int(attrs.get("sorted", 1)):
            # first-occurrence order: permute the sorted outputs
            order = np.argsort(first, kind="stable")
            y = y[order] if axis is None \
                else np.take(y, order, axis=int(axis))
            remap = np.empty_like(order)
            remap[order] = np.arange(order.size)
            first, counts = first[order], counts[order]
            inverse = remap[inverse]
        return [ITensor(np.asarray(y, np.int64)),
                ITensor(first.astype(np.int64)),
                ITensor(inverse.reshape(-1).astype(np.int64)),
                ITensor(counts.astype(np.int64))]
    elif op == "BitShift":
        a, b = inputs[0], inputs[1]
        direction = attrs.get("direction", "LEFT")
        if isinstance(direction, bytes):
            direction = direction.decode()
        left = direction == "LEFT"
        if isinstance(a, ITensor) and isinstance(b, ITensor):
            y = np.left_shift(a.data, b.data) if left \
                else np.right_shift(a.data, b.data)
            return [ITensor(np.asarray(y, np.int64))]
        fn = jnp.left_shift if left else jnp.right_shift
        return [DITensor(fn(jnp.asarray(a.data), jnp.asarray(b.data)))]
    elif op in ("BitwiseAnd", "BitwiseOr", "BitwiseXor"):
        a, b = inputs[0], inputs[1]
        if isinstance(a, ITensor) and isinstance(b, ITensor):
            y = {"BitwiseAnd": np.bitwise_and, "BitwiseOr": np.bitwise_or,
                 "BitwiseXor": np.bitwise_xor}[op](a.data, b.data)
            return [ITensor(np.asarray(y, np.int64))]
        fn = {"BitwiseAnd": jnp.bitwise_and, "BitwiseOr": jnp.bitwise_or,
              "BitwiseXor": jnp.bitwise_xor}[op]
        return [DITensor(fn(jnp.asarray(a.data), jnp.asarray(b.data)))]
    elif op == "BitwiseNot":
        x = inputs[0]
        if isinstance(x, ITensor):
            return [ITensor(np.asarray(np.invert(x.data), np.int64))]
        return [DITensor(jnp.invert(jnp.asarray(x.data)))]
    elif op == "LpNormalization":
        x = inputs[0].data
        axis = int(attrs.get("axis", -1))
        p = int(attrs.get("p", 2))
        if p == 1:
            norm = jnp.sum(jnp.abs(x), axis=axis, keepdims=True)
        elif p == 2:
            norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
        else:
            raise ValueError(f"LpNormalization p={p} not in (1, 2)")
        return [FTensor(x / norm)]
    elif op == "ReverseSequence":
        x, lens = inputs[0], inputs[1]
        batch_axis = int(attrs.get("batch_axis", 1))
        time_axis = int(attrs.get("time_axis", 0))
        if not isinstance(lens, ITensor):
            raise ValueError("ReverseSequence sequence_lens must be "
                             "host-resident (it drives a static gather)")
        ln = np.asarray(lens.data, np.int64)  # [batch]
        t_len = int(x.shape.data[time_axis])
        t = np.arange(t_len)[None, :]
        # per-row time index: reversed inside the first len_b steps
        idx = np.where(t < ln[:, None], ln[:, None] - 1 - t, t)  # [B, T]
        d = x.data
        shape = [1] * len(np.asarray(x.shape.data))
        shape[batch_axis] = idx.shape[0]
        shape[time_axis] = t_len
        if isinstance(x, ITensor):
            full = np.broadcast_to(
                idx.reshape(shape) if batch_axis < time_axis
                else idx.T.reshape(shape), np.asarray(d).shape)
            return [ITensor(np.take_along_axis(np.asarray(d), full,
                                               axis=time_axis))]
        full = jnp.broadcast_to(
            jnp.asarray(idx.reshape(shape) if batch_axis < time_axis
                        else idx.T.reshape(shape)), d.shape)
        return [FTensor(jnp.take_along_axis(d, full, axis=time_axis))]
    else:
        raise ValueError(f"ONNX operator {op} not supported.")

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
    FTensor,
    ITensor,
    PackedQTensor,
    QTensor,
    Tensor,
    concat,
    fconv2d,
    where,
)


def _packed_matmul(a: QTensor, b: PackedQTensor) -> FTensor:
    """Quantized activation x packed sub-byte weight -> dequantized f32,
    via the fused Pallas kernel (kernels/qmatmul.py). Falls back to the
    generic path when the activation carries a tensor zero point."""
    import jax

    if a.zero_point is not None and getattr(a.zero_point, "ndim", 0) > 0:
        return a.matmul(b.unpack()).dequantize()
    from ..kernels.qmatmul import packed_qmatmul

    data = a.data
    lead = data.shape[:-1]
    x2 = data.reshape(-1, data.shape[-1])
    y2 = packed_qmatmul(
        x2, b.planes, b.colsum, None,
        bits=b.bit_width, bit_width=a.bit_width,
        x_scale=float(np.float32(a.scale)),
        x_zp=None if a.zero_point is None else int(a.zero_point),
        w_scale=float(np.float32(b.scale)),
        quantize_x=False,
        interpret=jax.default_backend() == "cpu")
    return FTensor(y2.reshape(*lead, b.n))


def _resolve_reshape_shape(x_shape, shape: np.ndarray, allowzero: int) -> tuple:
    """ONNX Reshape: 0 copies the input dim (unless allowzero), -1 infers."""
    out = list(int(d) for d in shape)
    if not allowzero:
        for i, d in enumerate(out):
            if d == 0:
                out[i] = int(x_shape[i])
    return tuple(out)


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
        if group != 1:
            raise ValueError("grouped Conv not supported")
        pads = tuple(attrs.get("pads", (0, 0, 0, 0)))
        strides = tuple(attrs.get("strides", (1, 1)))
        dils = tuple(attrs.get("dilations", (1, 1)))
        if tuple(dils) != (1, 1):
            raise ValueError("dilated Conv not supported")
        if isinstance(x, QTensor):
            from ..tensor import qconv2d
            return [qconv2d(x, w, b, pads, strides)]
        return [fconv2d(x, w, b, pads, strides)]
    elif op == "Div":
        return [inputs[0].div(inputs[1])]
    elif op == "Equal":
        return [inputs[0] == inputs[1]]
    elif op == "Erf":
        return [inputs[0].erf()]
    elif op == "Expand":
        return [inputs[0].expand(inputs[1])]
    elif op == "Gather":
        return [inputs[0].take(inputs[1], axis=int(attrs.get("axis", 0)))]
    elif op == "Gemm":
        x, w = inputs[0], inputs[1]
        b = inputs[2] if len(inputs) > 2 else None
        alpha = float(attrs.get("alpha", 1.0))
        beta = float(attrs.get("beta", 1.0))
        if attrs.get("transA"):
            x = x.T
        if attrs.get("transB"):
            w = w.T
        y = x.matmul(w)
        if alpha != 1.0:
            y = y * FTensor(np.array(alpha, np.float32))  # float path only
        if b is not None:
            if beta != 1.0:
                b = b * FTensor(np.array(beta, np.float32))
            y = y + b
        return [y]
    elif op == "Identity":
        return [inputs[0].copy()]
    elif op == "LayerNormalization":
        # Same decomposition as the reference
        # (numpy_quant/model.py:134-152) for bit-compatible numerics.
        x, scale, bias = inputs[0], inputs[1], inputs[2] if len(inputs) > 2 else None
        axis = int(attrs.get("axis", -1))
        epsilon = float(attrs.get("epsilon", 1e-5))
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
        if isinstance(b, PackedQTensor):
            return [_packed_matmul(a, b)]
        return [a.matmul(b)]
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

        out = fused_attention(
            q.data.astype(jnp.int8).reshape(-1, n, d),
            kt.data.astype(jnp.int8).reshape(-1, d, n),
            v.data.astype(jnp.int8).reshape(-1, n, d),
            scaling=float(attrs["scaling"]),
            sq=float(np.float32(q.scale)), zq=zp_of(q),
            sk=float(np.float32(kt.scale)), zk=zp_of(kt),
            sv=float(np.float32(v.scale)), zv=zp_of(v),
            sp=float(attrs["probs_scale"]),
            zp_p=int(attrs["probs_zero_point"]),
            bit_width=q.bit_width,
            interpret=jax.default_backend() == "cpu")
        return [FTensor(out.reshape(*lead, n, d))]
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
    else:
        raise ValueError(f"ONNX operator {op} not supported.")

"""Tensor layer: FTensor / ITensor / QTensor and class-preserving helpers.

Same capability surface as the reference tensor layer
(reference: numpy_quant/tensor.py:12-264) redesigned for XLA tracing:

* ``ITensor`` holds a **host numpy int64 array**. Every integer/shape-
  domain op (Shape, Gather-on-shapes, Concat, Equal, Mul, Reshape, ...)
  executes eagerly on the host. Because graph lowering runs under
  ``jax.jit`` tracing, this makes the whole ONNX shape-computation
  subgraph (Shape -> Gather -> Unsqueeze -> Concat -> Reshape chains)
  constant-fold into static shapes -- exactly what XLA requires.
* ``FTensor`` wraps a float32 JAX array (traced on device).
* ``QTensor`` wraps an integer-container JAX array plus static
  (bit_width, scale) and a zero_point that is None, a host scalar, or a
  traced correction tensor (matmul output case).

The float matmul accumulates at Precision.HIGHEST so the float path
holds the reference's f32 tolerances on the MXU.
"""
from __future__ import annotations

from typing import Any, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import config
from .ops.erf import erf as _erf
from .ops.conv import conv2d_nchw
from .quantization import (
    dequantize as _dequantize,
    q_matmul,
    quant_parameters,
    quantize as _quantize,
    requantize as _requantize,
)


class ITensor:
    """Integer/shape-domain tensor. Host-resident and therefore static
    under jit tracing. reference: numpy_quant/tensor.py:12-44."""

    def __init__(self, data):
        self._data = np.asarray(data, dtype=np.int64)

    @property
    def data(self) -> np.ndarray:
        return self._data

    @property
    def shape(self) -> "ITensor":
        return ITensor(np.array(self._data.shape, dtype=np.int64))

    @property
    def size(self) -> int:
        return self._data.size

    def copy(self) -> "ITensor":
        return ITensor(self._data.copy())

    def expand_dims(self, axis: "ITensor") -> "ITensor":
        return ITensor(np.expand_dims(self._data, axis=tuple(axis.data)))

    def __neg__(self) -> "ITensor":
        return ITensor(-self._data)

    def __eq__(self, other: "ITensor"):
        return ITensor(np.array(self._data == other.data, np.int64))

    def __getitem__(self, ind):
        return ITensor(self._data.__getitem__(ind))

    def __add__(self, other: "ITensor"):
        return ITensor(self._data + other.data)

    def __mul__(self, other: "ITensor"):
        return ITensor(self._data * other.data)

    def reshape(self, shape: "ITensor"):
        return ITensor(self._data.reshape(tuple(shape.data)))

    def take(self, indices: "ITensor", axis: int):
        # Spec-correct ONNX Gather: a rank-0 index removes the axis.
        # (The reference keeps rank via np.atleast_1d -- a quirk that is
        # cancelled by its Unsqueeze bug; see SURVEY.md §5.5.)
        return ITensor(self._data.take(indices.data, axis))

    def transpose(self, axes=None):
        return ITensor(self._data.transpose(axes))

    def __repr__(self):
        return f"ITensor({self._data!r})"


class DITensor:
    """DEVICE integer tensor: data-DEPENDENT integers (ArgMax/TopK
    indices, sampled ids) that cannot live in the host shape domain
    because their values are unknown at trace time. Third domain beside
    host ITensor (static, trace-time folded) and FTensor (device float).
    int32 storage -- the TPU-native index width (x64 is off under jit).
    No reference analogue: the reference's single-domain int64 ITensor
    (numpy_quant/tensor.py:12-44) conflates both roles; under XLA they
    must split."""

    def __init__(self, data):
        arr = jnp.asarray(data)
        if not jnp.issubdtype(arr.dtype, jnp.integer):
            raise ValueError(f"DITensor needs integer data, got {arr.dtype}")
        self._data = arr.astype(jnp.int32)

    @property
    def data(self) -> jax.Array:
        return self._data

    @property
    def shape(self) -> ITensor:
        return ITensor(np.array(self._data.shape, dtype=np.int64))

    @property
    def size(self) -> int:
        return self._data.size

    def copy(self) -> "DITensor":
        return DITensor(self._data)

    def reshape(self, shape: ITensor) -> "DITensor":
        return DITensor(self._data.reshape(tuple(shape.data)))

    def transpose(self, axes=None) -> "DITensor":
        return DITensor(self._data.transpose(axes))

    def expand_dims(self, axis: ITensor) -> "DITensor":
        return DITensor(jnp.expand_dims(self._data, axis=tuple(axis.data)))

    def __getitem__(self, ind):
        return DITensor(self._data.__getitem__(ind))

    def take(self, indices, axis: int) -> "DITensor":
        return DITensor(jnp.take(self._data, indices.data, axis=axis))

    def __repr__(self):
        return f"DITensor({self._data!r})"


def _as_float(x) -> jax.Array:
    arr = jnp.asarray(x)
    target = config.float_dtype
    if arr.dtype == target:
        return arr
    if arr.dtype in (jnp.float32, jnp.bfloat16, jnp.float16, jnp.float64):
        return arr.astype(target)
    raise ValueError(f"Use float data for FTensor, got {arr.dtype}")


class FTensor:
    """Float device tensor (float32; bfloat16 under
    config.low_precision_floats). reference: numpy_quant/tensor.py:47-152."""

    def __init__(self, data):
        self._data = _as_float(data)

    @property
    def data(self) -> jax.Array:
        return self._data

    @property
    def shape(self) -> ITensor:
        return ITensor(np.array(self._data.shape, dtype=np.int64))

    @property
    def T(self) -> "FTensor":
        return FTensor(self._data.T)

    def copy(self) -> "FTensor":
        return FTensor(self._data)

    def reshape(self, shape: ITensor) -> "FTensor":
        return FTensor(self._data.reshape(tuple(shape.data)))

    def take(self, indices: ITensor, axis: int) -> "FTensor":
        return FTensor(jnp.take(self._data, indices.data, axis=axis))

    def transpose(self, *axes) -> "FTensor":
        return FTensor(self._data.transpose(*axes))

    def __neg__(self) -> "FTensor":
        return FTensor(-self._data)

    def __mul__(self, other: "FTensor") -> "FTensor":
        if isinstance(other, FTensor):
            return FTensor(self._data * other.data)
        raise ValueError(f"Value of type {type(other)} cannot be multiplied")

    def __add__(self, other) -> "FTensor":
        if isinstance(other, FTensor):
            return FTensor(self._data + other.data)
        if isinstance(other, float):
            return FTensor(self._data + jnp.asarray(other, self._data.dtype))
        raise ValueError(f"Value of type {type(other)} cannot be added")

    def __radd__(self, other) -> "FTensor":
        return self.__add__(other)

    def __getitem__(self, ind) -> "FTensor":
        return FTensor(self._data.__getitem__(ind))

    def expand_dims(self, axis: "ITensor") -> "FTensor":
        return FTensor(jnp.expand_dims(self._data, axis=tuple(axis.data)))

    def matmul(self, other: "FTensor") -> "FTensor":
        return FTensor(jnp.matmul(self._data, other.data,
                                  precision=config.float_matmul_precision))

    def div(self, other: "FTensor") -> "FTensor":
        return FTensor(self._data / other.data)

    def erf(self) -> "FTensor":
        return FTensor(_erf(self._data))

    def exp(self) -> "FTensor":
        return FTensor(jnp.exp(self._data))

    def expand(self, shape: ITensor) -> "FTensor":
        # ONNX Expand: target dims of 1 keep the (larger) current dim.
        # reference: numpy_quant/tensor.py:112-119.
        curr_shape = np.array(self._data.shape, dtype=np.int64)
        new_shape = np.array(shape.data, copy=True)
        if new_shape.size < curr_shape.size:
            new_shape = np.concatenate(
                [curr_shape[:curr_shape.size - new_shape.size], new_shape])
        pad = new_shape.size - curr_shape.size
        curr_padded = np.concatenate([np.ones(pad, dtype=np.int64), curr_shape])
        adjust = np.logical_and(new_shape < curr_padded, new_shape == 1)
        new_shape[adjust] = curr_padded[adjust]
        return FTensor(jnp.broadcast_to(self._data, tuple(int(d) for d in new_shape)))

    def inv(self) -> "FTensor":
        return FTensor(1 / self._data)

    def max(self, axis: int, keepdims: bool) -> "FTensor":
        return FTensor(self._data.max(axis=axis, keepdims=keepdims))

    def mean(self, axis, keepdims: bool) -> "FTensor":
        axis = tuple(axis) if isinstance(axis, (list, tuple)) else axis
        return FTensor(self._data.mean(axis=axis, keepdims=keepdims))

    def relu(self) -> "FTensor":
        return FTensor((self._data > 0) * self._data)

    def sigmoid(self) -> "FTensor":
        return (1.0 + (-self).exp()).inv()

    def sum(self, axis: int, keepdims: bool) -> "FTensor":
        return FTensor(self._data.sum(axis=axis, keepdims=keepdims))

    def softmax(self, axis: int) -> "FTensor":
        # Max-subtracted, same composition as the reference
        # (numpy_quant/tensor.py:139-146).
        m = self + (-(self.max(axis=axis, keepdims=True)))
        e = m.exp()
        return e.div(e.sum(axis=axis, keepdims=True))

    def sqrt(self) -> "FTensor":
        return FTensor(jnp.sqrt(self._data))

    def tanh(self) -> "FTensor":
        return FTensor(jnp.tanh(self._data))

    def __repr__(self):
        return f"FTensor(shape={tuple(self._data.shape)})"


class QTensor:
    """Quantized tensor: integer-container data + (bit_width, scale,
    zero_point). reference: numpy_quant/tensor.py:155-221.

    data dtype is int32 (int64 in exact/x64 mode; float32 carrier only on
    the TPU >8-bit compatibility path). scale is a static host scalar.
    zero_point is None, a host int scalar, or a traced correction tensor.
    """

    def __init__(self, data, bit_width: int, scale,
                 zero_point: Optional[Any] = None, colsum=None):
        self._data = jnp.asarray(data)
        self.bit_width = int(bit_width)
        self.scale = scale
        self.zero_point = zero_point
        # optional precomputed column sums (weight constants): feeds the
        # q_matmul zero-point correction without a per-forward reduce
        self.colsum = colsum

    @property
    def data(self) -> jax.Array:
        return self._data

    @property
    def shape(self):
        return tuple(self._data.shape)

    @property
    def T(self) -> "QTensor":
        zp = self.zero_point
        if zp is not None and hasattr(zp, "T"):
            zp = zp.T
        scale = self.scale
        if getattr(scale, "ndim", 0) > 0:  # per-channel scale
            scale = scale.T
        return QTensor(self._data.T, self.bit_width, scale, zp)

    def copy(self) -> "QTensor":
        return QTensor(self._data, self.bit_width, self.scale, self.zero_point)

    def reshape(self, shape: ITensor) -> "QTensor":
        return QTensor(self._data.reshape(tuple(shape.data)),
                       self.bit_width, self.scale, self.zero_point)

    def transpose(self, *axes) -> "QTensor":
        zp = self.zero_point
        if zp is not None and hasattr(zp, "ndim") and getattr(zp, "ndim", 0) > 0:
            zp = jnp.transpose(zp, *axes)
        scale = self.scale
        if getattr(scale, "ndim", 0) > 0:
            scale = np.transpose(scale, *axes)
        return QTensor(self._data.transpose(*axes),
                       self.bit_width, scale, zp)

    def __add__(self, other: "QTensor") -> "QTensor":
        if isinstance(other, QTensor):
            return QTensor(self._data + other.data, self.bit_width,
                           self.scale, self.zero_point)
        raise ValueError(f"Cannot add QTensor with {other.__class__}")

    def __getitem__(self, ind) -> "QTensor":
        zp = self.zero_point
        if zp is not None and getattr(zp, "ndim", 0) > 0:
            zp = zp.__getitem__(ind)
        return QTensor(self._data.__getitem__(ind), self.bit_width,
                       self.scale, zp)

    def take(self, indices: ITensor, axis: int) -> "QTensor":
        """ONNX Gather in the quantized domain (value-preserving: same
        integers, same params). Used by the int8_dataflow passthrough so
        a token Gather moves int8 data instead of forcing a dequantize/
        requantize round trip. Per-channel scales are refused (the
        dataflow planner never routes them here; slicing could desync
        the channel axis)."""
        if getattr(self.scale, "ndim", 0) > 0:
            raise ValueError("Gather on a per-channel QTensor is not "
                             "supported (dequantize first)")
        zp = self.zero_point
        if zp is not None and getattr(zp, "ndim", 0) > 0:
            zp = jnp.take(zp, indices.data, axis=axis)
        return QTensor(jnp.take(self._data, indices.data, axis=axis),
                       self.bit_width, self.scale, zp)

    def expand_dims(self, axis: "ITensor") -> "QTensor":
        zp = self.zero_point
        if zp is not None and getattr(zp, "ndim", 0) > 0:
            zp = jnp.expand_dims(zp, axis=tuple(axis.data))
        return QTensor(jnp.expand_dims(self._data, axis=tuple(axis.data)),
                       self.bit_width, self.scale, zp)

    def dequantize(self) -> FTensor:
        return FTensor(_dequantize(self._data, self.scale, self.zero_point))

    def requantize(self, bit_width: int, scale, zero_point) -> "QTensor":
        qdata = _requantize(self._data, self.scale, self.zero_point,
                            res_scale=scale, res_zero_point=zero_point,
                            bit_width=bit_width)
        return QTensor(qdata, bit_width, scale, zero_point)

    def matmul(self, other: "QTensor") -> "QTensor":
        # The reference asserts equal operand widths (tensor.py:206);
        # mixed widths (W4A8-style weight-only low-bit) are parity-plus
        # and accumulate at 4x the wider operand's width.
        bit_width = max(self.bit_width, other.bit_width)
        y, scale, zero_point = q_matmul(
            self._data, self.scale, self.zero_point,
            other._data, other.scale, other.zero_point,
            bit_width=bit_width, b_colsum=other.colsum)
        # int8 -> int32 accumulator modelling (reference: tensor.py:210).
        return QTensor(y, 4 * bit_width, scale, zero_point)

    def relu(self) -> "QTensor":
        zp = 0 if self.zero_point is None else self.zero_point
        zp = jnp.asarray(zp, self._data.dtype)
        return QTensor(jnp.maximum(self._data, zp), self.bit_width,
                       self.scale, self.zero_point)

    def sigmoid(self) -> "QTensor":
        # Dequant -> float sigmoid -> requant with the SAME parameters
        # (reference: tensor.py:217-221).
        activations = self.dequantize().sigmoid()
        qact = _quantize(activations.data, self.bit_width, self.scale,
                         self.zero_point)
        return QTensor(qact, self.bit_width, self.scale, self.zero_point)

    def __repr__(self):
        return (f"QTensor(shape={self.shape}, bit_width={self.bit_width}, "
                f"scale={self.scale})")


class PackedQTensor:
    """Sub-byte packed quantized weight in HBM + precomputed column
    sums for the zero-point-correction epilogue. Exactly bit_width bits
    per value in HBM vs the reference's int64 containers
    (tensor.py:158-166). Two layouts (kernels/pack.py):

      * "splitk" (bits 1/2/4; 8 = plain int8): uint8[K/r, N], bit
        field j of byte (k, n) holds weight row k + j*K/r. The fused
        kernel runs r sub-dots on x's contiguous column blocks --
        3 VPU ops of unpacking per sub-dot, no relayout.
      * "bitplanes" (any bits, incl. 3/5/6/7): uint8[b, K/8, N].
      * "splitk_stacked" (bits 1/2/4/8): [S, KR_local, N] -- S
        independently packed row groups, one per tensor-parallel
        device. A row-(K-)sharded weight cannot slice its flat split-K
        payload (packed rows interleave K segments), so under TP the
        payload re-packs per shard at pack time and the leading axis
        shards over the model mesh axis: each device stores only its
        K/S rows' bytes.

    Only 2-D symmetric weights (MatMul rhs) pack; the fused Pallas
    kernel (kernels/qmatmul.py) unpacks tiles in VMEM on the fly.
    """

    def __init__(self, planes, colsum, k: int, n: int, bit_width: int, scale,
                 layout: str = "bitplanes"):
        self.planes = jnp.asarray(planes)
        self.colsum = jnp.asarray(colsum)
        self.k = int(k)
        self.n = int(n)
        self.bit_width = int(bit_width)
        self.scale = scale
        self.zero_point = None  # packing requires symmetric weights
        self.layout = layout

    @property
    def shape(self):
        return (self.k, self.n)

    @property
    def data(self):
        return self.planes

    def unpack(self) -> QTensor:
        from .kernels.pack import unpack_bitplanes, unpack_splitk
        from .quantization import container_int_dtype, x64_enabled
        if self.layout == "splitk_stacked":
            # per-shard unpack; every op is shard-local under GSPMD
            # (elementwise / concat+reshape off the sharded axis), so a
            # [S, ...] payload sharded on axis 0 unpacks WITHOUT
            # gathering: the result rows land sharded P(model) exactly
            # like the unpacked TP weight
            s = self.planes.shape[0]
            kl = -(-self.k // s)
            if self.bit_width == 8:
                vals = self.planes.reshape(s * kl, self.n)[:self.k]
            else:
                r = 8 // self.bit_width
                mask = (1 << self.bit_width) - 1
                offset = 1 << (self.bit_width - 1)
                p = self.planes.astype(jnp.int32)
                segs = [((p >> (j * self.bit_width)) & mask) - offset
                        for j in range(r)]
                cat = jnp.concatenate(segs, axis=1)  # [S, r*KR_local, N]
                vals = cat[:, :kl, :].reshape(s * kl, self.n)[:self.k] \
                    .astype(jnp.int8)
        elif self.layout == "splitk":
            vals = self.planes if self.bit_width == 8 else \
                unpack_splitk(self.planes, self.bit_width, self.k)
        else:
            vals = unpack_bitplanes(self.planes, self.bit_width, self.k)
        # int8 physical container in TPU mode (the dot consumes int8
        # anyway; int32 copies would quadruple the transient footprint)
        dtype = jnp.int8 if self.bit_width <= 8 and not x64_enabled() \
            else container_int_dtype()
        return QTensor(vals.astype(dtype), self.bit_width,
                       self.scale, None, colsum=self.colsum)

    def __repr__(self):
        return (f"PackedQTensor(shape=({self.k}, {self.n}), "
                f"bit_width={self.bit_width}, layout={self.layout!r})")


def pack_qtensor(qt: QTensor, shards: int = 1) -> PackedQTensor:
    """QTensor (2-D, symmetric) -> packed weight. bits 1/2/4/8 use the
    split-K layout (kernel-friendly); odd widths fall back to
    bit-planes.

    ``shards > 1``: pack each of S contiguous row groups independently
    into a stacked [S, KR_local, N] payload whose leading axis can
    shard over a tensor-parallel mesh axis (row-sharded weights; a flat
    split-K payload cannot be row-sliced). bits 1/2/4/8 only."""
    from .kernels.pack import pack_bitplanes, pack_splitk
    assert qt.zero_point is None, "only symmetric weights pack"
    data = np.asarray(qt.data)
    assert data.ndim == 2, "only 2-D weights pack"
    k, n = data.shape
    colsum = data.astype(np.int64).sum(axis=0, keepdims=True).astype(np.int32)
    if shards > 1 and qt.bit_width in (1, 2, 4, 8):
        kl = -(-k // shards)
        padded = data.astype(np.int32)
        if shards * kl != k:
            # pad rows encode value 0: contribute nothing to dots/colsum
            padded = np.concatenate(
                [padded, np.zeros((shards * kl - k, n), np.int32)], axis=0)
        if qt.bit_width == 8:
            payload = padded.astype(np.int8).reshape(shards, kl, n)
        else:
            payload = np.stack([pack_splitk(padded[t * kl:(t + 1) * kl],
                                            qt.bit_width)
                                for t in range(shards)])
        return PackedQTensor(payload, colsum, k, n, qt.bit_width, qt.scale,
                             layout="splitk_stacked")
    if qt.bit_width == 8:
        return PackedQTensor(data.astype(np.int8), colsum, k, n,
                             qt.bit_width, qt.scale, layout="splitk")
    if qt.bit_width in (1, 2, 4):
        payload = pack_splitk(data.astype(np.int32), qt.bit_width)
        return PackedQTensor(payload, colsum, k, n, qt.bit_width, qt.scale,
                             layout="splitk")
    planes = pack_bitplanes(data.astype(np.int32), qt.bit_width)
    return PackedQTensor(planes, colsum, k, n, qt.bit_width, qt.scale)


Tensor = Union[ITensor, DITensor, FTensor, QTensor, PackedQTensor]


def quantize_tensor(tensor: FTensor, bit_width: int, scale, zero_point) -> QTensor:
    qdata = _quantize(tensor.data, bit_width, scale, zero_point)
    return QTensor(qdata, bit_width, scale=scale, zero_point=zero_point)


def tensor_min_max(tensor: Tensor):
    """Global min/max clamped to include 0.
    reference: numpy_quant/tensor.py:232-236."""
    data = tensor.data
    zero = np.float32(0.0)
    if isinstance(data, np.ndarray):
        return (np.minimum(data.min(), zero).astype(np.float32),
                np.maximum(data.max(), zero).astype(np.float32))
    return (np.float32(jnp.minimum(data.min(), zero)),
            np.float32(jnp.maximum(data.max(), zero)))


def quantize_tensor_min_max(tensor: Tensor, bit_width: int, asymmetric: bool) -> QTensor:
    min_val, max_val = tensor_min_max(tensor)
    scale, zero_point = quant_parameters(min_val, max_val, bit_width, asymmetric)
    return quantize_tensor(tensor, bit_width, scale, zero_point)


def concat(x_list: list, axis: int):
    assert all(x.__class__ == x_list[0].__class__ for x in x_list), (
        f"types {[x.__class__ for x in x_list]} of x_list entries do not match")
    first = x_list[0]
    if isinstance(first, ITensor):
        return ITensor(np.concatenate([x.data for x in x_list], axis=axis))
    if isinstance(first, FTensor):
        return FTensor(jnp.concatenate([x.data for x in x_list], axis=axis))
    raise ValueError(f"concat of {type(first)} not supported")


def where(condition: ITensor, a: Tensor, b: Tensor):
    assert a.__class__ == b.__class__, \
        f"types {a.__class__} and {b.__class__} do not match"
    if isinstance(a, ITensor):
        return ITensor(np.where(condition.data, a.data, b.data))
    if isinstance(a, FTensor):
        return FTensor(jnp.where(jnp.asarray(condition.data != 0), a.data, b.data))
    raise ValueError(f"where of {type(a)} not supported")


def fconv2d(x: FTensor, w: FTensor, b: FTensor, pads, strides,
            dilations=(1, 1), group=1) -> FTensor:
    """Float conv2d on NCHW input (reference: numpy_quant/tensor.py:256-264
    + numpy_helper.py:73-92), lowered to lax.conv_general_dilated."""
    return FTensor(conv2d_nchw(x.data, w.data, b.data if b is not None else None,
                               pads, strides, dilations, group))


def qconv2d(x: QTensor, w: QTensor, b: Optional[QTensor], pads, strides,
            dilations=(1, 1), group=1) -> QTensor:
    """Integer conv2d: im2col + q_matmul on the MXU (parity-plus; the
    reference runs quantized-graph Conv in float, SURVEY.md §3.4).

    x: NCHW QTensor (asymmetric activations pad with their zero point);
    w: [O, C/group, KH, KW] QTensor (symmetric weights); b: optional
    4x-bit-width bias at scale sx*sw. Returns a 4x-bit-width accumulator
    QTensor. Grouped convs run as ONE batched integer matmul over the
    group axis (channels of a patch split per group); dilation dilates
    the patch extraction.
    """
    from .ops.conv import extract_patches_exact
    from .quantization import q_matmul as _q_matmul

    # mixed widths accumulate at 4x the wider operand's width, exactly
    # like QTensor.matmul (W4A8 weights, uint8-activation QLinearConv)
    bit_width = max(x.bit_width, w.bit_width)
    o, cg, kh, kw = w.data.shape
    g = int(group)
    c = cg * g
    assert x.data.shape[1] == c, (x.data.shape, w.data.shape, g)
    assert o % g == 0, (o, g)
    zp_x = x.zero_point
    pad_value = 0 if zp_x is None else int(zp_x)

    xd = jnp.transpose(x.data, (0, 2, 3, 1))  # NHWC
    patches = extract_patches_exact(xd, (kh, kw), pads, strides, pad_value,
                                    dilations)
    bsz, oh, ow, kkc = patches.shape
    if g == 1:
        w2d = jnp.transpose(w.data, (2, 3, 1, 0)).reshape(kh * kw * c, o)
        acc, scale, zp = _q_matmul(patches.reshape(bsz * oh * ow, kkc),
                                   x.scale, x.zero_point,
                                   w2d, w.scale, w.zero_point,
                                   bit_width=bit_width)
        acc = acc.reshape(bsz, oh, ow, o)
    else:
        # patches are (KH, KW, C)-ordered; split C per group and batch
        # the contraction over the group axis: [G, M, KH*KW*C/G] x
        # [G, KH*KW*C/G, O/G] in one stacked integer matmul
        m = bsz * oh * ow
        pg = patches.reshape(m, kh * kw, g, cg)
        pg = jnp.transpose(pg, (2, 0, 1, 3)).reshape(g, m, kh * kw * cg)
        # w [O, C/G, KH, KW] -> [G, KH*KW*C/G, O/G]
        wg = w.data.reshape(g, o // g, cg, kh, kw)
        wg = jnp.transpose(wg, (0, 3, 4, 2, 1)).reshape(g, kh * kw * cg,
                                                        o // g)
        w_scale = np.asarray(w.scale, np.float32)
        if w_scale.ndim > 0:  # per-channel scales follow the group split
            w_scale = w_scale.reshape(g, 1, o // g)
        acc, scale, zp = _q_matmul(pg, x.scale, x.zero_point,
                                   wg, w_scale, w.zero_point,
                                   bit_width=bit_width)
        # [G, M, O/G] -> [M, O]
        acc = jnp.transpose(acc, (1, 0, 2)).reshape(bsz, oh, ow, o)
        if zp is not None:
            zp = jnp.broadcast_to(zp, (g, m, o // g))
            zp = jnp.transpose(zp, (1, 0, 2)).reshape(bsz, oh, ow, o)
        if np.asarray(scale, np.float32).ndim > 0:
            # (G, 1, O/G) group-major flattening IS the natural O order
            scale = np.asarray(scale, np.float32).reshape(o)
    acc = jnp.transpose(acc, (0, 3, 1, 2))  # NCHW
    if zp is not None:
        if zp.ndim == 4:  # grouped path already [B, OH, OW, O]
            zp = jnp.transpose(zp, (0, 3, 1, 2))
        elif zp.shape[-2] == 1:
            # w-colsum * zp_x correction: [1, O] -> NCHW broadcast shape
            zp = zp.reshape(1, o, 1, 1)
        else:
            zp = jnp.broadcast_to(zp, (bsz * oh * ow, o)).reshape(
                bsz, oh, ow, o).transpose(0, 3, 1, 2)
    if np.asarray(scale, np.float32).ndim > 0:
        scale = np.asarray(scale, np.float32).reshape(1, o, 1, 1)
    out = QTensor(acc, 4 * bit_width, scale, zp)
    if b is not None:
        bias = b.data.reshape(1, o, 1, 1)
        out = QTensor(out.data + bias, out.bit_width, out.scale, out.zero_point)
    return out

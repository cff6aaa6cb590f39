"""Conv2d for the TPU.

The reference implements conv as zero-copy im2col + one BLAS dot
(reference: numpy_quant/numpy_helper.py:18-92). The TPU-native float
path is a single lax.conv_general_dilated, which XLA lowers straight to
MXU convolution. An im2col helper is also provided for the quantized
integer conv path (parity-plus; the reference runs quantized-graph Conv
in float, SURVEY.md §3.4).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import config


def conv2d_nchw(x, w, b, pads, strides, dilations=(1, 1), group=1):
    """x: [B, C, H, W]; w: [O, C/group, KH, KW]; b: [O] or None.
    pads: ONNX order (PH0, PW0, PH1, PW1); strides: (SH, SW).
    Grouped and dilated convs map directly onto XLA's convolution
    (feature_group_count / rhs_dilation) -- one MXU conv either way."""
    ph0, pw0, ph1, pw1 = (int(p) for p in pads)
    sh, sw = (int(s) for s in strides)
    dh, dw = (int(d) for d in dilations)
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(sh, sw),
        padding=((ph0, ph1), (pw0, pw1)),
        rhs_dilation=(dh, dw),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=int(group),
        precision=config.float_matmul_precision,
    )
    if b is not None:
        y = y + b.reshape(1, -1, 1, 1)
    return y


def conv1d_ncl(x, w, b, pads, strides, dilations=(1,), group=1):
    """x: [B, C, L]; w: [O, C/group, K]; b: [O] or None.
    pads: ONNX order (P0, P1); strides: (S,). One-spatial-dim variant
    of :func:`conv2d_nchw` (ONNX Conv is rank-generic; audio frontends
    like Whisper's mel conv stack use it at rank 3)."""
    p0, p1 = (int(p) for p in pads)
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(int(strides[0]),),
        padding=((p0, p1),),
        rhs_dilation=(int(dilations[0]),),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=int(group),
        precision=config.float_matmul_precision,
    )
    if b is not None:
        y = y + b.reshape(1, -1, 1)
    return y


def extract_sliding_windows_nhwc(x, ksize, pads, strides):
    """im2col patches: x [B, H, W, C] -> [B, OH, OW, KH*KW*C].

    Static-shape equivalent of the reference's stride-trick window
    extraction (numpy_quant/numpy_helper.py:18-70), built from
    conv_general_dilated_patches so XLA can fuse it.
    """
    kh, kw = ksize
    ph0, pw0, ph1, pw1 = (int(p) for p in pads)
    sh, sw = (int(s) for s in strides)
    x_nchw = jnp.transpose(x, (0, 3, 1, 2))
    patches = jax.lax.conv_general_dilated_patches(
        x_nchw,
        filter_shape=(kh, kw),
        window_strides=(sh, sw),
        padding=((ph0, ph1), (pw0, pw1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )  # [B, C*KH*KW, OH, OW]
    b, ckk, oh, ow = patches.shape
    c = x.shape[3]
    # conv_general_dilated_patches returns channel-major (C, KH, KW);
    # reorder to the (KH, KW, C) layout the im2col matmul expects.
    patches = patches.reshape(b, c, kh * kw, oh, ow)
    patches = jnp.transpose(patches, (0, 3, 4, 2, 1))  # [B, OH, OW, KH*KW, C]
    return patches.reshape(b, oh, ow, kh * kw * c)


def extract_patches_exact(x, ksize, pads, strides, pad_value,
                          dilations=(1, 1)):
    """im2col patches via pure data movement (slices/reshapes) -- exact
    for integer data, with a configurable pad value (asymmetric
    quantization pads with the zero point, not 0).

    x: [B, H, W, C] -> [B, OH, OW, KH*KW*C] (patch layout (KH, KW, C),
    matching the reference's window extraction,
    numpy_helper.py:18-70). Dilation samples window element (i, j) at
    spatial offset (i*DH, j*DW)."""
    kh, kw = ksize
    ph0, pw0, ph1, pw1 = (int(p) for p in pads)
    sh, sw = (int(s) for s in strides)
    dh, dw = (int(d) for d in dilations)
    x = jnp.pad(x, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)),
                constant_values=pad_value)
    b, h, w_, c = x.shape
    ekh = dh * (kh - 1) + 1  # effective (dilated) kernel extent
    ekw = dw * (kw - 1) + 1
    oh = (h - ekh) // sh + 1
    ow = (w_ - ekw) // sw + 1
    if (dh, dw) == (1, 1) and (sh, sw) == (kh, kw) \
            and h % kh == 0 and w_ % kw == 0:
        # non-overlapping windows (ViT patch embed): pure reshape
        p = x.reshape(b, oh, kh, ow, kw, c)
        p = jnp.transpose(p, (0, 1, 3, 2, 4, 5))
        return p.reshape(b, oh, ow, kh * kw * c)
    slices = []
    for i in range(kh):
        for j in range(kw):
            i0, j0 = i * dh, j * dw
            slices.append(x[:, i0:i0 + (oh - 1) * sh + 1:sh,
                            j0:j0 + (ow - 1) * sw + 1:sw, :])
    p = jnp.stack(slices, axis=3)  # [B, OH, OW, KH*KW, C]
    return p.reshape(b, oh, ow, kh * kw * c)


def conv2d_im2col(x, w, pads, strides, matmul):
    """Conv via im2col + caller-supplied matmul (used by the integer path).

    x: [B, H, W, C]; w: [KH, KW, C, O]. Returns [B, OH, OW, O].
    ``matmul(patches_2d, w_2d)`` performs the contraction -- the integer
    path passes a quantized matmul here.
    """
    kh, kw, c, o = w.shape
    patches = extract_sliding_windows_nhwc(x, (kh, kw), pads, strides)
    b, oh, ow, _ = patches.shape
    y = matmul(patches.reshape(b * oh * ow, kh * kw * c), w.reshape(kh * kw * c, o))
    return y.reshape(b, oh, ow, o)

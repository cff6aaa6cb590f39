"""Packed sub-byte weight storage (int1..int8).

The reference stores every quantized tensor as int64
(reference: numpy_quant/tensor.py:158-166) -- 8x the bits of int8 and
up to 64x those of int1. Here weights live in HBM as BIT-PLANES:
a [K, N] b-bit tensor becomes uint8[b, K/8, N], exactly b bits per
value for ANY b in 1..8 (no padding waste for odd widths like 3/5/7,
unlike nibble packing). Values are stored offset-binary
(v + 2^(b-1)) so planes are unsigned.

Unpacking is b cheap VPU ops (broadcast, shift, mask, accumulate) and
runs inside Pallas kernels in VMEM after the HBM->VMEM DMA, so HBM
traffic is b/8 bytes per weight.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pack_bitplanes(q: np.ndarray, bits: int) -> np.ndarray:
    """[K, N] signed b-bit integers -> uint8[b, ceil(K/8), N] bit-planes.

    Host-side (numpy): packing happens once at quantization time.
    """
    assert 1 <= bits <= 8
    q = np.asarray(q)
    assert q.ndim == 2, "pack_bitplanes packs 2-D weights"
    k, n = q.shape
    offset = 1 << (bits - 1)
    u = (q.astype(np.int64) + offset).astype(np.uint8)
    assert u.max(initial=0) < (1 << bits), "values exceed bit width"
    k8 = -(-k // 8) * 8
    if k8 != k:
        # pad rows encode VALUE 0 (offset-binary `offset`), so padded
        # K-tails contribute nothing to accumulations
        u = np.concatenate([u, np.full((k8 - k, n), offset, np.uint8)],
                           axis=0)
    # [k8, n] -> [k8/8, 8, n]; bit j of each value -> plane j
    u = u.reshape(k8 // 8, 8, n)
    planes = np.zeros((bits, k8 // 8, n), dtype=np.uint8)
    for j in range(bits):
        bit = (u >> j) & 1  # [k8/8, 8, n]
        shifts = np.arange(8, dtype=np.uint8).reshape(1, 8, 1)
        planes[j] = np.sum(bit.astype(np.uint8) << shifts, axis=1,
                           dtype=np.uint8)
    return planes


def unpack_bitplanes_np(planes: np.ndarray, bits: int, k: int) -> np.ndarray:
    """Host-side (numpy) inverse of pack_bitplanes: uint8[b, K/8, N]
    bit-planes -> int8[K, N] signed values. Used when deserializing
    packed weights (utils/serialization.py)."""
    planes = np.asarray(planes, np.uint8)
    kg, n = planes.shape[1], planes.shape[2]
    bitvals = (planes[:, :, None, :] >> np.arange(8).reshape(1, 1, 8, 1)) & 1
    weights = (1 << np.arange(bits)).reshape(bits, 1, 1, 1)
    vals = np.sum(bitvals.astype(np.int32) * weights, axis=0)
    vals = vals.reshape(kg * 8, n)[:k]
    offset = 1 << (bits - 1)
    return (vals - offset).astype(np.int8)


def pack_splitk(q: np.ndarray, bits: int) -> np.ndarray:
    """[K, N] signed b-bit integers -> uint8[ceil(K/r), N], r = 8//bits
    (b in {1, 2, 4}; b == 8 stores plain int8 -- see pack_qtensor).

    SPLIT-K layout: byte (k, n) holds the values of rows
    k, k + KR, k + 2*KR, ..., (KR = ceil(K/r)), value j in bit field
    [j*b, (j+1)*b), offset-binary (v + 2^(b-1)). The matmul never
    materializes the [K, N] weight: sub-dot j contracts x's CONTIGUOUS
    column block [j*KR, (j+1)*KR) against ((P >> j*b) & mask) - offset,
    so unpacking is 3 cheap VPU passes per sub-dot and no sublane
    interleave at all (the bit-plane layout needs an 8-way broadcast +
    relayout, ~10x the VPU work).
    """
    assert bits in (1, 2, 4), bits
    q = np.asarray(q)
    assert q.ndim == 2, "pack_splitk packs 2-D weights"
    k, n = q.shape
    r = 8 // bits
    kr = -(-k // r)
    offset = 1 << (bits - 1)
    u = (q.astype(np.int64) + offset).astype(np.uint8)
    assert u.max(initial=0) < (1 << bits), "values exceed bit width"
    if kr * r != k:
        # pad rows encode VALUE 0 (offset-binary `offset`)
        u = np.concatenate([u, np.full((kr * r - k, n), offset, np.uint8)],
                           axis=0)
    packed = np.zeros((kr, n), np.uint8)
    for j in range(r):
        packed |= u[j * kr:(j + 1) * kr] << np.uint8(j * bits)
    return packed


def unpack_splitk_np(packed: np.ndarray, bits: int, k: int) -> np.ndarray:
    """Host-side inverse of pack_splitk: uint8[KR, N] -> int8[K, N]."""
    packed = np.asarray(packed, np.uint8)
    r = 8 // bits
    mask = (1 << bits) - 1
    offset = 1 << (bits - 1)
    segs = [((packed >> (j * bits)) & mask).astype(np.int16) - offset
            for j in range(r)]
    return np.concatenate(segs, axis=0)[:k].astype(np.int8)


def unpack_stacked_np(planes: np.ndarray, bits: int, k: int) -> np.ndarray:
    """Host-side inverse of the TP-stacked layout
    (tensor.pack_qtensor shards>1): [S, KR_local, N] -> int8[K, N]."""
    planes = np.asarray(planes)
    s, n = planes.shape[0], planes.shape[2]
    kl = -(-k // s)
    if bits == 8:
        return planes.astype(np.int8).reshape(s * kl, n)[:k]
    segs = [unpack_splitk_np(planes[t], bits, kl) for t in range(s)]
    return np.concatenate(segs, axis=0)[:k]


def unpack_splitk(packed, bits: int, k: int):
    """jnp inverse of pack_splitk (interpret-mode tests; the fused
    matmul kernel unpacks per sub-dot and never builds [K, N])."""
    r = 8 // bits
    mask = (1 << bits) - 1
    offset = 1 << (bits - 1)
    p = packed.astype(jnp.int32)
    segs = [((p >> (j * bits)) & mask) - offset for j in range(r)]
    return jnp.concatenate(segs, axis=0)[:k].astype(jnp.int8)


def unpack_bitplanes(planes, bits: int, k: int):
    """uint8[b, K/8, N] bit-planes -> int8[K, N] signed values.

    jnp ops only -- usable inside Pallas kernel bodies (VPU) and under
    jit on any backend.
    """
    kg, n = planes.shape[1], planes.shape[2]
    # row r of group g has bit (planes[j, g] >> r) & 1
    p = planes.astype(jnp.int32)  # [b, K/8, N]
    p = jnp.broadcast_to(p[:, :, None, :], (bits, kg, 8, n))
    shifts = jax.lax.broadcasted_iota(jnp.int32, (bits, kg, 8, n), 2)
    bitvals = (p >> shifts) & 1  # [b, K/8, 8, N]
    weights = (jnp.int32(1) << jax.lax.broadcasted_iota(
        jnp.int32, (bits, kg, 8, n), 0))
    vals = jnp.sum(bitvals * weights, axis=0)  # [K/8, 8, N]
    vals = vals.reshape(kg * 8, n)[:k]
    offset = 1 << (bits - 1)
    return (vals - offset).astype(jnp.int8)

"""Global knobs for the framework."""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Matmul/conv precision for the float path. HIGHEST gives true-f32 MXU
# passes and is required to hold the reference parity tolerances
# (BASELINE.md: ViT float e2e atol 1e-4). Set to DEFAULT to trade
# parity margin for speed on the float path; the int8 path is unaffected.
float_matmul_precision = jax.lax.Precision.HIGHEST

# Dtype of the float data plane (FTensor). float32 (default) holds the
# reference parity tolerances. bfloat16 halves HBM traffic of the float
# segments between int8 matmuls (LayerNorm/Softmax/GELU/residuals) --
# a serving speed mode whose extra error is below int8 quantization
# noise on the tested models. Quant math (quantize/dequantize kernels)
# always computes in float32 or wider.
float_dtype = jnp.float32

# How packed sub-byte weights (PackedQTensor) execute a MatMul:
#   "unpack"  (default) -- unpack the bit-planes to int8 ONCE per
#              compiled program and run XLA's full-speed int8 dot. In a
#              serving loop (lax.scan) the unpack is loop-invariant and
#              hoisted, so sustained throughput matches unpacked weights
#              while HBM storage stays at bit_width/8 bytes per value.
#   "kernel"  -- the fused Pallas kernel unpacks tiles in VMEM on the
#              fly (kernels/qmatmul.py): no int8 copy of the weight ever
#              exists, minimal peak memory, but the per-tile VPU unpack
#              serializes against the MXU (measured 8-20x slower than
#              the XLA dot at ViT shapes on v5e -- BENCH_HISTORY.md).
packed_execution = "unpack"


def x64_enabled() -> bool:
    return bool(jax.config.jax_enable_x64)


class host_eager:
    """Context manager: run eager (non-jit) jnp ops on the HOST CPU
    backend instead of the default accelerator.

    Graph-construction work -- quantizing weights in ``Model.quantize``,
    the optimize() passes reading constant payloads, ``pack_weights`` --
    is many small per-tensor eager ops. On a remote-attached chip each
    one is an RPC round trip (~0.5 s over this rig's tunnel: measured
    596 s for optimize() alone, BENCH_HISTORY.md round 4). Under this
    context the same ops run on the local CPU backend (bit-identical:
    quantize is IEEE-exact f32 divide/rint/clip on either backend) and
    the finished payloads move to the accelerator in ONE batched
    transfer at ``_placed_params`` time.

    No-op (still correct) when the default backend already is the CPU.
    jit-compiled calls should NOT run under this context -- they would
    compile for CPU.
    """

    def __enter__(self):
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:  # no CPU backend registered
            self._ctx = None
            return self
        self._ctx = jax.default_device(cpu)
        self._ctx.__enter__()
        return self

    def __exit__(self, *exc):
        if self._ctx is not None:
            return self._ctx.__exit__(*exc)
        return False


class low_precision_floats:
    """Context manager: run the float data plane in bfloat16."""

    def __enter__(self):
        global float_dtype, float_matmul_precision
        self._prev = (float_dtype, float_matmul_precision)
        float_dtype = jnp.bfloat16
        float_matmul_precision = jax.lax.Precision.DEFAULT
        return self

    def __exit__(self, *exc):
        global float_dtype, float_matmul_precision
        float_dtype, float_matmul_precision = self._prev
        return False

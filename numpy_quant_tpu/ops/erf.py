"""erf via the Abramowitz & Stegun 7.1.26 polynomial.

The reference float path uses this polynomial rather than a libm erf
(reference: numpy_quant/numpy_helper.py:95-112); max abs error ~1.5e-7,
which is what sets the 1e-6 test tolerances. We replicate the exact
polynomial in float32 so the float path matches the reference, instead
of using jax.lax.erf.

``fast_erf`` is the serving-mode variant (used when
``config.float_dtype`` is bfloat16, the fp-tolerance mode): a clamped
odd polynomial with max abs error 3.1e-3 -- below the bfloat16
resolution and far below int8 quantization steps -- at roughly a third
of the VPU passes (no division, no exp, no sign fold). This is what
makes GELU cheap inside the XLA MLP mega-fusion, where every VPU pass
serializes against the int8 MXU dots.
"""
from __future__ import annotations

import jax.numpy as jnp


def erf(x):
    from .. import config
    if config.float_dtype == jnp.bfloat16:
        return fast_erf(x)
    return exact_erf(x)


def exact_erf(x):
    sign = jnp.sign(x)
    x = jnp.abs(x)

    a1 = 0.254829592
    a2 = -0.284496736
    a3 = 1.421413741
    a4 = -1.453152027
    a5 = 1.061405429
    p = 0.3275911

    t = 1.0 / (1.0 + p * x)
    y = 1.0 - (((((a5 * t + a4) * t) + a3) * t + a2) * t + a1) * t * jnp.exp(-x * x)
    return sign * y  # erf(-x) = -erf(x)


# tanh-form erf (the coefficients of the standard "tanh approximation"
# of GELU, re-expressed for erf): erf(u) ~ tanh(t1*u + t3*u^3)
# = 2*sigmoid(2*(t1*u + t3*u^3)) - 1. Max abs error 3.6e-4 over the
# whole line -- 10x tighter than the previous degree-9 polynomial --
# with ONE transcendental (XLA's native logistic) instead of a 5-term
# Horner chain + clip. Measured faster inside the MLP mega-fusion,
# which is VPU-bound with erf on the critical path (BENCH_HISTORY.md
# round 3: stubbing erf out entirely is worth +5.5% end-to-end).
_SIG_K1 = 2.2567583341910256   # 2 * sqrt(2/pi) * sqrt(2)
_SIG_K3 = 0.2018218978267034   # 2 * sqrt(2/pi) * 0.044715 * 2*sqrt(2)


def fast_erf(x):
    import jax

    dt = x.dtype
    u2 = x * x
    z = x * (jnp.asarray(_SIG_K1, dt) + jnp.asarray(_SIG_K3, dt) * u2)
    return 2.0 * jax.nn.sigmoid(z) - 1.0

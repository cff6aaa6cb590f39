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


# Least-squares fit of erf(u)/u in powers of u^2 on [0, 2.4] (clamped to
# +-1 outside, where erf is 1 to within 7e-4); odd symmetry is inherent
# so no sign fold is needed. Max abs error 3.1e-3 over the whole line.
_FAST_C = (1.1272116689247802, -0.3639503861912591, 0.09186081645735046,
           -0.013149953799143601, 0.0007758552470874938)


def fast_erf(x):
    dt = x.dtype
    u2 = x * x
    q = jnp.asarray(_FAST_C[4], dt)
    for c in _FAST_C[3::-1]:
        q = q * u2 + jnp.asarray(c, dt)
    return jnp.clip(x * q, -1.0, 1.0)

"""erf via the Abramowitz & Stegun 7.1.26 polynomial.

The reference float path uses this polynomial rather than a libm erf
(reference: numpy_quant/numpy_helper.py:95-112); max abs error ~1.5e-7,
which is what sets the 1e-6 test tolerances. We replicate the exact
polynomial in float32 so the float path matches the reference, instead
of using jax.lax.erf.
"""
from __future__ import annotations

import jax.numpy as jnp


def erf(x):
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

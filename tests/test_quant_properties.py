"""Property-based bit-exactness: the quant math core vs the reference
(SURVEY.md §7 stage-1 'property tests vs reference formulas').

Hypothesis drives random ranges/arrays/bit widths through
quant_parameters / quantize / dequantize / q_matmul / requantize and
asserts BIT-equality against /root/reference/numpy_quant/
numpy_quantization.py on every example -- the hand-written parity tests
pin specific shapes; these sweep the space.
"""
import numpy as np
import pytest

from hypothesis import given, settings, strategies as st

import numpy_quant_tpu.quantization as Q

from .oracle import ref_quantization, requires_reference

pytestmark = requires_reference

# magnitudes a real calibration could produce: tiny-but-nonzero draws
# (denormal-adjacent) push scales into subnormal f32 where the
# reference's own arithmetic emits 'invalid value' warnings -- no
# meaningful parity there, so they snap to zero
finite_f32 = st.floats(min_value=-1e4, max_value=1e4, width=32,
                       allow_nan=False, allow_infinity=False) \
    .map(lambda v: 0.0 if abs(v) < 1e-6 else v)


def _minmax(lo, hi):
    mn = np.float32(min(lo, hi))
    mx = np.float32(max(lo, hi))
    # tensor_min_max clamps 0 into the range (reference tensor.py:233-235)
    return min(mn, np.float32(0)), max(mx, np.float32(0))


@settings(max_examples=80, deadline=None, derandomize=True)
@given(lo=finite_f32, hi=finite_f32,
       bits=st.integers(min_value=1, max_value=16),
       asym=st.booleans())
def test_quant_parameters_property(lo, hi, bits, asym):
    ref = ref_quantization()
    mn, mx = _minmax(lo, hi)
    if asym and mx == mn:
        return  # zero-width asymmetric range divides by zero identically
    s, zp = Q.quant_parameters(mn, mx, bits, asym)
    rs, rzp = ref.quant_parameters(mn, mx, bit_width=bits, asymmetric=asym)
    assert np.float32(s) == np.float32(rs)
    if asym:
        # subnormal-width ranges make min/scale overflow; the reference
        # then wraps a non-finite zero point through the int64 cast
        # (numpy 'invalid value in cast' UB) -- no meaningful parity
        z0 = np.float32(-(2.0 ** (bits - 1))) - mn / np.float32(rs)
        if not np.isfinite(z0) or abs(float(z0)) > 2.0 ** 62:
            return
        assert np.int64(zp) == np.int64(rzp)
    else:
        assert zp is None and rzp is None


@settings(max_examples=40, deadline=None, derandomize=True)
@given(data=st.data(),
       bits=st.integers(min_value=2, max_value=16),
       asym=st.booleans())
def test_quantize_dequantize_property(data, bits, asym):
    ref = ref_quantization()
    shape = data.draw(st.tuples(st.integers(1, 5), st.integers(1, 7)))
    x = data.draw(
        st.lists(finite_f32, min_size=shape[0] * shape[1],
                 max_size=shape[0] * shape[1])
    )
    x = np.asarray(x, np.float32).reshape(shape)
    mn, mx = _minmax(x.min(), x.max())
    if asym and mx == mn:
        return
    s, zp = Q.quant_parameters(mn, mx, bits, asym)
    if np.float32(s) == 0:
        return  # degenerate all-zero range
    q_ours = np.asarray(Q.quantize(x, bits, s, zp)).astype(np.int64)
    q_ref = ref.quantize(x, bit_width=bits, scale=s, zero_point=zp)
    np.testing.assert_array_equal(q_ours, q_ref)
    d_ours = np.asarray(Q.dequantize(q_ours, s, zp))
    d_ref = ref.dequantize(q_ref, scale=s, zero_point=zp)
    np.testing.assert_array_equal(d_ours.astype(np.float32),
                                  d_ref.astype(np.float32))


@settings(max_examples=30, deadline=None, derandomize=True)
@given(data=st.data(),
       bits=st.integers(min_value=2, max_value=8),
       asym_a=st.booleans(), asym_b=st.booleans())
def test_q_matmul_requantize_property(data, bits, asym_a, asym_b):
    ref = ref_quantization()
    m = data.draw(st.integers(1, 4))
    k = data.draw(st.integers(1, 6))
    n = data.draw(st.integers(1, 4))
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    qa = np.asarray(data.draw(st.lists(
        st.integers(lo, hi), min_size=m * k, max_size=m * k)),
        np.int64).reshape(m, k)
    qb = np.asarray(data.draw(st.lists(
        st.integers(lo, hi), min_size=k * n, max_size=k * n)),
        np.int64).reshape(k, n)
    sa = np.float32(data.draw(st.floats(float(np.float32(0.001)), 10.0, width=32)))
    sb = np.float32(data.draw(st.floats(float(np.float32(0.001)), 10.0, width=32)))
    za = np.int64(data.draw(st.integers(lo, hi))) if asym_a else None
    zb = np.int64(data.draw(st.integers(lo, hi))) if asym_b else None

    acc, s, zp = Q.q_matmul(qa, sa, za, qb, sb, zb, bit_width=bits)
    racc, rs, rzp = ref.q_matmul(qa, sa, za, qb, sb, zb)
    np.testing.assert_array_equal(np.asarray(acc, np.int64), racc)
    assert np.float32(s) == np.float32(rs)
    if zp is None:
        assert rzp is None
    else:
        np.testing.assert_array_equal(np.asarray(zp, np.int64),
                                      np.asarray(rzp, np.int64))

    res_s = np.float32(data.draw(st.floats(float(np.float32(0.001)), 10.0, width=32)))
    res_zp = np.int64(data.draw(st.integers(lo, hi)))
    ours = np.asarray(Q.requantize(np.asarray(acc), s, zp,
                                   res_s, res_zp, bits), np.int64)
    theirs = ref.requantize(racc, rs, rzp, res_s, res_zp, bit_width=bits)
    np.testing.assert_array_equal(ours, theirs.astype(np.int64))

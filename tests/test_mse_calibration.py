"""utils.mse_clipped_stats: MSE-optimal clipped calibration (the "MSE"
calibrator of mainstream toolchains). Produces a standard stats dict
for Model.quantize(stats=...).
"""
import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu import onnx as O

RNG = np.random.default_rng(53)


def _identityish_model(k=64):
    """x -> MatMul(I-ish) -> y: the output quantization error directly
    reflects the input's calibration quality."""
    W = np.eye(k, dtype=np.float32) + 0.01 * RNG.normal(
        size=(k, k)).astype(np.float32)
    g = O.make_graph(
        [O.make_node("MatMul", ["x", "w"], ["y"], name="mm")], "mse",
        [O.make_tensor_value_info("x", O.TensorProto.FLOAT, [256, k])],
        [O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)],
        initializer=[O.from_array(W, "w")])
    return O.make_model(g)


def test_mse_stats_beat_minmax_on_heavy_tails():
    """Heavy-tailed activations (a Laplace body with rare huge
    outliers) at LOW activation bits -- the regime the MSE calibrator
    targets: min/max spends the few levels on the outliers, the MSE
    clip sacrifices them for the body. (At int8's 255 levels, keeping
    a handful of outliers IS MSE-optimal, and the search must also
    know that: asserted below.)"""
    m = _identityish_model()
    x = RNG.laplace(size=(256, 64)).astype(np.float32)
    x[0, :4] = 30.0  # rare one-sided outliers stretch min/max 10x

    model = nq.Model.from_onnx(m)
    y_ref = model([x])[0]
    bits = 4

    q_minmax = model.quantize([x], bit_width=bits)
    err_minmax = np.abs(q_minmax([x])[0] - y_ref).mean()

    from numpy_quant_tpu.utils import mse_clipped_stats
    stats = mse_clipped_stats(model, [x], bit_width=bits)
    # the per-side search clipped the one-sided outlier tail
    assert stats["x"][1] < 15.0, stats["x"]
    q_mse = model.quantize(bit_width=bits, stats=stats)
    err_mse = np.abs(q_mse([x])[0] - y_ref).mean()
    assert err_mse < err_minmax * 0.75, (err_mse, err_minmax)

    # with HUGE outliers at int8 the same data is best served
    # UNCLIPPED (the outlier's squared clip error dwarfs the step-size
    # gain) -- the search agrees with the exact tradeoff instead of
    # always clipping
    x2 = x.copy()
    x2[0, :4] = 120.0
    stats8 = mse_clipped_stats(model, [x2], bit_width=8)
    assert stats8["x"][1] == np.float32(120.0), stats8["x"]

    # the dict is the standard stats format: it round-trips through
    # save/load and merge
    from numpy_quant_tpu.utils import (load_calibration_stats,
                                       merge_calibration_stats,
                                       save_calibration_stats)
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "s.json")
        save_calibration_stats(stats, p)
        loaded = load_calibration_stats(p)
    assert set(loaded) == set(stats)
    merged = merge_calibration_stats(stats, stats)
    assert set(merged) == set(stats)


def test_mse_stats_fixture_accuracy_holds():
    """On the trained ViT fixture, MSE-calibrated int8 keeps task
    accuracy (well-behaved activations: the search may keep ranges
    near min/max, it must never hurt)."""
    from numpy_quant_tpu.models import fixtures as F
    from numpy_quant_tpu.utils import mse_clipped_stats

    m = F.trained_vit_onnx(batch_size=16)
    model = nq.Model.from_onnx(m)
    x, labels = F.make_batch(np.random.default_rng(14), 16)
    calib, _ = F.make_batch(np.random.default_rng(15), 16)

    base_acc = (model.quantize([calib], bit_width=8)([x])[0]
                .argmax(-1) == labels).mean()
    stats = mse_clipped_stats(model, [calib], bit_width=8)
    q = model.quantize(bit_width=8, stats=stats)
    acc = (q([x])[0].argmax(-1) == labels).mean()
    assert acc >= base_acc - 1e-9, (acc, base_acc)

"""utils.kl_calibrated_stats: entropy (KL-divergence) calibration, the
TensorRT method. Produces a standard stats dict for
Model.quantize(stats=...).
"""
import numpy as np

import numpy_quant_tpu as nq
from numpy_quant_tpu import onnx as O
from numpy_quant_tpu.utils import kl_calibrated_stats

RNG = np.random.default_rng(67)


def _identityish_model(k=64, rows=256):
    W = np.eye(k, dtype=np.float32) + 0.01 * RNG.normal(
        size=(k, k)).astype(np.float32)
    g = O.make_graph(
        [O.make_node("MatMul", ["x", "w"], ["y"], name="mm")], "kl",
        [O.make_tensor_value_info("x", O.TensorProto.FLOAT, [rows, k])],
        [O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)],
        initializer=[O.from_array(W, "w")])
    return O.make_model(g)


def test_kl_stats_beat_minmax_on_heavy_tails():
    """Laplace body with rare huge outliers at 4 activation bits: the
    entropy threshold clips the tail min/max wastes levels on."""
    m = _identityish_model()
    x = RNG.laplace(size=(256, 64)).astype(np.float32)
    x[0, :4] = 30.0

    model = nq.Model.from_onnx(m)
    y_ref = np.asarray(model([x])[0])
    bits = 4

    q_minmax = nq.Model.from_onnx(m).quantize([x], bit_width=bits)
    err_minmax = np.abs(np.asarray(q_minmax([x])[0]) - y_ref).mean()

    model2 = nq.Model.from_onnx(m)
    stats = kl_calibrated_stats(model2, [x], bit_width=bits)
    # the searched threshold actually clips
    assert stats["x"][1] < np.float32(x.max())
    q_kl = model2.quantize(stats=stats, bit_width=bits)
    err_kl = np.abs(np.asarray(q_kl([x])[0]) - y_ref).mean()
    assert err_kl < err_minmax * 0.6, (err_kl, err_minmax)


def test_kl_stats_no_tail_stays_near_minmax():
    """Well-behaved activations: the entropy threshold keeps (almost)
    the full observed range, and accuracy matches min/max closely."""
    m = _identityish_model()
    x = RNG.normal(size=(256, 64)).astype(np.float32)

    model = nq.Model.from_onnx(m)
    y_ref = np.asarray(model([x])[0])
    stats = kl_calibrated_stats(model, [x], bit_width=8)
    q = model.quantize(stats=stats, bit_width=8)
    err = np.abs(np.asarray(q([x])[0]) - y_ref).mean()

    q_mm = nq.Model.from_onnx(m).quantize([x], bit_width=8)
    err_mm = np.abs(np.asarray(q_mm([x])[0]) - y_ref).mean()
    # KL optimizes information retention, not MSE: on a clean gaussian
    # it clips a few sigma in (its documented TensorRT behavior), which
    # costs bounded MSE -- assert the degradation stays small, and rely
    # on the task-level fixture test for the metric KL targets
    assert err < err_mm * 2.0, (err, err_mm)


def test_kl_stats_fixture_accuracy_holds():
    """Trained ViT fixture: int8 with KL stats keeps task accuracy."""
    from numpy_quant_tpu.models import fixtures as F

    m = F.trained_vit_onnx(batch_size=16)
    x, labels = F.make_batch(np.random.default_rng(10), 16)
    model = nq.Model.from_onnx(m)
    f_acc = (np.asarray(model([x])[0]).argmax(-1) == labels).mean()
    stats = kl_calibrated_stats(model, [x], bit_width=8)
    q = model.quantize(stats=stats, bit_width=8)
    acc = (np.asarray(q([x])[0]).argmax(-1) == labels).mean()
    assert acc >= f_acc - 1e-9, (acc, f_acc)

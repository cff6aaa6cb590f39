"""Quantization-aware training (qat.py): the fake-quant simulation
tracks the integer executor, end-to-end STE fine-tuning beats plain PTQ
at low bit widths, and the knobs (labels, train_filter, quantize kwargs,
int64 inputs) compose. Parity-plus: the reference is PTQ-only
(reference model.py:328-442).
"""
import pathlib

import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu.qat import fake_quant_forward

MLP_PATH = pathlib.Path(__file__).parent.parent / "numpy_quant_tpu" \
    / "models" / "mlp.onnx"
RNG = np.random.default_rng(17)


@pytest.fixture(scope="module")
def circles():
    from sklearn.datasets import make_circles
    X, Y = make_circles(n_samples=600, noise=0.03, random_state=3)
    return X.astype(np.float32), Y.astype(np.int64)


@pytest.fixture(scope="module")
def mlp():
    return nq.Model.from_onnx(nq.onnx.load(MLP_PATH))


def test_fake_quant_forward_tracks_qmodel(mlp, circles):
    """The QAT simulation = the integer executor up to accumulation
    rounding: same labels, close probabilities."""
    X, _ = circles
    q = mlp.quantize([X], bit_width=8)
    got = fake_quant_forward(mlp, q, [X])[0]
    want = q([X])[0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=0.02)
    assert (np.rint(got) == np.rint(want)).mean() > 0.99  # sigmoid labels


def test_qat_beats_ptq_at_low_bits(mlp, circles):
    """4-bit MLP: end-to-end fine-tuning under fake quantization gets
    closer to the float outputs than plain PTQ, the loss actually
    decreases, and the float model is left untouched."""
    X, _ = circles
    f_out = mlp([X])[0]

    ptq = mlp.quantize([X], bit_width=4)
    qat = mlp.qat_quantize([X], bit_width=4, steps=150, lr=3e-3)

    hist = qat.qat_loss_history
    assert hist.shape == (150,) and hist.min() < hist[0] * 0.8

    ptq_mse = np.mean((ptq([X])[0] - f_out) ** 2)
    qat_mse = np.mean((qat([X])[0] - f_out) ** 2)
    assert qat_mse < ptq_mse

    # float model untouched (weights restored, caches coherent)
    np.testing.assert_array_equal(mlp([X])[0], f_out)


def test_qat_label_loss_and_filter(mlp, circles):
    """Cross-entropy-against-labels loss path... on a sigmoid head the
    CE form doesn't apply, so drive the explicit loss_fn hook instead,
    restricted by train_filter to fc2 only -- fc1's payload must stay
    exactly the PTQ integers."""
    import jax.numpy as jnp

    X, Y = circles
    yj = Y.astype(np.float32)

    def loss_fn(outs):
        p = jnp.clip(outs[0][:, 0], 1e-6, 1 - 1e-6)
        y = jnp.asarray(yj)
        return -jnp.mean(y * jnp.log(p) + (1 - y) * jnp.log(1 - p))

    ptq = mlp.quantize([X], bit_width=4)
    qat = mlp.qat_quantize([X], bit_width=4, steps=120, lr=3e-3,
                           loss_fn=loss_fn,
                           train_filter=lambda n: n.startswith("fc2."))
    assert qat.qat_loss_history.min() < qat.qat_loss_history[0]

    payload = {v.name: v for v in qat.values}
    ref = {v.name: v for v in ptq.values}
    np.testing.assert_array_equal(
        np.asarray(payload["fc1.weight"].data.data),
        np.asarray(ref["fc1.weight"].data.data))
    assert not np.array_equal(
        np.asarray(payload["fc2.weight"].data.data),
        np.asarray(ref["fc2.weight"].data.data))

    # accuracy on the training labels: at least PTQ's
    acc = lambda m: ((m([X])[0][:, 0] > 0.5) == Y).mean()  # noqa: E731
    assert acc(qat) >= acc(ptq)


def test_qat_recovers_trained_vit_at_3bit():
    """Capstone: on the trained ViT fixture, 3-bit PTQ visibly drops
    held-out accuracy; end-to-end QAT on ONE 64-sample calibration
    batch (self-distilled, no labels) recovers a solid chunk of it --
    and the gain generalizes to unseen batches, it is not calibration
    overfit (measured: float 99.6%, PTQ ~91%, QAT ~95%)."""
    from numpy_quant_tpu.models import fixtures as F

    model = nq.Model.from_onnx(F.trained_vit_onnx(batch_size=64))

    def acc(m):
        hits, n = 0, 0
        for seed in range(4):  # held-out: disjoint from the calib seed
            x, labels = F.make_batch(np.random.default_rng(100 + seed), 64)
            hits += (m([x])[0].argmax(-1) == labels).sum()
            n += len(labels)
        return hits / n

    calib, _ = F.make_batch(np.random.default_rng(1), 64)
    ptq_acc = acc(model.quantize([calib], bit_width=3))
    qat = model.qat_quantize([calib], bit_width=3, steps=60, lr=1e-3)
    qat_acc = acc(qat)
    assert qat.qat_loss_history.min() < qat.qat_loss_history[0] * 0.5
    assert qat_acc > ptq_acc + 0.015, (qat_acc, ptq_acc)


def test_qat_int64_inputs_and_mixed_width():
    """BERT text graph: int64 ids bind as static shape-domain constants
    of the training step; W4A8 kwargs pass through to both quantize
    calls."""
    from numpy_quant_tpu.models.text import bert_text_classifier

    m = bert_text_classifier(batch_size=8, seq_len=8, seed=3)
    ids = RNG.integers(0, 96, size=(8, 8)).astype(np.int64)
    model = nq.Model.from_onnx(m)

    qat = model.qat_quantize([ids], bit_width=8, weight_bit_width=4,
                             steps=40, lr=1e-3)
    assert qat.qat_loss_history.min() < qat.qat_loss_history[0]
    out = qat([ids])[0]
    assert out.shape == (8, 4) and np.isfinite(out).all()

    # mixed width survived: matmul weights are 4-bit
    from numpy_quant_tpu.graph import Constant
    from numpy_quant_tpu.tensor import QTensor
    widths = {v.data.bit_width for v in qat.values
              if isinstance(v, Constant) and isinstance(v.data, QTensor)
              and v.name.endswith("weight_t")}
    assert widths == {4}

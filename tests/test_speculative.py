"""Greedy speculative decoding (utils/generate.py::
generate_speculative): draft-propose / target-verify in one compiled
program. With greedy acceptance the output must be IDENTICAL to
target-only greedy decoding -- the draft only changes the number of
target forwards. The reference framework has no generation surface;
parity-plus.
"""
import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu.models.gpt import gpt_causal_lm
from numpy_quant_tpu.utils import generate, generate_speculative

RNG = np.random.default_rng(41)


@pytest.fixture(scope="module")
def target():
    p = gpt_causal_lm(batch_size=2, seq_len=24, seed=0)
    return p, nq.Model.from_onnx(p)


def test_perfect_draft_exact_and_fewer_forwards(target):
    """A draft identical to the target accepts every proposal: exact
    tokens in ceil(new/(k+1)) verify rounds."""
    proto, model = target
    draft_p = gpt_causal_lm(batch_size=2, seq_len=24, seed=0)
    draft = nq.Model.from_onnx(draft_p)
    prompt = RNG.integers(0, 96, size=(2, 4)).astype(np.int32)
    want = generate(model, prompt, proto._wte, max_new_tokens=12)
    ids, rounds = generate_speculative(model, draft, prompt, proto._wte,
                                       draft_p._wte, max_new_tokens=12,
                                       k=4)
    np.testing.assert_array_equal(ids, want)
    assert rounds == 3  # 12 tokens / (k+1)=5 per round, per-row lockstep


def test_foreign_draft_exact(target):
    """A draft with DIFFERENT weights still yields exactly the target's
    greedy tokens (rejected proposals are corrected), just in more
    rounds -- and never more than max_new_tokens of them."""
    proto, model = target
    draft_p = gpt_causal_lm(batch_size=2, seq_len=24, seed=9)
    draft = nq.Model.from_onnx(draft_p)
    prompt = RNG.integers(0, 96, size=(2, 4)).astype(np.int32)
    want = generate(model, prompt, proto._wte, max_new_tokens=12)
    ids, rounds = generate_speculative(model, draft, prompt, proto._wte,
                                       draft_p._wte, max_new_tokens=12,
                                       k=4)
    np.testing.assert_array_equal(ids, want)
    assert 1 <= rounds <= 12


def test_quantized_target_exact(target):
    """The int8 executor drops in as the verify model: speculative
    tokens equal the quantized model's own greedy decode exactly."""
    proto, model = target
    embeds = RNG.normal(size=(2, 24, 32)).astype(np.float32)
    q = model.quantize([embeds], bit_width=8)
    draft_p = gpt_causal_lm(batch_size=2, seq_len=24, seed=9)
    draft = nq.Model.from_onnx(draft_p)
    prompt = RNG.integers(0, 96, size=(2, 4)).astype(np.int32)
    want = generate(q, prompt, proto._wte, max_new_tokens=10)
    ids, _ = generate_speculative(q, draft, prompt, proto._wte,
                                  draft_p._wte, max_new_tokens=10, k=3)
    np.testing.assert_array_equal(ids, want)


def test_length_validation(target):
    proto, model = target
    draft_p = gpt_causal_lm(batch_size=2, seq_len=24, seed=9)
    draft = nq.Model.from_onnx(draft_p)
    prompt = RNG.integers(0, 96, size=(2, 4)).astype(np.int32)
    with pytest.raises(ValueError):  # 4 + 20 + 4 - 1 > 24
        generate_speculative(model, draft, prompt, proto._wte,
                             draft_p._wte, max_new_tokens=20, k=4)

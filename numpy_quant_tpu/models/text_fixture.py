"""Trained-weights GPT fixture for decode/serving accuracy capstones.

The reference ties quantization to TASK accuracy: MLP accuracy across
bit widths (reference test/test_mlp.py:177-186) and real-ViT label
equality (reference test/long_running/test_vit.py:167). The vision side
of this build replicates that with trained ViT fixtures
(models/fixtures.py); this module gives the LLM-serving surface the
same oracle: a compact GPT TRAINED to near-perfect accuracy on a
procedural language, weights committed to the repo, so weight-only /
AWQ / GPTQ / int8-KV / continuous-batching configs can assert
TOKEN-level correctness on a model that actually works -- random-init
GPTs prove mechanism parity but say nothing about accuracy impact.

Task: token COPY (the induction-head language). A sample is
``s + [SEP] + s`` where ``s`` is a random token sequence; trained on
next-token prediction, the model learns to reproduce ``s`` after the
separator with near-1.0 confidence -- large logit margins, so a
correct quantized model must match float token-for-token, and an
accuracy-damaging config shows up immediately as copy errors.

``python -m numpy_quant_tpu.models.text_fixture`` retrains and
rewrites the committed weight file (fixtures/gpt_trained.npz, float16
storage like the ViT-Base fixture).
"""
from __future__ import annotations

import os

import numpy as np

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "fixtures")
WEIGHTS_PATH = os.path.join(FIXTURE_DIR, "gpt_trained.npz")

VOCAB = 50          # 0..47 data tokens, 48 = SEP, 49 unused (pad)
SEP = 48
COPY_LEN = 12       # length of the copied segment s
SEQ_LEN = 2 * COPY_LEN + 1   # s + SEP + s
N_POSITIONS = 32


def fixture_config():
    from transformers import GPT2Config
    return GPT2Config(vocab_size=VOCAB, n_positions=N_POSITIONS,
                      n_embd=128, n_layer=2, n_head=4,
                      activation_function="gelu",
                      attn_implementation="eager")


def make_copy_batch(rng: np.random.Generator, n: int,
                    copy_len: int = COPY_LEN):
    """n copy-language sequences [n, 2*copy_len+1] int64:
    ``s + [SEP] + s`` with s uniform over the data tokens."""
    s = rng.integers(0, SEP, size=(n, copy_len))
    sep = np.full((n, 1), SEP)
    return np.concatenate([s, sep, s], axis=1).astype(np.int64)


def make_prompts(rng: np.random.Generator, n: int,
                 copy_len: int = COPY_LEN):
    """(prompts [n, copy_len+1], expected [n, copy_len]): the prompt is
    ``s + [SEP]``; a perfectly trained model greedy-decodes ``s``."""
    seqs = make_copy_batch(rng, n, copy_len)
    return seqs[:, :copy_len + 1], seqs[:, copy_len + 1:]


def _build_module(state: dict | None = None):
    import torch
    from transformers.models.gpt2.modeling_gpt2 import GPT2LMHeadModel

    torch.manual_seed(0)
    module = GPT2LMHeadModel(fixture_config())
    if state is not None:
        module.load_state_dict(
            {k: torch.from_numpy(np.asarray(v, np.float32))
             for k, v in state.items()})
    return module


def trained_gpt_module():
    """The committed trained copy-language GPT as a torch module."""
    state = dict(np.load(WEIGHTS_PATH))
    return _build_module(state).eval()


def trained_gpt_onnx(batch_size: int = 1, seq_len: int = SEQ_LEN):
    """Full-sequence causal graph of the trained fixture
    (models/gpt.py gpt_causal_lm form)."""
    from .gpt import gpt_causal_lm
    return gpt_causal_lm(module=trained_gpt_module(),
                         batch_size=batch_size, seq_len=seq_len)


def trained_gpt_decode_onnx(batch_size: int = 1,
                            max_len: int = SEQ_LEN - 1):
    """KV-cache decode-step graph of the trained fixture
    (models/gpt.py gpt_decode_step form)."""
    from .gpt import gpt_decode_step
    return gpt_decode_step(module=trained_gpt_module(),
                           batch_size=batch_size, max_len=max_len)


def trained_gpt_prefill_onnx(prefill_len: int):
    """Prefill graph of the trained fixture (gpt_prefill form), for
    ContinuousBatcher admission."""
    from .gpt import gpt_prefill
    return gpt_prefill(module=trained_gpt_module(),
                       prefill_len=prefill_len)


def copy_accuracy(generated: np.ndarray, expected: np.ndarray) -> float:
    """Fraction of generated tokens matching the copy target."""
    generated = np.asarray(generated)[..., :expected.shape[-1]]
    return float((generated == expected).mean())


def train_fixture(steps: int = 3000, batch: int = 128, lr: float = 1e-3,
                  seed: int = 0, path: str = WEIGHTS_PATH) -> float:
    """Train the copy-language GPT and write the weight file (float16
    storage; accuracy is measured on the f16-rounded weights that get
    committed). Returns the held-out next-token copy accuracy."""
    import torch

    torch.manual_seed(seed)
    module = _build_module()
    module.train()
    opt = torch.optim.AdamW(module.parameters(), lr=lr)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=steps)
    rng = np.random.default_rng(seed)
    for step in range(steps):
        seqs = torch.from_numpy(make_copy_batch(rng, batch))
        out = module(input_ids=seqs, labels=seqs)
        opt.zero_grad()
        out.loss.backward()
        opt.step()
        sched.step()
        if step % 200 == 0:
            with torch.no_grad():
                logits = out.logits[:, COPY_LEN:-1]   # predicting the copy
                tgt = seqs[:, COPY_LEN + 1:]
                acc = (logits.argmax(-1) == tgt).float().mean()
            print(f"step {step:5d}  loss {float(out.loss):.4f}  "
                  f"copy-acc {float(acc):.3f}", flush=True)
    module.eval()
    # store f16, measure with exactly what will be committed
    state = {k: v.detach().numpy().astype(np.float16)
             for k, v in module.state_dict().items()}
    module = _build_module({k: v for k, v in state.items()}).eval()
    seqs = torch.from_numpy(make_copy_batch(
        np.random.default_rng(seed + 1), 512))
    with torch.no_grad():
        logits = module(input_ids=seqs).logits[:, COPY_LEN:-1]
    acc = float((logits.argmax(-1).numpy()
                 == seqs[:, COPY_LEN + 1:].numpy()).mean())
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **state)
    print(f"held-out copy accuracy {acc:.4f}; wrote {path}")
    return acc


if __name__ == "__main__":
    train_fixture()

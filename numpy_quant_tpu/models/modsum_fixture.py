"""Trained modular-arithmetic GPT fixture: the DISCRIMINATING accuracy
oracle for low-bit quantization passes.

The copy-language fixture (models/text_fixture.py) saturates: every
serving config scores 1.000, so it cannot show that AWQ/GPTQ/AdaRound
buy anything (round-4 VERDICT weak #5). This task is built to have a
sharp accuracy cliff instead of huge logit margins:

* RUNNING MODULAR SUM, interleaved: a sample is
  ``x1 r1 x2 r2 ... xk rk`` with ``x_i`` uniform in [0, p) and
  ``r_i = (x_1 + ... + x_i) mod p``. Next-token prediction is only
  learnable at the ``x_i`` positions (predict ``r_i`` -- dense
  supervision); the ``r -> x`` positions are irreducible noise the
  accuracy metric ignores.
* Computing ``r_i`` needs exact p-way arithmetic over the whole
  prefix (the known circular-embedding solution), at 4-layer depth:
  quantization noise in ANY layer rotates the answer off its residue
  class, and errors COMPOUND along the sequence -- unlike the copy
  task, whose attention-only solution tolerates large perturbations.

This is the build's substitute for the reference's real-pretrained-
weights oracle (reference test/long_running/test_vit.py:112-167,
int8-vs-float label equality on google/vit-base-patch16-224): an
accuracy benchmark that can actually FAIL, on which the accuracy
passes (AWQ/GPTQ/AdaRound, docs/QUANTIZATION.md) must demonstrate
measurable recovery over plain rounding at the same bit width.

``python -m numpy_quant_tpu.models.modsum_fixture`` retrains and
rewrites the committed weight file (fixtures/modsum_trained.npz).
"""
from __future__ import annotations

import os

import numpy as np

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "fixtures")
WEIGHTS_PATH = os.path.join(FIXTURE_DIR, "modsum_trained.npz")

P = 97              # modulus; tokens 0..96 are both inputs and sums
VOCAB = P
K_TERMS = 12        # terms per sample
SEQ_LEN = 2 * K_TERMS            # x1 r1 ... xk rk
N_POSITIONS = SEQ_LEN


def fixture_config():
    from transformers import GPT2Config
    return GPT2Config(vocab_size=VOCAB, n_positions=N_POSITIONS,
                      n_embd=128, n_layer=4, n_head=4,
                      activation_function="gelu",
                      attn_implementation="eager")


def make_modsum_batch(rng: np.random.Generator, n: int,
                      k: int = K_TERMS):
    """n interleaved running-sum sequences [n, 2k] int64:
    ``x1 r1 x2 r2 ...`` with r_i the prefix sum mod P."""
    x = rng.integers(0, P, size=(n, k))
    r = np.cumsum(x, axis=1) % P
    seq = np.empty((n, 2 * k), dtype=np.int64)
    seq[:, 0::2] = x
    seq[:, 1::2] = r
    return seq


def modsum_accuracy(logits: np.ndarray, seqs: np.ndarray) -> float:
    """Teacher-forced accuracy at the LEARNABLE positions: logits[t]
    predicts token t+1, which is a running sum exactly when t is even
    (an ``x_i`` position). Scores sums r_2..r_k (r_1 is the copy of
    x_1 -- trivially right and scored too)."""
    logits = np.asarray(logits)
    preds = logits[:, 0::2, :].argmax(-1)      # predictions at x slots
    targets = np.asarray(seqs)[:, 1::2]        # the r_i tokens
    return float((preds == targets).mean())


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


def trained_modsum_module():
    """The committed trained modular-sum GPT as a torch module."""
    state = dict(np.load(WEIGHTS_PATH))
    return _build_module(state).eval()


def trained_modsum_onnx(batch_size: int = 1, seq_len: int = SEQ_LEN):
    """Full-sequence causal graph of the trained fixture
    (models/gpt.py gpt_causal_lm form)."""
    from .gpt import gpt_causal_lm
    return gpt_causal_lm(module=trained_modsum_module(),
                         batch_size=batch_size, seq_len=seq_len)


def train_fixture(steps: int = 8000, batch: int = 256, lr: float = 1e-3,
                  seed: int = 0, path: str = WEIGHTS_PATH) -> float:
    """Train the running-modular-sum GPT and write the weight file
    (float16 storage; accuracy is measured on the f16-rounded weights
    that get committed). Returns held-out sum accuracy."""
    import torch

    torch.manual_seed(seed)
    module = _build_module()
    module.train()
    # NO weight decay: decay flattens the weight distribution, which
    # makes low-bit rounding benign -- the fixture exists to have
    # weights whose outlier structure low-bit quantization HURTS
    opt = torch.optim.AdamW(module.parameters(), lr=lr,
                            weight_decay=0.0)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=steps)
    rng = np.random.default_rng(seed)
    for step in range(steps):
        seqs = torch.from_numpy(make_modsum_batch(rng, batch))
        # supervise ONLY the learnable (sum) positions: labels -100
        # elsewhere so the r->x noise does not dominate the loss
        labels = seqs.clone()
        labels[:, 0::2] = -100          # x positions as TARGETS
        out = module(input_ids=seqs, labels=labels)
        opt.zero_grad()
        out.loss.backward()
        opt.step()
        sched.step()
        if step % 400 == 0:
            with torch.no_grad():
                acc = modsum_accuracy(out.logits.numpy(), seqs.numpy())
            print(f"step {step:5d}  loss {float(out.loss):.4f}  "
                  f"sum-acc {acc:.3f}", flush=True)
    module.eval()
    state = {k: v.detach().numpy().astype(np.float16)
             for k, v in module.state_dict().items()}
    module = _build_module(dict(state)).eval()
    seqs = torch.from_numpy(make_modsum_batch(
        np.random.default_rng(seed + 1), 1024))
    with torch.no_grad():
        logits = module(input_ids=seqs).logits.numpy()
    acc = modsum_accuracy(logits, seqs.numpy())
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **state)
    print(f"held-out sum accuracy {acc:.4f}; wrote {path}")
    return acc


if __name__ == "__main__":
    train_fixture()

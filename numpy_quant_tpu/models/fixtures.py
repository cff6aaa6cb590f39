"""Trained-weights ViT fixture for task-level accuracy tests.

The reference's capstone test runs the PRETRAINED
google/vit-base-patch16-224 on tiny-imagenet images and asserts
int8-vs-float LABEL EQUALITY (reference: test/long_running/test_vit.py:
112-167). This environment has no network, so that exact fixture is
unavailable; the sanctioned substitute is a committed deterministic
realistic-weights fixture: a compact ViT TRAINED (not random-init) on a
procedural 8-class image task, with its weights committed to the repo.
Trained weights have the statistics that matter for quantization
behavior -- smooth filters, calibrated layer norms, non-chaotic forward
dynamics -- unlike random-init ViTs, whose 12-layer random compositions
amplify any perturbation exponentially and make argmax agreement a
meaningless oracle.

Task: 64x64 RGB gratings; class = color {R, G, B, Y} x orientation
{horizontal, vertical}. Deterministic generator (seeded numpy).

``python -m numpy_quant_tpu.models.fixtures`` retrains and rewrites the
committed weight file (fixtures/vit_trained.npz).
"""
from __future__ import annotations

import os

import numpy as np

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "fixtures")
WEIGHTS_PATH = os.path.join(FIXTURE_DIR, "vit_trained.npz")
# ViT-Base-DIMENSION fixture (hidden 768 / 12 heads / 197 tokens):
# trained task oracle at the headline benchmark's scale. Weights are
# stored float16 (half the repo footprint; cast to f32 on load -- the
# committed f16 values stay the exact deterministic fixture).
BASE_WEIGHTS_PATH = os.path.join(FIXTURE_DIR, "vit_base_trained.npz")

N_CLASSES = 8
IMAGE_SIZE = 64
BASE_IMAGE_SIZE = 224

_COLORS = np.array([[1.0, 0.1, 0.1],    # R
                    [0.1, 1.0, 0.1],    # G
                    [0.2, 0.2, 1.0],    # B
                    [1.0, 0.9, 0.1]],   # Y
                   dtype=np.float32)


def fixture_config():
    from transformers import ViTConfig
    return ViTConfig(image_size=IMAGE_SIZE, patch_size=8, hidden_size=128,
                     num_attention_heads=4, intermediate_size=256,
                     num_hidden_layers=4, num_labels=N_CLASSES,
                     attn_implementation="eager")


def base_fixture_config():
    """TRUE ViT-Base dimensions (hidden 768, 12 heads, intermediate
    3072, patch 16 at 224 -> 197 tokens) with 2 encoder layers -- the
    shapes the headline bench runs, so the task-level capstone
    exercises the exact kernels/serving configuration
    (reference capstone: /root/reference/test/long_running/test_vit.py:112-167)."""
    from transformers import ViTConfig
    return ViTConfig(image_size=BASE_IMAGE_SIZE, patch_size=16,
                     hidden_size=768, num_attention_heads=12,
                     intermediate_size=3072, num_hidden_layers=2,
                     num_labels=N_CLASSES, attn_implementation="eager")


def make_batch(rng: np.random.Generator, n: int,
               image_size: int = IMAGE_SIZE):
    """n labelled grating images, NCHW float32 in [-1, 1]-ish range."""
    labels = rng.integers(0, N_CLASSES, size=n)
    yy, xx = np.mgrid[0:image_size, 0:image_size].astype(np.float32)
    images = np.empty((n, 3, image_size, image_size), np.float32)
    for i, lab in enumerate(labels):
        color = _COLORS[lab % 4]
        horizontal = (lab // 4) == 0
        freq = rng.uniform(0.3, 0.9)
        phase = rng.uniform(0, 2 * np.pi)
        coord = yy if horizontal else xx
        grating = np.sin(freq * coord + phase).astype(np.float32)
        img = color[:, None, None] * grating[None]
        img += rng.normal(scale=0.25, size=img.shape).astype(np.float32)
        images[i] = img
    return images, labels.astype(np.int64)


def _build_module(state: dict | None = None, config=None):
    import torch
    from transformers.models.vit.modeling_vit import ViTForImageClassification

    torch.manual_seed(0)
    module = ViTForImageClassification(config or fixture_config())
    if state is not None:
        module.load_state_dict(
            {k: torch.from_numpy(np.asarray(v, np.float32))
             for k, v in state.items()})
    return module


def trained_vit_module():
    """The committed trained ViT as a torch module."""
    state = dict(np.load(WEIGHTS_PATH))
    return _build_module(state).eval()


def trained_vit_onnx(batch_size=None):
    """ONNX graph of the committed trained ViT (our own builder)."""
    from .vit import vit_image_classifier
    return vit_image_classifier(module=trained_vit_module(),
                                batch_size=batch_size)


def trained_vit_base_module():
    """The committed trained ViT-Base-dims fixture as a torch module."""
    state = dict(np.load(BASE_WEIGHTS_PATH))
    return _build_module(state, config=base_fixture_config()).eval()


def trained_vit_base_onnx(batch_size=None):
    """ONNX graph of the committed ViT-Base-dims trained fixture."""
    from .vit import vit_image_classifier
    return vit_image_classifier(module=trained_vit_base_module(),
                                batch_size=batch_size)


def train_fixture(steps: int = 400, batch: int = 64, lr: float = 3e-4,
                  seed: int = 0, path: str = WEIGHTS_PATH, config=None,
                  image_size: int = IMAGE_SIZE,
                  weight_dtype=np.float32) -> float:
    """Train a fixture ViT on the grating task and write the weight
    file. Returns the final held-out accuracy."""
    import torch

    torch.manual_seed(seed)
    module = _build_module(config=config)
    module.train()
    opt = torch.optim.Adam(module.parameters(), lr=lr)
    rng = np.random.default_rng(seed)
    for step in range(steps):
        x, y = make_batch(rng, batch, image_size=image_size)
        logits = module(pixel_values=torch.from_numpy(x)).logits
        loss = torch.nn.functional.cross_entropy(
            logits, torch.from_numpy(y))
        opt.zero_grad()
        loss.backward()
        opt.step()
        if step % 20 == 0:
            acc = (logits.argmax(-1).numpy() == y).mean()
            print(f"step {step:4d}  loss {float(loss):.4f}  acc {acc:.2f}",
                  flush=True)
    module.eval()
    if weight_dtype != np.float32:
        # quantize the stored weights to the storage dtype FIRST, then
        # measure accuracy with exactly what will be committed
        state = {k: v.detach().numpy().astype(weight_dtype)
                 for k, v in module.state_dict().items()}
        module = _build_module(state, config=config).eval()
    xh, yh = make_batch(np.random.default_rng(seed + 1), 256,
                        image_size=image_size)
    with torch.no_grad():
        pred = module(pixel_values=torch.from_numpy(xh)).logits \
            .argmax(-1).numpy()
    acc = float((pred == yh).mean())
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **{k: v.detach().numpy().astype(weight_dtype)
                                 for k, v in module.state_dict().items()})
    print(f"held-out accuracy {acc:.3f}; wrote {path}")
    return acc


def train_base_fixture(steps: int = 180, batch: int = 32, lr: float = 1e-4,
                       seed: int = 0, path: str = BASE_WEIGHTS_PATH) -> float:
    """Train the ViT-Base-dims fixture (float16-stored weights)."""
    return train_fixture(steps=steps, batch=batch, lr=lr, seed=seed,
                         path=path, config=base_fixture_config(),
                         image_size=BASE_IMAGE_SIZE,
                         weight_dtype=np.float16)


if __name__ == "__main__":
    import sys
    if "--base" in sys.argv:
        train_base_fixture()
    else:
        train_fixture()

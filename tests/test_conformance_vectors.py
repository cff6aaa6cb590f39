"""The committed conformance vectors (conformance/) stay replayable
and in sync with their generator.

The vectors are this framework's exported QDQ/QOperator/dynamic-format
graphs plus expected outputs; extras/run_conformance.py replays them
on onnxruntime on any machine that has it (the reference's ground
truth, reference test/test_inference.py:87-101 -- not installable in
this environment, so that leg importorskips here).
"""
import importlib.util
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(script):
    spec = importlib.util.spec_from_file_location(
        script, os.path.join(REPO, "extras", f"{script}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[script] = mod
    spec.loader.exec_module(mod)
    return mod


RUN = _load("run_conformance")


def test_vectors_replay_on_executor():
    """Our executor reproduces every committed expected output within
    the vector's replay tolerance (the suite's x64 exact mode computes
    float segments at higher precision than the default x32 mode the
    vectors were generated under, so bit-equality is checked by the
    subprocess test below, not here)."""
    entries = RUN.load_manifest()
    assert len(entries) >= 13
    for entry in entries:
        rec = RUN.replay(entry, RUN._run_self)
        assert rec["ok"], rec


def test_generator_matches_committed_files(tmp_path):
    """Re-running the generator reproduces the committed vectors
    byte-for-byte (fixed seeds; keeps manifest, models, and arrays in
    lockstep with extras/make_conformance_vectors.py). Runs in a
    default-mode subprocess: the vectors are generated under the
    framework's default x32 numerics, not the suite's x64 exact mode."""
    import subprocess

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    result = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "extras", "make_conformance_vectors.py"),
         "--out", str(tmp_path)],
        env=env, capture_output=True, text=True, timeout=580)
    assert result.returncode == 0, result.stderr[-2000:]
    committed = sorted(os.listdir(RUN.VECTOR_DIR))
    fresh = sorted(os.listdir(tmp_path))
    assert committed == fresh
    for name in committed:
        with open(os.path.join(RUN.VECTOR_DIR, name), "rb") as f:
            want = f.read()
        with open(os.path.join(tmp_path, name), "rb") as f:
            got = f.read()
        if name.endswith(".npz"):
            # npz zip metadata embeds timestamps; compare the arrays
            a = np.load(os.path.join(RUN.VECTOR_DIR, name))
            b = np.load(os.path.join(tmp_path, name))
            assert sorted(a.files) == sorted(b.files)
            for k in a.files:
                np.testing.assert_array_equal(a[k], b[k])
        else:
            assert got == want, name


def test_vectors_replay_on_onnxruntime():
    """True third-party conformance -- runs wherever ORT exists."""
    pytest.importorskip("onnxruntime")
    for entry in RUN.load_manifest():
        rec = RUN.replay(entry, RUN._run_ort)
        assert rec["ok"], rec

#!/usr/bin/env python
"""Replay the committed conformance vectors (conformance/) on a real
third-party ONNX runtime -- the portable half of ROADMAP item 8.

    python extras/run_conformance.py                 # auto runtime
    python extras/run_conformance.py --runtime ort   # onnxruntime
    python extras/run_conformance.py --runtime self  # our executor

Runtime 'auto' prefers onnxruntime when importable (true third-party
conformance, the oracle the reference framework used:
reference test/test_inference.py:87-101) and falls back to this
framework's own executor (a drift guard, the only option in
environments without ORT -- tests/test_conformance_vectors.py runs
that leg in CI). Prints one JSON line per vector plus a summary line;
exits non-zero on any mismatch.
"""
import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
VECTOR_DIR = os.path.join(REPO, "conformance")


def load_manifest(vector_dir: str = VECTOR_DIR) -> list:
    with open(os.path.join(vector_dir, "manifest.json")) as f:
        return json.load(f)


def _run_self(model_path: str, inputs: dict, entry: dict) -> list:
    import numpy_quant_tpu as nq

    model = nq.Model.from_onnx(nq.onnx.load(model_path))
    return [np.asarray(a) for a in
            model([inputs[n] for n in entry["inputs"]])]


def _run_ort(model_path: str, inputs: dict, entry: dict) -> list:
    import onnxruntime as ort

    sess = ort.InferenceSession(model_path,
                                providers=["CPUExecutionProvider"])
    return sess.run(entry["outputs"],
                    {n: inputs[n] for n in entry["inputs"]})


def replay(entry: dict, runner, vector_dir: str = VECTOR_DIR) -> dict:
    """Run one manifest entry through ``runner``; returns the result
    record (ok, max_abs_err per output)."""
    arrays = np.load(os.path.join(vector_dir, entry["arrays"]))
    inputs = {n: arrays[n] for n in entry["inputs"]}
    got = runner(os.path.join(vector_dir, entry["model"]), inputs, entry)
    rec = {"name": entry["name"], "atol": entry["atol"], "outputs": {}}
    ok = True
    for name, arr in zip(entry["outputs"], got):
        want = arrays[f"expected::{name}"]
        err = float(np.abs(np.asarray(arr, np.float64)
                           - want.astype(np.float64)).max())
        rec["outputs"][name] = err
        ok = ok and err <= entry["atol"]
    rec["ok"] = ok
    return rec


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runtime", choices=["auto", "ort", "self"],
                    default="auto")
    ap.add_argument("--vectors", default=VECTOR_DIR)
    args = ap.parse_args(argv)

    runtime = args.runtime
    if runtime == "auto":
        try:
            import onnxruntime  # noqa: F401
            runtime = "ort"
        except ImportError:
            runtime = "self"
    runner = _run_ort if runtime == "ort" else _run_self

    failures = 0
    for entry in load_manifest(args.vectors):
        rec = replay(entry, runner, args.vectors)
        rec["runtime"] = runtime
        print(json.dumps(rec))
        failures += 0 if rec["ok"] else 1
    print(json.dumps({"runtime": runtime, "failed": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

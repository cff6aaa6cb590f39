"""Per-value parity harness.

TPU port of the reference's strongest test pattern: promote every
intermediate value to an output, run two executors, and compare each
tensor (reference: test/long_running/test_vit.py:27-58,
``compare_all_nodes``).
"""
from __future__ import annotations

import numpy as np


def record_all_values(model, inputs: list[np.ndarray]) -> dict[str, np.ndarray]:
    """Run the model eagerly and return {value name: ndarray} for every
    value in the graph (Variables and Constants)."""
    model(inputs, record=True)
    out = {}
    for value in model.values:
        if value.data is None:
            continue
        data = value.data
        arr = data.dequantize().data if hasattr(data, "dequantize") else data.data
        out[value.name] = np.asarray(arr)
    return out


def compare_all_values(actual: dict[str, np.ndarray],
                       desired: dict[str, np.ndarray],
                       decimal: int = 4, skip: tuple = ()) -> None:
    """Assert mean elementwise L1 ~= 0 for every shared value name
    (reference: test_vit.py:50-58 asserts decimal=4)."""
    shared = sorted(set(actual) & set(desired))
    assert shared, "no shared value names to compare"
    for name in shared:
        if name in skip:
            continue
        a, d = actual[name], desired[name]
        # broadcast-compare: spec-correct rank-0 Gather outputs vs the
        # reference's rank-preserving quirk (SURVEY.md §5.5) differ only
        # in rank, exactly as the reference's own harness tolerates.
        try:
            diff = a.astype(np.float64) - d.astype(np.float64)
        except ValueError:
            raise AssertionError(f"{name}: shape {a.shape} != {d.shape}")
        mean_l1 = np.mean(np.abs(diff))
        np.testing.assert_almost_equal(
            mean_l1, 0.0, decimal=decimal,
            err_msg=f"Mean elementwise l1 norm for {name}: {mean_l1}")

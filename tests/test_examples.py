"""The examples/ scripts stay runnable (subprocess, CPU)."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = sorted(
    f for f in os.listdir(os.path.join(REPO, "examples"))
    if f.endswith(".py"))


@pytest.mark.parametrize("script", EXAMPLES)
def test_example_runs(script):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script)],
        env=env, capture_output=True, text=True, timeout=600)
    assert result.returncode == 0, (script, result.stdout[-1000:],
                                    result.stderr[-2000:])

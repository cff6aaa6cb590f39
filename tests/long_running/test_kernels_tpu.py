"""Hardware tier: run the Pallas kernels on the REAL TPU and compare
against the exact integer oracles. Gated on NQ_RUN_TPU=1 (the fast
suite runs the same kernels in interpret mode on CPU, which misses
hardware-layout bugs -- the round-1 bit-plane padding corruption was
only visible on the chip).

The checks live in extras/hw_kernel_checks.py, which the driver also
runs per round to record the KERNELS_r{N}.json artifact. Runs in a
subprocess: tests/conftest.py pins the suite to the CPU platform before
any backend initializes, so the device run needs a fresh process with
the default (TPU) platform.
"""
import os
import subprocess
import sys

import pytest

tpu = pytest.mark.skipif(
    os.environ.get("NQ_RUN_TPU") != "1",
    reason="set NQ_RUN_TPU=1 (with a TPU attached) to run")

_REPO = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))


@tpu
def test_kernels_on_hardware():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # no virtual CPU devices; real chip
    script = os.path.join(_REPO, "extras", "hw_kernel_checks.py")
    result = subprocess.run([sys.executable, script], env=env,
                            capture_output=True, text=True, timeout=1800)
    assert result.returncode == 0 and "ALL_OK" in result.stdout, (
        result.stdout[-2000:], result.stderr[-3000:])

"""In-kernel PRNG dropout == bits-mode dropout (real TPU only).

Interpret mode stubs ``pltpu.prng_random_bits`` to zeros, so the exact
fwd/bwd stream-consistency property can only be pinned on hardware. The
check itself lives in tools/check_prng_dropout.py (emit the regenerated
byte streams -> feed the pinned bits-mode path -> require bit-equality of
value and every gradient); this test shells out to it so the suite stays
honest about hardware coverage: it SKIPS when no TPU is attached and
FAILS if the chip disagrees.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_prng_dropout_matches_bits_on_tpu():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS",)}
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "check_prng_dropout.py")],
        capture_output=True, text=True, timeout=560, env=env)
    if "requires the real TPU chip" in proc.stdout + proc.stderr:
        pytest.skip("no TPU attached")
    assert proc.returncode == 0, proc.stdout + proc.stderr[-2000:]
    assert "all exact" in proc.stdout

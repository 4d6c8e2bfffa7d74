"""Thin oracle parity check in the DEFAULT (not-slow) gate.

The full parity suite (tests/test_parity_oracle.py) is slow-marked; round 4
flagged that the default gate therefore never exercised the C++ oracle.
This one test keeps a lockstep trace in the smoke suite: TwoBlockDrop, 50
steps, ours-vs-reference position RMS — the cheapest trace that still
catches integrator/narrowphase/warmstart drift (3 bodies, contact onset at
~step 20).  The oracle binary is built once per machine into /tmp (g++ of
the reference core, ~1 min); warm runs reuse both it and the XLA
compilation cache, so the test costs seconds thereafter.
"""

import importlib.util
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE = "/tmp/avbd_oracle/ref_headless"

pytestmark = pytest.mark.skipif(
    not (os.path.isdir("/root/reference/source") and shutil.which("g++")),
    reason="reference sources or g++ unavailable",
)


def test_two_block_drop_smoke_trace():
    if not os.path.exists(ORACLE):
        subprocess.run(
            ["bash", os.path.join(REPO, "tools", "build_reference_oracle.sh")],
            check=True, capture_output=True,
        )
    spec = importlib.util.spec_from_file_location(
        "compare_with_reference",
        os.path.join(REPO, "tools", "compare_with_reference.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)

    tr = mod.run_trace("TwoBlockDrop", 50)
    rms = tr["rms"]
    assert rms[0] < 1e-4           # first step: integration-only, near-exact
    assert max(rms[:10]) < 0.02    # pre-chaos tracking
    assert max(rms) < 0.3          # bounded through contact onset
    assert max(tr["our_pen"]) < 0.02

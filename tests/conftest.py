"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-world analog of testing multi-node code without a cluster —
sharding/pjit paths compile and execute against 8 host devices, and the
physics itself is backend-agnostic jnp code.
"""

import os

# FORCE cpu (not setdefault): agent/driver shells export JAX_PLATFORMS=axon
# globally, and a flaky TPU tunnel then aborts the whole suite with
# "Unable to initialize backend 'axon'".  The suite is CPU-by-design.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

from avbd3d_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

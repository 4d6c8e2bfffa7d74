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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Disable the XLA:CPU fusion pass: it expands the optimized step HLO
# 2.4 MB -> 50 MB and LLVM then takes >50 MINUTES per cold step compile on
# a 1-core host (measured: the 8-device TwoBlockDrop batched step compiles
# in 42 s without fusion vs >50 min with).  Tests validate PHYSICS, not CPU
# execution speed; every backend-equivalence comparison runs both sides in
# this same process, so numerics stay internally consistent.  Opt out with
# AVBD3D_CPU_FUSION=1 (e.g. to time CPU execution).
if "xla_disable_hlo_passes" not in flags and not os.environ.get("AVBD3D_CPU_FUSION"):
    flags += " --xla_disable_hlo_passes=fusion"
os.environ["XLA_FLAGS"] = flags

from avbd3d_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

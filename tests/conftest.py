"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding logic is validated
on host-platform virtual devices (SURVEY.md §4 "Implication for the TPU
build").  Must set flags before jax initializes.
"""

import os

# Force CPU even when the session default is the TPU platform: sharding tests
# need 8 virtual devices, and CI must not depend on the tunnel being up.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# This box has a single CPU core: XLA compiles dominate test time, so use the
# persistent compilation cache (compiled executables survive across pytest
# runs) and always call jitted entry points in tests.
import jax

# The session-level axon (TPU) plugin ignores the env var, so force via config.
jax.config.update("jax_platforms", "cpu")
# The persistent compilation cache is DISABLED by default for the suite
# (r4): on this box `executable.serialize()` segfaults nondeterministically
# on large executables (ones with big baked-in constants — key material
# closed over in jitted test helpers), killing the whole pytest process
# mid-run; the crash moved between tests across runs
# (compilation_cache.put/get line 238/265 stacks).  Before that, the SHARED
# /tmp/jax_cache also crashed loads: processes attached to the remote TPU
# tunnel write CPU executables with the REMOTE host's machine features.
#
# r5 (VERDICT r4 next-step #7): re-enabled BY DEFAULT with two
# mitigations: a PER-XDIST-WORKER directory (no cross-process sharing at
# all) and a min-compile-time threshold so only the expensive executables
# are ever serialized (far fewer serialize() calls through the crashy
# path).  Validated r5: full suite cold 59 min / warm 37.5 min, 271
# passed, zero segfaults across both runs.  FHE_TEST_CACHE=0 opts out if
# the serialize() crash ever resurfaces.
if os.environ.get("FHE_TEST_CACHE", "1") == "1":
    worker = os.environ.get("PYTEST_XDIST_WORKER", "solo")
    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/jax_cache_test_{worker}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 3.0)
else:
    jax.config.update("jax_enable_compilation_cache", False)

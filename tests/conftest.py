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
# The persistent compilation cache is DISABLED for the suite (r4): on this
# box `executable.serialize()` segfaults nondeterministically on large
# executables (ones with big baked-in constants — key material closed over
# in jitted test helpers), killing the whole pytest process mid-run; the
# crash moved between tests across runs (compilation_cache.put/get line
# 238/265 stacks).  Before that, the SHARED /tmp/jax_cache also crashed
# loads: processes attached to the remote TPU tunnel write CPU executables
# with the REMOTE host's machine features.  Cold compiles cost ~5 extra
# minutes per run — a segfaulting suite costs everything.
jax.config.update("jax_enable_compilation_cache", False)

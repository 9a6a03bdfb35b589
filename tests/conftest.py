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
# CPU tests get their OWN cache dir: processes attached to the remote TPU
# tunnel write CPU executables into /tmp/jax_cache compiled with the REMOTE
# host's machine features (+prefer-no-scatter etc.), and loading those here
# segfaults (observed r4: SIGSEGV inside compilation_cache.get_executable).
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

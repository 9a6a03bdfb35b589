"""fhe_tpu — a TPU-native homomorphic-encryption (BGV/BFV) primitive library.

Brand-new JAX/Pallas implementation with the capabilities of the reference
CUDA library ``codebasecomprehension987/gpu-homomorphic-encryption``:
RNS modular arithmetic (30-bit primes in uint32 lanes replace the reference's
256-bit limbs + PTX carry chains), negacyclic NTT, RNS/CRT, and the full BFV
scheme (keygen, encode/encrypt, add/sub/plain ops, multiply + relinearize,
Galois rotations, modulus switching, bootstrapping key-switch), sharded over
TPU meshes with jax collectives.
"""

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # Some TPU platform plugins (e.g. the tunneled "axon" device) register
    # themselves regardless of JAX_PLATFORMS, silently overriding the
    # documented env-var semantics — a CPU-pinned CI subprocess then blocks
    # on TPU initialization.  Restore standard behavior: the env var wins.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])

from .params import SecurityParams, SchemeParams, make_scheme_params, default_params
from .api import FHE

__all__ = [
    "SecurityParams",
    "SchemeParams",
    "make_scheme_params",
    "default_params",
    "FHE",
]

__version__ = "0.1.0"

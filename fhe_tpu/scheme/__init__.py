"""BFV/BGV scheme layer: functional FHE context, keys/ciphertext pytrees, and the
full homomorphic op set (reference ``FHEContext``, ``include/fhe.cuh:78-148``)."""

from .types import Ciphertext, Plaintext, PublicKey, SecretKey, RelinKeys, GaloisKeys
from .context import SchemeContext, make_context
from . import bfv
from . import bgv
from . import bootstrap
from .encoder import BatchEncoder

__all__ = [
    "Ciphertext", "Plaintext", "PublicKey", "SecretKey", "RelinKeys",
    "GaloisKeys", "SchemeContext", "make_context", "bfv", "bgv", "bootstrap",
    "BatchEncoder",
]

"""BatchEncoder — SIMD slot packing via the mod-t negacyclic NTT.

Real implementation of the reference's stub ``BatchEncoder``
(``include/fhe.cuh:151-166``, ``src/fhe.cu:267-279`` — which just delegated to
coefficient encoding and was const-incorrect).  slot_count = n/2 with a
2 x (n/2) slot matrix; slot (r, j) holds the evaluation at zeta^(+-3^j) where
zeta is a primitive 2n-th root of unity mod t (docs/ARCHITECTURE.md:514-521).

The reference's own test expectations (slot-wise products, e.g.
``15 60 135 240`` at tests/test_fhe.cu:270) require slot semantics from the
default encode path, so ``FHE.encode`` (api.py) routes here; coefficient
encoding (reference src/fhe.cu:113-136) is available as encode_coeff.

Works for any prime t ≡ 1 (mod 2n) — the mod-t NTT tables come from the same
generic builder as the ciphertext-prime tables (default t = 65537 supports
batching up to n = 32768; e.g. t = 786433 = 3*2^18 + 1 covers n up to 2^17).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .. import oracle as _oracle
from ..ops import ntt as _ntt
from ..params import SchemeParams
from .types import Plaintext


@functools.lru_cache(maxsize=None)
def _slot_maps(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(encode_positions, decode_positions), both [n] — the SAME permutation:
    encode scatters slot j to evaluation position enc[j], decode gathers from
    the identical positions, so scatter-then-gather round-trips exactly
    (oracle.slot_orbit_indices is the spec)."""
    row0, row1 = _oracle.slot_orbit_indices(n)
    enc = np.array(row0 + row1, dtype=np.int32)      # slot j -> eval position
    return enc, enc


class BatchEncoder:
    """Slot encoder (jitted transforms, host-cached tables)."""

    def __init__(self, params: SchemeParams):
        self.params = params
        self.n = params.n
        self.t = params.t
        self.slot_count = params.slot_count  # reference: n/2 (src/fhe.cu:271)
        self._tb = _ntt.build_tables(self.n, (self.t,))
        enc, dec = _slot_maps(self.n)
        self._enc_pos = jnp.asarray(enc)
        self._dec_pos = jnp.asarray(dec)
        self._encode_j = jax.jit(self._encode_impl)
        self._decode_j = jax.jit(self._decode_impl)

    def _encode_impl(self, slots: jax.Array) -> jax.Array:
        evals = jnp.zeros((self.n,), jnp.uint32).at[self._enc_pos].set(slots)
        return _ntt.ntt_inverse(evals[None, None, :], self._tb)[0, 0]

    def _decode_impl(self, coeffs: jax.Array) -> jax.Array:
        evals = _ntt.ntt_forward(coeffs[None, None, :], self._tb)[0, 0]
        return jnp.take(evals, self._dec_pos)

    def encode(self, values) -> Plaintext:
        """values: up to n integers (row-major over the 2 x n/2 matrix).
        Negative values encode as their representative mod t (signed int64
        intermediate: uint64 would wrap -1 to 2^64-1 ≡ 1 mod 65537)."""
        vals = np.zeros(self.n, dtype=np.uint32)
        arr = np.asarray(values, dtype=np.int64) % self.t
        vals[: len(arr)] = arr.astype(np.uint32)
        return Plaintext(data=self._encode_j(jnp.asarray(vals)))

    def decode(self, pt: Plaintext) -> np.ndarray:
        """All n slot values as uint32."""
        return np.asarray(self._decode_j(pt.data))


def encode_coeff(params: SchemeParams, values) -> Plaintext:
    """Coefficient encoding (reference FHEContext::encode, src/fhe.cu:113-136):
    value i -> coefficient of x^i.  Multiplication then gives negacyclic
    convolution, not slot-wise products."""
    vals = np.zeros(params.n, dtype=np.uint32)
    arr = np.asarray(values, dtype=np.int64) % params.t
    vals[: len(arr)] = arr.astype(np.uint32)
    return Plaintext(data=jnp.asarray(vals))


def decode_coeff(params: SchemeParams, pt: Plaintext) -> np.ndarray:
    return np.asarray(pt.data)

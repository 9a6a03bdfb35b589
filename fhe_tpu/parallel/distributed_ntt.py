"""Distributed negacyclic NTT over coefficient blocks (shard_map + ppermute).

Scales polynomial degree n beyond one chip: the coefficient axis is block-
sharded over a ``coeff`` mesh axis of size P.  In the merged-psi CT stage
loop (ops/ntt.py), a stage with m groups pairs elements at stride
t = n/(2m):

  * stages m = 1 .. P/2  — the partner lives in another shard at the *same
    local offset*; each stage is one pairwise block exchange
    (``jax.lax.ppermute`` rides ICI neighbor links) + a full-width local
    butterfly.  log2(P) exchange stages total, each moving one block.
  * stages m = P .. n/2  — entirely shard-local; identical math to the
    single-chip engine with per-shard twiddle slices.

This is the TPU-native realization of the reference's *documented* multi-GPU
plan — "split coefficients across 4 GPUs, exchange butterfly pairs over
NVLink" (``docs/NTT_OPTIMIZATION.md:315-325``, ``docs/ARCHITECTURE.md:499-511``)
— which had no code.  The inverse transform mirrors it (local GS stages first,
then the exchange stages, then the n^-1 scale).

Bit-exact with ops/ntt.py on the gathered result (tests/test_parallel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import modmath as mm
from ..ops.ntt import NTTTables


def _pair_perm(P_: int, offset: int) -> list[tuple[int, int]]:
    """Full pairwise exchange permutation: s <-> s +- offset within groups."""
    perm = []
    for s in range(P_):
        pos = s % (2 * offset)
        partner = s + offset if pos < offset else s - offset
        perm.append((s, partner))
    return perm


def _local_slice(table: jax.Array, start, size: int) -> jax.Array:
    """[k, n] table -> [k, size] slice at traced start."""
    return lax.dynamic_slice_in_dim(table, start, size, axis=1)


def _fwd_local_stages(a, tb: NTTTables, n: int, m0: int, s):
    """CT stages m = m0 .. n/2 on a local [k, B, L] block of shard s."""
    k, b, L = a.shape
    p4 = tb.p[:, None, None, None]
    m = m0
    while m < n:
        t = n // (2 * m)
        g = (m * L) // n  # groups fully inside this shard
        w = _local_slice(tb.psi_br, m + s * g, g)[:, None, :, None]
        ws = _local_slice(tb.psi_br_shoup, m + s * g, g)[:, None, :, None]
        x = a.reshape(k, b, g, 2, t)
        u = x[:, :, :, 0, :]
        v = mm.mul_mod_shoup(x[:, :, :, 1, :], w, ws, p4)
        a = jnp.stack((mm.add_mod(u, v, p4), mm.sub_mod(u, v, p4)),
                      axis=3).reshape(k, b, L)
        m *= 2
    return a


def _inv_local_stages(a, tb: NTTTables, n: int, m_stop: int, s):
    """GS stages m = n/2 down to m_stop on a local [k, B, L] block."""
    k, b, L = a.shape
    p4 = tb.p[:, None, None, None]
    m = n // 2
    while m >= m_stop:
        t = n // (2 * m)
        g = (m * L) // n
        w = _local_slice(tb.ipsi_br, m + s * g, g)[:, None, :, None]
        ws = _local_slice(tb.ipsi_br_shoup, m + s * g, g)[:, None, :, None]
        x = a.reshape(k, b, g, 2, t)
        u = x[:, :, :, 0, :]
        v = x[:, :, :, 1, :]
        a = jnp.stack(
            (mm.add_mod(u, v, p4),
             mm.mul_mod_shoup(mm.sub_mod(u, v, p4), w, ws, p4)),
            axis=3,
        ).reshape(k, b, L)
        m //= 2
    return a


def _check_shards(num_shards: int):
    if num_shards & (num_shards - 1):
        raise ValueError(
            f"coeff axis size must be a power of two (got {num_shards}): "
            "cross-shard butterfly pairing assumes power-of-two strides")


def dist_ntt_forward(a_local, tb: NTTTables, n: int, num_shards: int,
                     axis: str = "coeff"):
    """shard_map body: forward NTT on block-sharded [k, B, n/P] residues."""
    _check_shards(num_shards)
    s = lax.axis_index(axis)
    p3 = tb.p[:, None, None]
    m = 1
    # cross-shard exchange stages
    while m <= num_shards // 2:
        offset = num_shards // (2 * m)
        group = s * m // num_shards                 # traced group index
        w = _local_slice(tb.psi_br, m + group, 1)[:, :, None]        # [k,1,1]
        ws = _local_slice(tb.psi_br_shoup, m + group, 1)[:, :, None]
        other = lax.ppermute(a_local, axis, _pair_perm(num_shards, offset))
        first = (s % (2 * offset)) < offset
        w_mine = mm.mul_mod_shoup(a_local, w, ws, p3)
        w_other = mm.mul_mod_shoup(other, w, ws, p3)
        a_local = jnp.where(
            first,
            mm.add_mod(a_local, w_other, p3),   # U + w*V  (I hold U)
            mm.sub_mod(other, w_mine, p3),      # U - w*V  (I hold V)
        )
        m *= 2
    # local stages
    return _fwd_local_stages(a_local, tb, n, m, s)


def dist_ntt_inverse(a_local, tb: NTTTables, n: int, num_shards: int,
                     axis: str = "coeff"):
    """shard_map body: inverse NTT on block-sharded [k, B, n/P] residues."""
    _check_shards(num_shards)
    s = lax.axis_index(axis)
    p3 = tb.p[:, None, None]
    # local GS stages first (m = n/2 .. P)
    a_local = _inv_local_stages(a_local, tb, n, num_shards, s)
    # cross-shard stages m = P/2 .. 1
    m = num_shards // 2
    while m >= 1:
        offset = num_shards // (2 * m)
        group = s * m // num_shards
        w = _local_slice(tb.ipsi_br, m + group, 1)[:, :, None]
        ws = _local_slice(tb.ipsi_br_shoup, m + group, 1)[:, :, None]
        other = lax.ppermute(a_local, axis, _pair_perm(num_shards, offset))
        first = (s % (2 * offset)) < offset
        # first: U' = U + V ; second: V' = (U - V) * w  (I hold V, other=U)
        summed = mm.add_mod(a_local, other, p3)
        diffed = mm.mul_mod_shoup(mm.sub_mod(other, a_local, p3), w, ws, p3)
        a_local = jnp.where(first, summed, diffed)
        m //= 2
    return mm.mul_mod_shoup(
        a_local, tb.n_inv[:, None, None], tb.n_inv_shoup[:, None, None], p3)


def make_distributed_polymul(mesh: Mesh, tb: NTTTables, n: int,
                             axis: str = "coeff"):
    """Jitted distributed negacyclic polymul over a coefficient-sharded mesh.

    Returns f(a, b) for [k, B, n] inputs sharded P(None, None, axis)."""
    num_shards = mesh.shape[axis]
    _check_shards(num_shards)
    spec = P(None, None, axis)
    rep = P()  # fully replicated (valid for every table leaf rank)

    def local_fn(a, b, tables):
        fa = dist_ntt_forward(a, tables, n, num_shards, axis)
        fb = dist_ntt_forward(b, tables, n, num_shards, axis)
        prod = mm.mul_mod_barrett(
            fa, fb, tables.p[:, None, None], tables.mu[:, None, None])
        return dist_ntt_inverse(prod, tables, n, num_shards, axis)

    shmapped = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(spec, spec, rep),  # tables replicated via in_specs
        out_specs=spec,
    )
    return jax.jit(functools.partial(_apply3, shmapped, tb))


def _apply3(f, tb, a, b):
    return f(a, b, tb)

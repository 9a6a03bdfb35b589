"""Fused Galois automorphism kernels (VMEM-resident, iota-derived tables).

The coefficient automorphism a(x) -> a(x^g) is a permutation with sign
flips: out[j] = +-in[h*j mod n], h = g^-1 mod 2n (reference rotate_rows
decl, /root/reference/include/fhe.cuh:113-116; the reference's CUDA kernel
never existed).  The r3 folded-affine factorization ran it as XLA ops
(one lane gather + sublane rolls); measured on v5e the XLA version is
HBM-bound on materialized roll/select intermediates (~8 us per element at
n=8192) and the gather alone costs ~4-15 us.  This kernel keeps everything
in VMEM and derives EVERY table in-kernel from broadcasted_iota plus the
static per-element h:

  * fold j = a*(R2*L2) + a2*L2 + l2 (R = R2 = 8, L2 = n/64 >= 128);
    src(j) = h*j mod n factors into
      1. a lane permutation  l2 -> h*l2 mod L2   (2D take_along_axis with
         an iota-built index: Mosaic lowers a dynamic 2D lane gather),
      2. masked sublane rolls by t_a2(l2) = (h*l2 mod L) // L2,
      3. the rho2 row shuffle a2 -> h*a2 mod R2 written as masked rolls
         (shift (h-1)*a2 mod R2 depends only on the row index),
      4/5. the same two steps one fold level up (t_a, rho on the R axis),
      6. negation where (h*j mod 2n) >= n, mask from the full-index iota.
  * every mask is recomputed from iota in-kernel — measured ~6x faster
    than loading per-stage mask rows from a VMEM table (see
    ops/ntt_pallas.py PALLAS PITFALL note).

Measured (v5e, n=8192, k=3): all-8-element epilogue ~1-3 us total vs
~63 us for the XLA two-level fold and ~160 us for the r3 single-level —
this is what finally makes hoisted rotations win at k=3.

Bit-exact with context.galois_permutation (tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
import jax.lax as lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import modmath as mm

_R = 8  # fold rows per level (sublane count)

_MAX_ELEMS = 16  # per-kernel element block: bounds BOTH the VMEM footprint
                 # (in+out blocks are C*B*n*4 bytes each; C_cts*E ~ 96 at
                 # n=8192 would overflow the ~16 MB budget) and the
                 # compile-time unroll (the kernel body statically unrolls
                 # one _apply_one per element).  Larger B splits into
                 # separate pallas_calls on VMEM-sized slices.


def _plan(n: int) -> tuple[int, int, int]:
    """(R, R2, L2) in-kernel fold for ring size n; R2 = 1 disables the
    second level (n < 8192 keeps L2 = n/8 >= 128 single-level)."""
    if n >= _R * _R * 128:
        return _R, _R, n // (_R * _R)
    assert n >= _R * 128, "pallas automorphism needs n >= 1024"
    return _R, 1, n // _R


def _apply_one(x, h: int, n: int, p, R: int, R2: int, L2: int):
    """Automorphism by static h on one element's [C, R, R2, L2] block."""
    sh = x.shape
    L = R2 * L2
    lane_ax = len(sh) - 1
    r2_ax = len(sh) - 2
    r_ax = len(sh) - 3
    l2 = lax.broadcasted_iota(jnp.int32, sh, lane_ax)
    # 1. lane permutation l2 -> h*l2 mod L2 (2D gather on merged rows)
    rows = 1
    for d in sh[:-1]:
        rows *= d
    x2 = x.reshape(rows, L2)
    idx2 = (h % L2) * lax.broadcasted_iota(jnp.int32, (rows, L2), 1) % L2
    y = jnp.take_along_axis(x2, idx2, axis=-1).reshape(sh)
    if R2 > 1:
        # 2. sublane rolls by t_a2(l2) = (h*l2 mod L) // L2
        ta2 = (h % L) * l2 % L // L2
        w = y
        for r in range(1, R2):
            w = jnp.where(ta2 == r, pltpu.roll(y, R2 - r, r2_ax), w)
        # 3. rho2: a2 -> h*a2 mod R2, as masked rolls keyed on the row index
        a2 = lax.broadcasted_iota(jnp.int32, sh, r2_ax)
        sh2 = (h - 1) * a2 % R2
        z = w
        for r in range(1, R2):
            z = jnp.where(sh2 == r, pltpu.roll(w, R2 - r, r2_ax), z)
        lfull = lax.broadcasted_iota(jnp.int32, sh, r2_ax) * L2 + l2
    else:
        z = y
        a2 = jnp.zeros(sh, jnp.int32)
        lfull = l2
    # 4. level-1 rolls by t_a(l) = (h*l mod n) // L
    ta = (h % n) * lfull % n // L
    w1 = z
    for r in range(1, R):
        w1 = jnp.where(ta == r, pltpu.roll(z, R - r, r_ax), w1)
    # 5. rho: a -> h*a mod R
    a1 = lax.broadcasted_iota(jnp.int32, sh, r_ax)
    sh1 = (h - 1) * a1 % R
    z1 = w1
    for r in range(1, R):
        z1 = jnp.where(sh1 == r, pltpu.roll(w1, R - r, r_ax), z1)
    # 6. negate where h*j mod 2n lands in the upper half (x^n = -1 wrap)
    j = (a1 * R2 + a2) * L2 + l2
    negm = (h * j) // n % 2 == 1
    return jnp.where(negm, mm.neg_mod(z1, p), z1)


def _auto_kernel(p_ref, x_ref, o_ref, *, hs, n, R, R2, L2):
    i = pl.program_id(0)
    p = p_ref[i, 0]
    x = x_ref[0]                            # [C, B, R, R2, L2]
    for b, h in enumerate(hs):
        o_ref[0, :, b] = _apply_one(x[:, b], h, n, p, R, R2, L2)


def _auto_kernel_c0(p_ref, x_ref, c0_ref, o_ref, *, hs, n, R, R2, L2):
    i = pl.program_id(0)
    p = p_ref[i, 0]
    x = x_ref[0]                            # [C, B, R, R2, L2]
    c0 = c0_ref[0]                          # [1, R, R2, L2]
    x = jnp.concatenate([mm.add_mod(x[:1], c0[:, None], p), x[1:]], axis=0)
    for b, h in enumerate(hs):
        o_ref[0, :, b] = _apply_one(x[:, b], h, n, p, R, R2, L2)


def _auto_kernel_c0b(p_ref, x_ref, c0_ref, o_ref, *, hs, n, R, R2, L2):
    """Per-element c0 variant (multi-ciphertext hoisted epilogue: element b
    belongs to ciphertext b // E and adds THAT ciphertext's c0)."""
    i = pl.program_id(0)
    p = p_ref[i, 0]
    x = x_ref[0]                            # [C, B, R, R2, L2]
    c0 = c0_ref[0]                          # [B, R, R2, L2]
    x = jnp.concatenate([mm.add_mod(x[:1], c0[None], p), x[1:]], axis=0)
    for b, h in enumerate(hs):
        o_ref[0, :, b] = _apply_one(x[:, b], h, n, p, R, R2, L2)


def _auto_kernel_c0_sum(p_ref, x_ref, c0_ref, base_ref, o_ref,
                        *, hs, n, R, R2, L2):
    """Accumulating epilogue: out = base + sum_b phi_{hs[b]}(x_b with c0
    added to component 0) — the sum_slots stage (acc + rot_s + rot_2s +
    rot_3s) without materializing B rotated ciphertexts through HBM."""
    i = pl.program_id(0)
    p = p_ref[i, 0]
    x = x_ref[0]                            # [C, B, R, R2, L2]
    c0 = c0_ref[0]                          # [1, R, R2, L2]
    base = base_ref[0]                      # [C, R, R2, L2]
    x = jnp.concatenate([mm.add_mod(x[:1], c0[:, None], p), x[1:]], axis=0)
    acc = base
    for b, h in enumerate(hs):
        acc = mm.add_mod(acc, _apply_one(x[:, b], h, n, p, R, R2, L2), p)
    o_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("hs", "interpret"))
def automorphism_fused(x: jax.Array, hs: tuple[int, ...], p: jax.Array,
                       c0: jax.Array | None = None,
                       interpret: bool = False) -> jax.Array:
    """Per-element coefficient automorphisms, one VMEM kernel pass.

    x:  [k, C, B, n] residues; element b gets the automorphism with the
        STATIC multiplier hs[b] (h = g^-1 mod 2n -> out[j] = +-x[h*j mod n])
    c0: optional [k, n] poly added (mod p) to component 0 of EVERY element
        before the permutation — the hoisted-rotation epilogue's c0 + delta0
        — or [k, B, n] for a PER-ELEMENT c0 (multi-ciphertext hoisting)
    p:  [k] (or [k, 1]) primes
    Returns [k, C, B, n]."""
    k, C, B, n = x.shape
    assert len(hs) == B
    if B > _MAX_ELEMS:
        outs = []
        for b0 in range(0, B, _MAX_ELEMS):
            b1 = min(b0 + _MAX_ELEMS, B)
            c0c = c0 if (c0 is None or c0.ndim == 2) else c0[:, b0:b1]
            outs.append(automorphism_fused(
                x[:, :, b0:b1], hs[b0:b1], p, c0c, interpret=interpret))
        return jnp.concatenate(outs, axis=2)
    R, R2, L2 = _plan(n)
    xf = x.reshape(k, C, B, R, R2, L2)
    p2 = p.reshape(k, 1).astype(jnp.uint32)
    blk_in = pl.BlockSpec((1, C, B, R, R2, L2),
                          lambda i: (i, 0, 0, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    blk_out = pl.BlockSpec((1, C, B, R, R2, L2),
                           lambda i: (i, 0, 0, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    hs_i = tuple(int(h) for h in hs)
    if c0 is None:
        return pl.pallas_call(
            functools.partial(_auto_kernel, hs=hs_i, n=n, R=R, R2=R2, L2=L2),
            grid=(k,),
            in_specs=[smem, blk_in],
            out_specs=blk_out,
            out_shape=jax.ShapeDtypeStruct((k, C, B, R, R2, L2), jnp.uint32),
            interpret=interpret,
        )(p2, xf).reshape(k, C, B, n)
    if c0.ndim == 3:                       # [k, B, n]: per-element c0
        assert c0.shape == (k, B, n)
        c0f = c0.reshape(k, B, R, R2, L2)
        blk_c0 = pl.BlockSpec((1, B, R, R2, L2), lambda i: (i, 0, 0, 0, 0),
                              memory_space=pltpu.VMEM)
        kern = functools.partial(
            _auto_kernel_c0b, hs=hs_i, n=n, R=R, R2=R2, L2=L2)
    else:
        c0f = c0.reshape(k, 1, R, R2, L2)
        blk_c0 = pl.BlockSpec((1, 1, R, R2, L2), lambda i: (i, 0, 0, 0, 0),
                              memory_space=pltpu.VMEM)
        kern = functools.partial(
            _auto_kernel_c0, hs=hs_i, n=n, R=R, R2=R2, L2=L2)
    return pl.pallas_call(
        kern,
        grid=(k,),
        in_specs=[smem, blk_in, blk_c0],
        out_specs=blk_out,
        out_shape=jax.ShapeDtypeStruct((k, C, B, R, R2, L2), jnp.uint32),
        interpret=interpret,
    )(p2, xf, c0f).reshape(k, C, B, n)


@functools.partial(jax.jit, static_argnames=("hs", "interpret"))
def automorphism_fused_sum(x: jax.Array, hs: tuple[int, ...], p: jax.Array,
                           c0: jax.Array, base: jax.Array,
                           interpret: bool = False) -> jax.Array:
    """base + sum_b phi_{hs[b]}((x_b0 + c0, x_b1)) in one VMEM pass.

    x:    [k, C, B, n] key-switch deltas per element
    c0:   [k, n] added to component 0 of every element pre-permutation
    base: [k, C, n] accumulated into the output (the un-rotated ct)
    Returns [k, C, n] — the hoisted rotate-and-accumulate stage
    (sum_slots) with no per-element HBM materialization."""
    k, C, B, n = x.shape
    assert len(hs) == B
    if B > _MAX_ELEMS:
        out = automorphism_fused_sum(
            x[:, :, :_MAX_ELEMS], hs[:_MAX_ELEMS], p, c0, base,
            interpret=interpret)
        return automorphism_fused_sum(
            x[:, :, _MAX_ELEMS:], hs[_MAX_ELEMS:], p, c0, out,
            interpret=interpret)
    R, R2, L2 = _plan(n)
    xf = x.reshape(k, C, B, R, R2, L2)
    c0f = c0.reshape(k, 1, R, R2, L2)
    basef = base.reshape(k, C, R, R2, L2)
    p2 = p.reshape(k, 1).astype(jnp.uint32)
    blk_in = pl.BlockSpec((1, C, B, R, R2, L2),
                          lambda i: (i, 0, 0, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    blk_c0 = pl.BlockSpec((1, 1, R, R2, L2), lambda i: (i, 0, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    blk_base = pl.BlockSpec((1, C, R, R2, L2), lambda i: (i, 0, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    hs_i = tuple(int(h) for h in hs)
    return pl.pallas_call(
        functools.partial(
            _auto_kernel_c0_sum, hs=hs_i, n=n, R=R, R2=R2, L2=L2),
        grid=(k,),
        in_specs=[smem, blk_in, blk_c0, blk_base],
        out_specs=blk_base,
        out_shape=jax.ShapeDtypeStruct((k, C, R, R2, L2), jnp.uint32),
        interpret=interpret,
    )(p2, xf, c0f, basef).reshape(k, C, n)


def automorphism_single(x: jax.Array, g: int, n2: int, p: jax.Array,
                        interpret: bool = False) -> jax.Array:
    """phi_g on [k, C, n] data (plain apply_galois / batch helper);
    n2 = 2 * ring degree.  h is derived from the Galois element here so
    callers keep passing g."""
    k, C, n = x.shape
    h = pow(int(g), -1, n2)
    out = automorphism_fused(x[:, :, None, :].reshape(k, C, 1, n), (h,), p,
                             interpret=interpret)
    return out.reshape(k, C, n)

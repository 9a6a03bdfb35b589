"""Fused Pallas kernels for the BEHZ base conversions.

The jnp conversions (ops/rns.py) lower to ~8-15 separate XLA passes each
(digit scale, the [l, k, B, n] term tensor, the add tree, the correction
lanes) — every pass a full HBM round trip.  Each conversion is local per
DESTINATION row given the full source block (k rows, a few hundred KB), so
one pallas_call with the grid over dst primes keeps everything in VMEM:
step j recomputes the (cheap) source digits and accumulates its own row.

Three kernels cover the BEHZ multiply's conversion steps (SURVEY §3.4):
  * sm_mrq_fused       — exact centered lift q -> Bsk (m_tilde correction)
  * fast_floor_fused   — floor(t*x/q) - alpha in Bsk (conv + sub + scale)
  * fast_bconv_sk_fused— exact Shenoy-Kumaresan Bsk -> q

Each is bit-exact with its ops/rns.py counterpart (tests/test_pallas.py)
and dispatched from scheme/bfv.py on Pallas contexts.

r3 measured verdict (flat layout): fused 83.1 us vs jnp 84.5 us full
multiply — a WASH (XLA auto-fuses these memory-bound elementwise trees
well; the kernels traded multi-pass HBM traffic for per-dst-row digit
recompute plus launches).  r4 changed both halves of that tradeoff:

  * the wrappers now FOLD the lane axis to [k, B, 8, n/8] at n >= 1024 —
    the B = 2-4 row blocks only filled 2-4 of the VPU's 8 sublanes, so the
    elementwise trees ran at <= half utilization;
  * bsk_branch_fused merges SmMRq + the Bsk tensor product (t-scale folded
    into the inverse normalization) + FastFloor into ONE kernel per Bsk
    prime, so the lift and tx_bsk tensors never exist in HBM at all.

"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import modmath as mm
from .rns import FastFloorConsts, SKConsts, SmMRqConsts

_U = np.uint32
_MASK16 = np.uint32(0xFFFF)

# Sublane folding (r4): the conversions are pure elementwise trees over
# [k, B, n] blocks whose B = 2-4 rows leave 4-6 of the VPU's 8 sublanes
# idle.  Folding the lane axis to [k, B, 8, n/8] fills them — the kernel
# bodies are rank-generic, so only the wrappers reshape (n >= 1024 keeps
# the folded lane dim >= 128 for Mosaic).
_FOLD_ROWS = 8


def _fold_n(x: jax.Array):
    """[..., n] -> [..., 8, n/8] when foldable, else unchanged."""
    n = x.shape[-1]
    if n >= _FOLD_ROWS * 128 and n % (_FOLD_ROWS * 128) == 0:
        return x.reshape(*x.shape[:-1], _FOLD_ROWS, n // _FOLD_ROWS)
    return x


def _digits(x, inv, inv_sh, p_src):
    """y_i = [x_i * inv_i]_{p_i} rows inside the kernel: x [k, B, n]."""
    k = x.shape[0]
    return [mm.mul_mod_shoup(x[i], inv[i, 0], inv_sh[i, 0], p_src[i, 0])
            for i in range(k)]


def _accum(ys, w_ref, wsh_ref, j, c):
    """sum_i y_i * w[j, i] mod c with a pairwise tree (log depth)."""
    terms = [mm.mul_mod_shoup(y, w_ref[j, i], wsh_ref[j, i], c)
             for i, y in enumerate(ys)]
    while len(terms) > 1:
        nxt = [mm.add_mod(terms[m], terms[m + 1], c)
               for m in range(0, len(terms) - 1, 2)]
        if len(terms) % 2:
            nxt.append(terms[-1])
        terms = nxt
    return terms[0]


def _smq_kernel(psrc_ref, inv_ref, invsh_ref, phat_ref, phatsh_ref,
                pmt_ref, pdst_ref, qmod_ref, qmodsh_ref, invmt_ref,
                invmtsh_ref, sc_ref, x_ref, o_ref):
    j = pl.program_id(0)
    c = pdst_ref[j, 0]
    ys = _digits(x_ref[...], inv_ref, invsh_ref, psrc_ref)
    conv = _accum(ys, phat_ref, phatsh_ref, j, c)
    # m_tilde lane: mod-2^16 accumulate + alpha, centered
    amt = jnp.zeros_like(ys[0])
    for i, y in enumerate(ys):
        amt = (amt + (y & _MASK16) * pmt_ref[i, 0]) & _MASK16
    alpha = (amt * sc_ref[0, 0]) & _MASK16            # inv_q_mt
    alpha_mod = jnp.where(alpha < _U(1 << 15), alpha,
                          c - (_U(1 << 16) - alpha))
    aq = mm.mul_mod_shoup(alpha_mod, qmod_ref[j, 0], qmodsh_ref[j, 0], c)
    centered = mm.sub_mod(conv, aq, c)
    o_ref[...] = mm.mul_mod_shoup(
        centered, invmt_ref[j, 0], invmtsh_ref[j, 0], c)[None]


@functools.partial(jax.jit, static_argnames=("interpret",))
def sm_mrq_fused(x: jax.Array, sc: SmMRqConsts,
                 interpret: bool = False) -> jax.Array:
    """[k, B, n] residues in q -> centered lift in Bsk [l, B, n], ONE
    kernel (grid over Bsk rows).  Bit-exact with rns.sm_mrq."""
    k, B, n = x.shape
    cc = sc.conv
    l = cc.p_dst.shape[0]
    xf = _fold_n(x)
    tail = xf.shape[1:]
    zeros = (0,) * len(tail)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    xin = pl.BlockSpec((k, *tail), lambda j: (0, *zeros),
                       memory_space=pltpu.VMEM)
    dout = pl.BlockSpec((1, *tail), lambda j: (j, *zeros),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _smq_kernel,
        grid=(l,),
        in_specs=[smem] * 12 + [xin],
        out_specs=dout,
        out_shape=jax.ShapeDtypeStruct((l, *tail), jnp.uint32),
        interpret=interpret,
    )(cc.p_src[:, None], sc.mt_times_inv_phat[:, None],
      sc.mt_times_inv_phat_shoup[:, None], cc.phat_mod_dst,
      cc.phat_shoup_dst, sc.phat_mod_mt[:, None], cc.p_dst[:, None],
      sc.q_mod_dst[:, None], sc.q_shoup_dst[:, None],
      sc.inv_mt_dst[:, None], sc.inv_mt_shoup_dst[:, None],
      sc.inv_q_mt[None, None], xf).reshape(l, B, n)


def _floor_kernel(psrc_ref, inv_ref, invsh_ref, phat_ref, phatsh_ref,
                  pdst_ref, invq_ref, invqsh_ref, txq_ref, txb_ref, o_ref):
    j = pl.program_id(0)
    c = pdst_ref[j, 0]
    ys = _digits(txq_ref[...], inv_ref, invsh_ref, psrc_ref)
    conv = _accum(ys, phat_ref, phatsh_ref, j, c)
    diff = mm.sub_mod(txb_ref[0], conv, c)
    o_ref[...] = mm.mul_mod_shoup(
        diff, invq_ref[j, 0], invqsh_ref[j, 0], c)[None]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fast_floor_fused(tx_q: jax.Array, tx_bsk: jax.Array,
                     fc: FastFloorConsts,
                     interpret: bool = False) -> jax.Array:
    """floor(t*x/q) - alpha in Bsk, ONE kernel.  Bit-exact with
    rns.fast_floor."""
    k, B, n = tx_q.shape
    cc = fc.conv
    l = cc.p_dst.shape[0]
    assert tx_bsk.shape == (l, B, n)
    xq = _fold_n(tx_q)
    xb = _fold_n(tx_bsk)
    tail = xq.shape[1:]
    zeros = (0,) * len(tail)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    xin = pl.BlockSpec((k, *tail), lambda j: (0, *zeros),
                       memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, *tail), lambda j: (j, *zeros),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _floor_kernel,
        grid=(l,),
        in_specs=[smem] * 8 + [xin, row],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((l, *tail), jnp.uint32),
        interpret=interpret,
    )(cc.p_src[:, None], cc.inv_phat[:, None], cc.inv_phat_shoup[:, None],
      cc.phat_mod_dst, cc.phat_shoup_dst, cc.p_dst[:, None],
      fc.inv_q_dst[:, None], fc.inv_q_shoup_dst[:, None],
      xq, xb).reshape(l, B, n)


def _sk_kernel(paux_ref, inv_ref, invsh_ref, phat_ref, phatsh_ref,
               phsk_ref, phsksh_ref, pdst_ref, bmod_ref, bmodsh_ref,
               sc_ref, xaux_ref, xmsk_ref, o_ref):
    j = pl.program_id(0)
    c = pdst_ref[j, 0]
    m_sk = sc_ref[0, 0]
    inv_b = sc_ref[0, 1]
    inv_b_sh = sc_ref[0, 2]
    ys = _digits(xaux_ref[...], inv_ref, invsh_ref, paux_ref)
    conv_q = _accum(ys, phat_ref, phatsh_ref, j, c)
    # m_sk lane (row 0 of the [1, l] conv_sk tables) + centered alpha
    terms = [mm.mul_mod_shoup(y, phsk_ref[0, i], phsksh_ref[0, i], m_sk)
             for i, y in enumerate(ys)]
    while len(terms) > 1:
        nxt = [mm.add_mod(terms[m], terms[m + 1], m_sk)
               for m in range(0, len(terms) - 1, 2)]
        if len(terms) % 2:
            nxt.append(terms[-1])
        terms = nxt
    alpha = mm.mul_mod_shoup(
        mm.sub_mod(terms[0], xmsk_ref[0], m_sk), inv_b, inv_b_sh, m_sk)
    half = m_sk >> 1
    alpha_mod = jnp.where(alpha <= half, alpha, c - (m_sk - alpha))
    aB = mm.mul_mod_shoup(alpha_mod, bmod_ref[j, 0], bmodsh_ref[j, 0], c)
    o_ref[...] = mm.sub_mod(conv_q, aB, c)[None]


def _bsk_branch_kernel(psrc_ref, mtinv_ref, mtinvsh_ref, sphat_ref,
                       sphatsh_ref, pmt_ref, pdst_ref, qmod_ref, qmodsh_ref,
                       invmt_ref, invmtsh_ref, scmt_ref,
                       finv_ref, finvsh_ref, fphat_ref, fphatsh_ref,
                       invq_ref, invqsh_ref, mu_ref, ninv_ref, ninvsh_ref,
                       fw_ref, fwsh_ref, iw_ref, iwsh_ref,
                       ab_ref, txq_ref, o_ref):
    """One Bsk prime's ENTIRE multiply branch in one VMEM pass:
    SmMRq lift of both operands -> forward NTT -> tensor product ->
    inverse NTT with the t-scale folded into the normalization ->
    FastFloor.  ab [k, 4, 8, L] (a|b residues), txq [k, 3, 8, L]
    (t-scaled q-base tensor product), output floored row j [1, 3, 8, L]."""
    j = pl.program_id(0)
    c = pdst_ref[j, 0]
    mu_c = mu_ref[j, 0]
    L = ab_ref.shape[-1]
    n = 8 * L
    ab = ab_ref[...]                                     # [k, 4, 8, L]
    # ---- SmMRq lift at prime j (see _smq_kernel) ----
    ys = _digits(ab, mtinv_ref, mtinvsh_ref, psrc_ref)
    conv = _accum(ys, sphat_ref, sphatsh_ref, j, c)      # [4, 8, L]
    amt = jnp.zeros_like(ys[0])
    for i, y in enumerate(ys):
        amt = (amt + (y & _MASK16) * pmt_ref[i, 0]) & _MASK16
    alpha = (amt * scmt_ref[0, 0]) & _MASK16
    alpha_mod = jnp.where(alpha < _U(1 << 15), alpha,
                          c - (_U(1 << 16) - alpha))
    aq = mm.mul_mod_shoup(alpha_mod, qmod_ref[j, 0], qmodsh_ref[j, 0], c)
    lift = mm.mul_mod_shoup(
        mm.sub_mod(conv, aq, c), invmt_ref[j, 0], invmtsh_ref[j, 0], c)
    # ---- tensor product at prime j (t folded into the inverse tables) ----
    from . import ntt_pallas as _npal
    wf = lambda s: (fw_ref[0, s][None], fwsh_ref[0, s][None])
    wi = lambda s: (iw_ref[0, s][None], iwsh_ref[0, s][None])
    f = _npal._fwd_sweep_folded_lazy(lift, wf, c, n)     # [4, 8, L]
    a0, a1, b0, b1 = f[0:1], f[1:2], f[2:3], f[3:4]
    c0 = mm.mul_mod_barrett(a0, b0, c, mu_c)
    c2 = mm.mul_mod_barrett(a1, b1, c, mu_c)
    c1 = mm.add_mod(mm.mul_mod_barrett(a0, b1, c, mu_c),
                    mm.mul_mod_barrett(a1, b0, c, mu_c), c)
    prod = jnp.concatenate([c0, c1, c2], axis=0)         # [3, 8, L]
    txb = _npal._inv_sweep_folded_lazy(
        prod, wi, ninv_ref[j, 0], ninvsh_ref[j, 0], c, n)
    # ---- FastFloor at prime j (see _floor_kernel) ----
    ys2 = _digits(txq_ref[...], finv_ref, finvsh_ref, psrc_ref)
    conv2 = _accum(ys2, fphat_ref, fphatsh_ref, j, c)
    o_ref[...] = mm.mul_mod_shoup(
        mm.sub_mod(txb, conv2, c), invq_ref[j, 0], invqsh_ref[j, 0],
        c)[None]


@functools.partial(jax.jit, static_argnames=("interpret",))
def bsk_branch_fused(ab: jax.Array, tx_q: jax.Array, sc: SmMRqConsts,
                     fc: FastFloorConsts, pt_bsk,
                     interpret: bool = False) -> jax.Array:
    """The multiply's whole Bsk branch, ONE kernel per Bsk prime (r4):
    replaces sm_mrq_fused + tensor_product(bsk) + fast_floor_fused —
    the lift and tx_bsk tensors never touch HBM.

    ab   [k, 4, n]  concat of both operands' residues (a | b)
    tx_q [k, 3, n]  t-scaled q-base tensor product (tensor_product(tq_pl))
    pt_bsk          t-folded Bsk Pallas tables (context.ntt_mul_pl_levels)
    Returns floored [kb, 3, n]; bit-exact with the composed three-kernel
    path (tests/test_pallas.py).  Requires n >= 1024 (folded layout)."""
    k, four, n = ab.shape
    assert four == 4 and tx_q.shape == (k, 3, n)
    assert n >= 1024 and n % 1024 == 0
    cc = sc.conv
    kb = cc.p_dst.shape[0]
    s = pt_bsk.fwd_w.shape[1]
    L = n // 8
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    tablef = pl.BlockSpec((1, s, 8, L), lambda j: (j, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    ab_in = pl.BlockSpec((k, 4, 8, L), lambda j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    txq_in = pl.BlockSpec((k, 3, 8, L), lambda j: (0, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    dout = pl.BlockSpec((1, 3, 8, L), lambda j: (j, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bsk_branch_kernel,
        grid=(kb,),
        in_specs=[smem] * 21 + [tablef] * 4 + [ab_in, txq_in],
        out_specs=dout,
        out_shape=jax.ShapeDtypeStruct((kb, 3, 8, L), jnp.uint32),
        interpret=interpret,
    )(cc.p_src[:, None], sc.mt_times_inv_phat[:, None],
      sc.mt_times_inv_phat_shoup[:, None], cc.phat_mod_dst,
      cc.phat_shoup_dst, sc.phat_mod_mt[:, None], cc.p_dst[:, None],
      sc.q_mod_dst[:, None], sc.q_shoup_dst[:, None],
      sc.inv_mt_dst[:, None], sc.inv_mt_shoup_dst[:, None],
      sc.inv_q_mt[None, None],
      fc.conv.inv_phat[:, None], fc.conv.inv_phat_shoup[:, None],
      fc.conv.phat_mod_dst, fc.conv.phat_shoup_dst,
      fc.inv_q_dst[:, None], fc.inv_q_shoup_dst[:, None],
      pt_bsk.mu, pt_bsk.n_inv, pt_bsk.n_inv_shoup,
      pt_bsk.fwd_w.reshape(kb, s, 8, L),
      pt_bsk.fwd_w_sh.reshape(kb, s, 8, L),
      pt_bsk.inv_w.reshape(kb, s, 8, L),
      pt_bsk.inv_w_sh.reshape(kb, s, 8, L),
      ab.reshape(k, 4, 8, L), tx_q.reshape(k, 3, 8, L)).reshape(kb, 3, n)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fast_bconv_sk_fused(x_bsk: jax.Array, sk: SKConsts,
                        interpret: bool = False) -> jax.Array:
    """Exact Shenoy-Kumaresan Bsk -> q, ONE kernel (grid over q rows).
    Bit-exact with rns.fast_bconv_sk."""
    lp1, B, n = x_bsk.shape
    l = lp1 - 1
    kq = sk.conv_q.p_dst.shape[0]
    xf = _fold_n(x_bsk)
    tail = xf.shape[1:]
    zeros = (0,) * len(tail)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    xin = pl.BlockSpec((l, *tail), lambda j: (0, *zeros),
                       memory_space=pltpu.VMEM)
    mrow = pl.BlockSpec((1, *tail), lambda j: (0, *zeros),
                        memory_space=pltpu.VMEM)
    dout = pl.BlockSpec((1, *tail), lambda j: (j, *zeros),
                        memory_space=pltpu.VMEM)
    scalars = jnp.stack([sk.m_sk, sk.inv_B_sk,
                         sk.inv_B_sk_shoup]).astype(jnp.uint32)[None]
    return pl.pallas_call(
        _sk_kernel,
        grid=(kq,),
        in_specs=[smem] * 11 + [xin, mrow],
        out_specs=dout,
        out_shape=jax.ShapeDtypeStruct((kq, *tail), jnp.uint32),
        interpret=interpret,
    )(sk.conv_q.p_src[:, None], sk.conv_q.inv_phat[:, None],
      sk.conv_q.inv_phat_shoup[:, None], sk.conv_q.phat_mod_dst,
      sk.conv_q.phat_shoup_dst, sk.conv_sk.phat_mod_dst,
      sk.conv_sk.phat_shoup_dst, sk.conv_q.p_dst[:, None],
      sk.B_mod_q[:, None], sk.B_shoup_q[:, None], scalars,
      xf[:-1], xf[-1:]).reshape(kq, B, n)

"""Microbenchmark kernels: compute-roofline probes that stay in VMEM.

The r2 modmul roofline chained a 25 MB tensor through a fori_loop of XLA
fusions — every link paid a full HBM read+write, so the "measured" rate was
bounded by (and its artifact numbers occasionally exceeded, i.e. mismeasured)
HBM bandwidth, not the VPU.  The NTT inner loops this number stands for run
in VMEM (ops/ntt_pallas.py), so the honest probe must too: one pallas_call
whose kernel applies `reps` back-to-back Shoup modmuls to a VMEM-resident
block.  Slope over `reps` cancels the launch cost exactly and no HBM traffic
scales with reps.

Bit-exact with the composed jnp chain (tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import modmath as mm


def _chain_kernel(sc_ref, x_ref, o_ref, *, reps, variant, unroll=1, ilp=1):
    w = sc_ref[0, 0]
    ws = sc_ref[0, 1]
    p = sc_ref[0, 2]

    if variant == "exact":
        step = lambda v: mm.mul_mod_shoup(v, w, ws, p)
    elif variant == "lazy":
        # Harvey lazy form: output in [0, 2p), valid input for the next link
        # (the Shoup quotient bound holds for ANY u32 operand)
        step = lambda v: mm.mul_mod_shoup_lazy(v, w, ws, p)
    elif variant == "barrett":
        mu = sc_ref[0, 3]
        step = lambda v: mm.mul_mod_barrett(v, w, p, mu)
    elif variant == "cheap17":
        # roofline CALIBRATION probe: the exact op count and dependency
        # shape of mul_mod_shoup_lazy with every multiply replaced by an
        # add (2 limb splits + 4 "partial products" + 8 assembly ops +
        # 1 low product + 2 reduce = 17 ops, non-affine so nothing folds).
        # Its measured rate is the empirical ceiling for ANY 17-op u32
        # elementwise chain on this VPU; modmul_roofline_pct divides the
        # real modmul's op rate by it.
        m16 = np.uint32(0xFFFF)

        def step(v):
            a0 = v & m16
            a1 = v >> 16
            ll = a0 + w
            lh = a0 + ws
            hl = a1 + w
            hh = a1 + ws
            mid = lh + (ll >> 16)
            mid2 = hl + (mid & m16)
            hi = hh + (mid >> 16) + (mid2 >> 16)
            lo = v + w
            return lo - (hi + p)
    elif variant == "mul17":
        # all-multiply twin of cheap17: 17 dependent u32 multiplies per
        # step.  Its rate is the pure integer-multiply issue ceiling; with
        # cheap17 it decomposes the lazy modmul's 6-mul/11-cheap mix into
        # per-op-class slot costs (the r3 125%-of-calibrated anomaly).
        # SQUARINGS, not constant multiplies: a chain of loop-invariant
        # constant muls is associative mod 2^32 and the compiler folds it
        # to one multiply (measured: the folded version reads 311 G
        # steps/s = an impossible 5.3 T mul/s).  v*v can't fold.
        def step(v):
            for _ in range(16):
                v = v * v
            return v * w
    else:  # pragma: no cover
        raise ValueError(variant)
    # manual unroll: fewer loop-carried boundaries lets Mosaic overlap the
    # independent per-vreg chains (device A/B: unroll 8 at 8 block rows won
    # 206 vs 148 G modmul/s over the unrolled=1/16-row default)
    #
    # ilp > 1 carries `ilp` INDEPENDENT per-element chains (v, v+1, ...)
    # and steps them interleaved in program order: if the single chain's
    # rate was latency-bound (multiply latency not hidden across vregs),
    # the interleaved chains will push total op throughput above the
    # single-chain rate; if the rates match, the single-chain number IS the
    # issue-throughput ceiling (VERDICT r3 next-step #1).
    if ilp == 1:
        def body(i, v):
            for _ in range(unroll):
                v = step(v)
            return v
        o_ref[...] = jax.lax.fori_loop(0, reps // unroll, body, x_ref[...])
    else:
        x0 = x_ref[...]
        vs0 = tuple(x0 + np.uint32(j) for j in range(ilp))

        def body(i, vs):
            for _ in range(unroll):
                vs = tuple(step(v) for v in vs)
            return vs

        vs = jax.lax.fori_loop(0, reps // unroll, body, vs0)
        acc = vs[0]
        for v in vs[1:]:
            acc = acc ^ v
        o_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("reps", "variant", "interpret",
                                             "block_rows", "unroll", "ilp"))
def modmul_chain(x: jax.Array, w, w_sh, p, mu, reps: int,
                 variant: str = "exact", interpret: bool = False,
                 block_rows: int = 8, unroll: int = 8,
                 ilp: int = 1) -> jax.Array:
    """`reps` data-dependent modmuls by the constant (w, w_sh) on a
    [rows, n] uint32 block, entirely in VMEM.  Returns the chained result
    (bit-exact with the composed jnp chain for each variant).
    reps must be a multiple of `unroll`.  With ilp=k, every element carries
    k INDEPENDENT chains seeded x, x+1, ..., x+k-1 (total modmuls =
    reps * k * x.size; output is the XOR fold of the k chain tails)."""
    rows, n = x.shape
    assert reps % unroll == 0
    bt = min(block_rows, rows)
    assert rows % bt == 0
    scalars = jnp.stack([jnp.uint32(w), jnp.uint32(w_sh), jnp.uint32(p),
                         jnp.uint32(mu)])[None]          # [1, 4] SMEM
    return pl.pallas_call(
        functools.partial(_chain_kernel, reps=reps, variant=variant,
                          unroll=unroll, ilp=ilp),
        grid=(rows // bt,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((bt, n), lambda b: (b, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bt, n), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, n), jnp.uint32),
        interpret=interpret,
    )(scalars, x)

"""Variance-based noise model — the standard per-op growth formulas.

Round-1 review item 8: the ciphertext ``noise_budget`` bookkeeping used
hand-tuned per-op constants; this module replaces them with the classical
expected-case (central-limit) noise analysis used by BFV/BGV noise
estimators (Costache-Smart style; the reference declares the same float
bookkeeping, ``include/fhe.cuh:64-69``, with ad-hoc updates
``src/fhe.cu:168,195-196,222``).

Model: every noise polynomial coefficient is treated as a zero-mean random
variable; we track its variance V and report the budget from a D-sigma tail
bound on the infinity norm:

    BFV:  phase = Delta*m + e,   budget = log2(q_L / (2 t)) - log2(D sqrt(V))
    BGV:  phase = m + t*e,       budget = log2(q_L / 2) - log2(t D sqrt(V))

with D = 6 (P(|N(0,1)| > 6) ~ 2e-9 per coefficient; with n <= 2^15
coefficients the union bound stays ~1e-4).  Polynomial products of
independent operands convolve n coefficient pairs, so variances multiply
and scale by n.

Inputs (h = secret Hamming weight, sigma = error stddev, all from params):
  * ternary secret / encryption randomness u: weight h, Var-contribution h
  * fresh error terms: Var sigma^2
  * uniform plaintext coefficient mod t: E[m^2] = t^2 / 3
  * uniform RNS digit mod q_i:           E[d^2] = q_i^2 / 3
  * rounding terms (mod switch, scaling): uniform in (-1/2, 1/2]: Var 1/12

REPRESENTATION: all variances are carried as log2(V) ("lv" values) and
combined with jnp.logaddexp2 — V itself reaches 2^140+ for large moduli,
far beyond float32 range, and these values may be TRACED jax scalars
(noise_budget is a pytree leaf on Ciphertext so one compiled trace serves
every budget value; parameters stay host ints/floats).

The tracked budget is validated against the exact (secret-key) measurement
within ~2 bits across depth-3 circuits in tests/test_noise_model.py.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from ..params import SchemeParams

D_TAIL = 6.0
_LOG_D = math.log2(D_TAIL)


def _traced(*xs) -> bool:
    return any(isinstance(x, jax.core.Tracer) for x in xs)


def logaddexp2(a, b):
    """log2(2^a + 2^b), host floats or traced scalars."""
    if _traced(a, b):
        return jnp.logaddexp2(a, b)
    return float(np.logaddexp2(float(a), float(b)))


def _floor(x, lo: float):
    if _traced(x):
        return jnp.maximum(x, lo)
    return max(float(x), lo)


# -- budget <-> log2-variance conversions ------------------------------------


def _q_at(params: SchemeParams, level: int) -> int:
    return math.prod(params.q_primes[: params.k - level])


def _cap(params: SchemeParams, level: int) -> float:
    """log2(q_L / (2t)) — the BFV budget at zero noise (== the BGV one:
    log2(q_L/2) - log2 t)."""
    return math.log2(_q_at(params, level)) - 1.0 - math.log2(params.t)


def bfv_budget(params: SchemeParams, level: int, log2_var):
    return _cap(params, level) - _LOG_D - _floor(log2_var, -40.0) / 2.0


def bfv_variance(params: SchemeParams, level: int, budget):
    """budget bits -> log2(V)."""
    return 2.0 * (_cap(params, level) - _LOG_D - budget)


def bgv_budget(params: SchemeParams, level: int, log2_var):
    return bfv_budget(params, level, log2_var)


def bgv_variance(params: SchemeParams, level: int, budget):
    return bfv_variance(params, level, budget)


# -- per-op log2-variance growth ---------------------------------------------


def fresh_variance(params: SchemeParams) -> float:
    """e = u * e_pk + e1 + s * e2 (u, s ternary weight h; e_* gaussian):
    V = sigma^2 (2h + 1)."""
    sig2 = params.security.sigma ** 2
    return math.log2(sig2 * (2 * params.security.hamming_weight + 1))


def add(lv1, lv2):
    return logaddexp2(lv1, lv2)


def multiply_plain(params: SchemeParams, lv):
    """e' = e * m, an n-term convolution with E[m^2] = t^2/3."""
    return lv + math.log2(params.n * (params.t ** 2) / 3.0)


def bfv_multiply(params: SchemeParams, lv1, lv2):
    """Dominant terms of the BFV tensor-product noise after t/q scaling:

        e' ~ m1*e2 + m2*e1 + t (alpha1*e2 + alpha2*e1) + r

    with alpha_i = (ct_i(s) - Delta m_i - e_i)/q having coefficient variance
    ~ (h+1)/12 (c1*s contributes h uniform(+-1/2) terms, c0 one more), plus
    a rounding term r of Var ~ (1+h)/12.  All products are n-term
    convolutions."""
    n, t = params.n, params.t
    h = params.security.hamming_weight
    alpha_var = (h + 1) / 12.0
    m_var = (t ** 2) / 3.0
    scale = math.log2(n * (m_var + (t ** 2) * alpha_var))
    cross = scale + logaddexp2(lv1, lv2)
    return logaddexp2(cross, math.log2((1 + h) / 12.0))


def bgv_multiply(params: SchemeParams, lv1, lv2):
    """phase product: e' = m1*e2 + m2*e1 + t e1*e2 (n-term convolutions)."""
    n, t = params.n, params.t
    cross = math.log2(n * (t ** 2) / 3.0) + logaddexp2(lv1, lv2)
    prod = math.log2(n) + 2 * math.log2(t) + lv1 + lv2
    return logaddexp2(cross, prod)


def keyswitch_add(params: SchemeParams, level: int) -> float:
    """RNS-digit key switching adds sum_d D_d (x) e_d over the gadget digits.

    The digits produced by bfv._keyswitch_inner are UNCENTERED residues in
    [0, q_Jd), so E[d^2] = q_Jd^2/3 (not the centered q^2/12):
    V_add = sum_d n * ((omega * q_Jd)^2 / 3) * sigma^2, as log2, where
    q_Jd is the digit-group modulus (ks_omega primes; omega=1 gives the
    classic per-prime sum) and the omega factor bounds the grouped digits'
    base-conversion overflow D + alpha*q_Jd, alpha < omega
    (context.ks_group_conv_tables).  Identical for BFV and BGV keys
    (BGV's t*e error divides back out in e units)."""
    sig2 = params.security.sigma ** 2
    n = params.n
    omega = getattr(params.security, "ks_omega", 1)
    primes_l = params.q_primes[: params.k - level]
    v = 0.0
    for g in range(0, len(primes_l), omega):
        qj = float(math.prod(primes_l[g: g + omega]))
        v += n * ((omega * qj) ** 2 / 3.0) * sig2
    return math.log2(v)


def bfv_mod_switch(params: SchemeParams, level_from: int, lv):
    """e' = e / q_last + eps * m + r.

    Besides the rounding term r = delta0 + delta1 * s (Var (1+h)/12), BFV
    modulus switching misaligns the plaintext scale: Delta_L / q_last =
    Delta_{L+1} + eps with eps in (-1, 1), adding a PLAINTEXT-scaled term
    eps * m (the classical reason BFV rarely mod-switches).  eps is a
    deterministic per-level constant, computed exactly in integer
    arithmetic; m is uniform mod t (E[m^2] = t^2/3)."""
    k = params.k
    t = params.t
    q_last = int(params.q_primes[k - 1 - level_from])
    q_from = _q_at(params, level_from)
    q_to = q_from // q_last
    eps = ((q_from // t) - (q_to // t) * q_last) / q_last
    h = params.security.hamming_weight
    const = (1 + h) / 12.0 + (eps ** 2) * (t ** 2) / 3.0
    return logaddexp2(lv - 2.0 * math.log2(q_last), math.log2(const))


def bgv_mod_switch(params: SchemeParams, level_from: int, lv):
    """BGV's t-corrected switch keeps the plaintext in the LSB exactly (no
    eps * m term): e' = e / q_last + r, Var(r) = (1 + h)/12."""
    q_last = float(params.q_primes[params.k - 1 - level_from])
    h = params.security.hamming_weight
    return logaddexp2(lv - 2.0 * math.log2(q_last),
                      math.log2((1 + h) / 12.0))


def galois(lv):
    """Automorphisms permute (and negate) coefficients: variance unchanged;
    the subsequent key switch adds keyswitch_add."""
    return lv

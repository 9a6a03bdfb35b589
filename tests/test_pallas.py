"""Pallas fused-NTT kernels, interpreter mode (bit-exact vs the jnp engine).

The compiled path is exercised on real TPU by bench.py and the verify
drivers; CPU CI runs the same kernel bodies through the Pallas interpreter
(SURVEY.md §5 race-detection analog: interpreter mode + bit-exact checks)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fhe_tpu import primes
from fhe_tpu.ops import ntt as _ntt
from fhe_tpu.ops import ntt_pallas as npal

RNG = np.random.default_rng(31)


def make(n, k, batch):
    ps = primes.find_ntt_primes(n, k)
    tb = _ntt.build_tables(n, ps)
    pt = npal.build_pallas_tables(n, ps)
    a = np.stack([
        RNG.integers(0, p, (batch, n), dtype=np.uint32) for p in ps])
    return ps, tb, pt, jnp.asarray(a)


@pytest.mark.parametrize("n,k,batch", [(256, 2, 1), (512, 1, 3), (1024, 3, 2)])
def test_forward_matches_jnp(n, k, batch):
    ps, tb, pt, a = make(n, k, batch)
    got = np.asarray(npal.ntt_forward(a, pt, interpret=True))
    want = np.asarray(jax.jit(_ntt.ntt_forward)(a, tb))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n,k,batch", [(256, 2, 1), (1024, 3, 2)])
def test_inverse_matches_jnp(n, k, batch):
    ps, tb, pt, a = make(n, k, batch)
    got = np.asarray(npal.ntt_inverse(a, pt, interpret=True))
    want = np.asarray(jax.jit(_ntt.ntt_inverse)(a, tb))
    np.testing.assert_array_equal(got, want)


def test_roundtrip():
    ps, tb, pt, a = make(512, 2, 2)
    f = npal.ntt_forward(a, pt, interpret=True)
    back = np.asarray(npal.ntt_inverse(f, pt, interpret=True))
    np.testing.assert_array_equal(back, np.asarray(a))


def test_polymul_matches_jnp():
    ps, tb, pt, a = make(256, 2, 2)
    _, _, _, b = make(256, 2, 2)
    b = jnp.asarray(np.asarray(b) % np.array(ps, dtype=np.uint32)[:, None, None])
    got = np.asarray(npal.polymul_negacyclic(a, b, tb, pt, interpret=True))
    want = np.asarray(jax.jit(_ntt.polymul_negacyclic)(a, b, tb))
    np.testing.assert_array_equal(got, want)


def test_small_n_rejected():
    with pytest.raises(ValueError, match="n >= 256"):
        npal.build_pallas_tables(128, primes.find_ntt_primes(128, 1))


def test_leveled_slice_matches_jnp():
    """Per-level transforms use row slices of the level-0 tables
    (round-1 review item 5: Pallas at every level)."""
    ps, tb, pt, a = make(512, 3, 2)
    for k_lvl in (2, 1):
        pt_l = npal.slice_tables(pt, k_lvl)
        tb_l = _ntt.slice_tables(tb, k_lvl)
        a_l = a[:k_lvl]
        got = np.asarray(npal.ntt_forward(a_l, pt_l, interpret=True))
        want = np.asarray(jax.jit(_ntt.ntt_forward)(a_l, tb_l))
        np.testing.assert_array_equal(got, want)
        back = np.asarray(npal.ntt_inverse(jnp.asarray(got), pt_l,
                                           interpret=True))
        np.testing.assert_array_equal(back, np.asarray(a_l))


def test_lazy_sweeps_bit_exact():
    """The Harvey lazy-reduction sweeps ([0, 4p) chains, one select per
    stage) must be bit-identical to the eager path for every transform."""
    ps, tb, pt, a = make(512, 3, 2)
    for fn in (npal.ntt_forward, npal.ntt_inverse):
        eager = np.asarray(fn(a, pt, interpret=True))
        lz = np.asarray(fn(a, pt, interpret=True, lazy=True))
        np.testing.assert_array_equal(lz, eager)
    x = jnp.asarray(np.stack([
        RNG.integers(0, p, (2, 512), dtype=np.uint32) for p in ps]))
    y = jnp.asarray(np.stack([
        RNG.integers(0, p, (2, 512), dtype=np.uint32) for p in ps]))
    np.testing.assert_array_equal(
        np.asarray(npal.tensor_product(x, y, pt, interpret=True, lazy=True)),
        np.asarray(npal.tensor_product(x, y, pt, interpret=True)))


def test_fused_tensor_product_matches_composed():
    """The one-kernel ciphertext tensor product == fwd/pointwise/inv chain."""
    ps, tb, pt, _ = make(512, 3, 1)
    x = jnp.asarray(np.stack([
        RNG.integers(0, p, (2, 512), dtype=np.uint32) for p in ps]))
    y = jnp.asarray(np.stack([
        RNG.integers(0, p, (2, 512), dtype=np.uint32) for p in ps]))
    got = np.asarray(npal.tensor_product(x, y, pt, interpret=True))
    fx = jax.jit(_ntt.ntt_forward)(x, tb)
    fy = jax.jit(_ntt.ntt_forward)(y, tb)
    c0 = _ntt.pointwise_mul(fx[:, :1], fy[:, :1], tb)
    c2 = _ntt.pointwise_mul(fx[:, 1:], fy[:, 1:], tb)
    from fhe_tpu.ops import modmath as mm
    c1 = mm.add_mod(_ntt.pointwise_mul(fx[:, :1], fy[:, 1:], tb),
                    _ntt.pointwise_mul(fx[:, 1:], fy[:, :1], tb),
                    tb.p[:, None, None])
    want = np.asarray(jax.jit(_ntt.ntt_inverse)(
        jnp.concatenate([c0, c1, c2], axis=1), tb))
    np.testing.assert_array_equal(got, want)

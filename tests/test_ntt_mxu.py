"""MXU four-step NTT engine (ops/ntt_mxu.py): exactness against the VPU
engine and the host oracle."""

import numpy as np
import pytest
import jax.numpy as jnp

from fhe_tpu import primes as _primes
from fhe_tpu.ops import ntt as _ntt
from fhe_tpu.ops import ntt_mxu as _mxu


@pytest.fixture(scope="module", params=[256, 1024])
def engines(request):
    n = request.param
    ps = _primes.find_ntt_primes(n, 2, bits=30)
    return n, _ntt.build_tables(n, ps), _mxu.build_mxu_tables(n, ps)


def _rand(rng, tb, n, batch):
    parr = np.asarray(tb.p, dtype=np.uint64)
    return jnp.asarray(
        rng.integers(0, parr[:, None, None],
                     size=(len(parr), batch, n)).astype(np.uint32))


def test_roundtrip_exact(engines):
    n, tb, mt = engines
    rng = np.random.default_rng(1)
    x = _rand(rng, tb, n, 3)
    rt = _mxu.ntt_inverse(_mxu.ntt_forward(x, mt), mt)
    assert np.array_equal(rt, x)


def test_polymul_bit_exact_vs_vpu_engine(engines):
    """Order conventions differ (four-step natural vs merged-psi
    bit-reversed) but the polymul result must be identical."""
    n, tb, mt = engines
    rng = np.random.default_rng(2)
    a = _rand(rng, tb, n, 2)
    b = _rand(rng, tb, n, 2)
    got = _mxu.polymul_negacyclic(a, b, mt)
    want = _ntt.polymul_negacyclic(a, b, tb)
    assert np.array_equal(got, want)


def test_forward_is_negacyclic_evaluation(engines):
    """Spot-check the four-step output against a direct evaluation:
    X[j2 + n2*j1] must equal sum_i x_i * psi^i * w^(i*(j2 + n2*j1)) mod p."""
    n, tb, mt = engines
    p = int(np.asarray(tb.p)[0])
    psi = _primes.negacyclic_psi(n, p)
    w = pow(psi, 2, p)
    rng = np.random.default_rng(3)
    x = [int(v) for v in rng.integers(0, p, size=n)]
    xs = jnp.asarray(np.array(x, dtype=np.uint32)[None, None, :])
    got = np.asarray(_mxu.ntt_forward(
        jnp.broadcast_to(xs, (mt.p.shape[0], 1, n)), mt))[0, 0]
    for j in rng.integers(0, n, size=4):
        j = int(j)
        want = sum(
            x[i] * pow(psi, i, p) % p * pow(w, i * j % (n), p) for i in range(n)
        ) % p
        assert int(got[j]) == want, j

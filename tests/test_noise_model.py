"""Noise-model validation (round-1 review item 8).

The tracked ciphertext budget (variance model, scheme/noise.py) must follow
the exact secret-key measurement within a small tolerance across a depth-3
circuit, for both schemes; and exact_noise_budget must go NEGATIVE on a
deliberately-exhausted ciphertext (the round-1 estimator blind spot).
"""

import numpy as np
import pytest

from fhe_tpu import FHE
from fhe_tpu.params import SecurityParams, make_scheme_params

# Predicted-vs-measured tolerance in bits.  The model is expected-case
# (central limit); the measurement is a max over n coefficients, so the
# model's 6-sigma tail bound brackets it from below with a couple bits of
# slack on top.
TOL_BITS = 4.0


def _check(predicted, exact, label):
    assert abs(predicted - exact) <= TOL_BITS, (
        f"{label}: tracked budget {predicted:.2f} vs measured {exact:.2f} "
        f"(drift {predicted - exact:+.2f} bits)")


@pytest.fixture(scope="module")
def bfv_setup():
    params = make_scheme_params(SecurityParams(
        poly_degree=1024, log_q=180, lambda_=0, hamming_weight=64))
    fhe = FHE(params, seed=11)
    pk, sk = fhe.keygen()
    rlk = fhe.relinkey_gen(sk)
    return fhe, pk, sk, rlk


def test_bfv_depth3_budget_tracks_measurement(bfv_setup):
    fhe, pk, sk, rlk = bfv_setup
    rng = np.random.default_rng(0)
    va = rng.integers(0, fhe.params.t, fhe.params.n)
    vb = rng.integers(0, fhe.params.t, fhe.params.n)
    model = va.copy()
    ct = fhe.encrypt(fhe.encode(va), pk)
    other = fhe.encrypt(fhe.encode(vb), pk)
    _check(ct.noise_budget,
           fhe.exact_noise_budget(ct, sk, fhe.encode(model)), "fresh")
    for depth in range(3):
        ct = fhe.multiply(ct, other, rlk)
        model = model * vb % fhe.params.t
        exact = fhe.exact_noise_budget(ct, sk, fhe.encode(model))
        _check(ct.noise_budget, exact, f"depth {depth + 1} multiply")
    # additions on top
    ct2 = fhe.add(ct, ct)
    model2 = model * 2 % fhe.params.t
    _check(ct2.noise_budget,
           fhe.exact_noise_budget(ct2, sk, fhe.encode(model2)), "add")


def test_bfv_mod_switch_budget(bfv_setup):
    fhe, pk, sk, rlk = bfv_setup
    v = [7, 13, 29]
    ct = fhe.encrypt(fhe.encode(v), pk)
    ct = fhe.multiply(ct, ct, rlk)
    model = [x * x % fhe.params.t for x in v]
    ct = fhe.mod_switch_to_next(ct)
    _check(ct.noise_budget,
           fhe.exact_noise_budget(ct, sk, fhe.encode(model)), "mod_switch")


def test_bfv_rotation_budget(bfv_setup):
    fhe, pk, sk, rlk = bfv_setup
    gk = fhe.galoiskey_gen(sk, elements=[pow(3, 1, 2 * fhe.params.n)])
    vals = np.arange(fhe.params.n) % fhe.params.t
    ct = fhe.encrypt(fhe.encode(vals), pk)
    rot = fhe.rotate_rows(ct, 1, gk)
    half = fhe.params.n // 2
    model = np.concatenate([np.roll(vals[:half], -1), np.roll(vals[half:], -1)])
    _check(rot.noise_budget,
           fhe.exact_noise_budget(rot, sk, fhe.encode(model)), "rotate")


def test_exact_budget_goes_negative_on_exhaustion():
    """Depth-2 at log_q=60 exhausts the budget; the exact check must report
    a NEGATIVE budget (round-1 blind spot: the measured-m estimator read
    small-positive on corrupted ciphertexts)."""
    params = make_scheme_params(SecurityParams(
        poly_degree=256, log_q=60, lambda_=0, hamming_weight=16))
    fhe = FHE(params, seed=5)
    pk, sk = fhe.keygen()
    rlk = fhe.relinkey_gen(sk)
    rng = np.random.default_rng(1)
    v = rng.integers(0, params.t, params.n)
    ct = fhe.encrypt(fhe.encode(v), pk)
    model = v.copy()
    for _ in range(2):
        ct = fhe.multiply(ct, ct, rlk)
        model = model * model % params.t
    got = fhe.decode(fhe.decrypt(ct, sk)).astype(np.int64)
    exact = fhe.exact_noise_budget(ct, sk, fhe.encode(model))
    if not np.array_equal(got, model):
        assert exact < 0, (
            f"corrupted ciphertext but exact budget {exact:.2f} >= 0")
    assert ct.noise_budget == 0.0  # tracked budget pinned at the floor


def test_exact_budget_aliasing_window_bgv():
    """Measurement aliasing (fuzz seed 4004): noise past q/2 wraps mod q and
    the exact budget reads back small-POSITIVE while decryption is already
    corrupted.  Inject E = 0.6*q (a multiple of t, so the phase stays
    m + t*e-shaped) into c0: the true noise is 0.6q > q/2, the measured
    residual |0.6q - q| = 0.4q, and the budget reads log2(1.25) = 0.32 bits.
    The library documents readings under ~1 bit as 'at or past exhaustion'."""
    import math
    import jax.numpy as jnp
    params = make_scheme_params(SecurityParams(
        poly_degree=256, log_q=60, lambda_=0, hamming_weight=16))
    fhe = FHE(params, seed=6, scheme="bgv")
    pk, sk = fhe.keygen()
    v = np.arange(params.n) % params.t
    ct = fhe.encrypt(fhe.encode(v), pk)
    q = math.prod(params.q_primes)
    E = params.t * int(0.6 * q / params.t)
    res = np.asarray(ct.data).copy()
    for i, p in enumerate(params.q_primes):
        # adding E mod p to every entry of c0 is E*x^0 in NTT form and
        # E*(sum_j x^j) in coefficient form — both wrap the centered lift
        res[i, 0, :] = (res[i, 0, :].astype(np.uint64) + E % p) % p
    ct2 = ct.replace(data=jnp.asarray(res.astype(np.uint32)))
    got = fhe.decode(fhe.decrypt(ct2, sk)).astype(np.int64)
    assert not np.array_equal(got, v), "0.6q noise must corrupt decryption"
    exact = fhe.exact_noise_budget(ct2, sk, fhe.encode(v))
    assert 0.0 < exact < 1.0, (
        f"expected the aliased small-positive reading, got {exact:.2f}")


@pytest.mark.parametrize("seed,scheme", [
    (0, "bfv"), (1, "bgv"), (2, "bfv"), (3, "bgv"), (7, "bfv"), (11, "bgv"),
])
def test_tracked_budget_soundness_under_exhaustion(seed, scheme):
    """SOUNDNESS sweep (VERDICT r4 next-step #5, the round-1 fuzzer FAIL
    regime): repeated squarings in a shallow-q config drive the ciphertext
    past exhaustion; at every depth, a wrong decryption MUST come with the
    tracked budget pinned at 0 (the tracked variance model — not the
    measured estimate, which aliases past q/2 — is the library's
    exhaustion oracle).  A 30-circuit randomized sweep of this regime ran
    clean (r5); these seeds are the committed regression slice."""
    rng = np.random.default_rng(seed)
    n = int(rng.choice([128, 256]))
    log_q = int(rng.choice([60, 90]))
    hw = int(rng.choice([8, 16]))
    params = make_scheme_params(SecurityParams(
        poly_degree=n, log_q=log_q, lambda_=0, hamming_weight=hw))
    t = params.t
    fhe = FHE(params, seed=seed, scheme=scheme)
    pk, sk = fhe.keygen()
    rlk = fhe.relinkey_gen(sk)
    v = rng.integers(0, t, n)
    ct = fhe.encrypt(fhe.encode(v), pk)
    model = v.copy()
    exhausted = False
    for depth in range(4):
        ct = fhe.multiply(ct, ct, rlk)
        model = model * model % t
        tracked = float(ct.noise_budget)
        got = fhe.decode(fhe.decrypt(ct, sk)).astype(np.int64)
        ok = np.array_equal(got, model)
        if not ok:
            exhausted = True
            assert tracked == 0.0, (
                f"UNSOUND: depth {depth} decrypts wrong but tracked budget "
                f"reads {tracked:.2f} bits (n={n} logq={log_q} hw={hw})")
            break
    assert exhausted or float(ct.noise_budget) >= 0.0  # chain may survive


@pytest.fixture(scope="module")
def bgv_setup():
    params = make_scheme_params(SecurityParams(
        poly_degree=1024, log_q=180, lambda_=0, hamming_weight=64))
    fhe = FHE(params, seed=12, scheme="bgv")
    pk, sk = fhe.keygen()
    rlk = fhe.relinkey_gen(sk)
    return fhe, pk, sk, rlk


def test_bgv_depth2_budget_tracks_measurement(bgv_setup):
    fhe, pk, sk, rlk = bgv_setup
    rng = np.random.default_rng(2)
    va = rng.integers(0, fhe.params.t, fhe.params.n)
    vb = rng.integers(0, fhe.params.t, fhe.params.n)
    ct = fhe.encrypt(fhe.encode(va), pk)
    other = fhe.encrypt(fhe.encode(vb), pk)
    model = va.copy()
    _check(ct.noise_budget,
           fhe.exact_noise_budget(ct, sk, fhe.encode(model)), "bgv fresh")
    for depth in range(2):
        ct = fhe.multiply(ct, other, rlk)
        model = model * vb % fhe.params.t
        exact = fhe.exact_noise_budget(ct, sk, fhe.encode(model))
        _check(ct.noise_budget, exact, f"bgv depth {depth + 1}")
    ct = fhe.mod_switch_to_next(ct)
    _check(ct.noise_budget,
           fhe.exact_noise_budget(ct, sk, fhe.encode(model)),
           "bgv mod_switch")

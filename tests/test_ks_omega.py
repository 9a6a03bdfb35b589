"""Grouped-gadget key switching (SecurityParams.ks_omega — SEAL's
decomposition-base idea on the RNS basis; the k=8 relinearization lever).

omega=2 halves the gadget digit count: half the digit NTTs and key inner
products per key switch, at ~PRIME_BITS extra bits of key-switch noise.
The grouped digit is recovered from the STANDARD per-prime digits by CRT
interpolation with an exactly-absorbed overflow (context.ks_group_conv_tables
docstring), so correctness holds with no new number theory on device.
"""

import numpy as np
import pytest

from fhe_tpu import FHE
from fhe_tpu.params import SecurityParams, make_scheme_params


def _mk(scheme="bfv", log_q=120, omega=2, n=256, hw=16, seed=7):
    params = make_scheme_params(SecurityParams(
        poly_degree=n, log_q=log_q, lambda_=0, hamming_weight=hw,
        ks_omega=omega))
    return FHE(params, seed=seed, scheme=scheme)


@pytest.mark.parametrize("scheme", ["bfv", "bgv"])
def test_multiply_relin_omega2(scheme):
    fhe = _mk(scheme)
    assert fhe.params.k == 4
    pk, sk = fhe.keygen()
    rlk = fhe.relinkey_gen(sk)
    assert rlk.data.shape[0] == 2, "omega=2 at k=4 must give 2 digit groups"
    a = fhe.encrypt(fhe.encode([5, 10, 15, 20]), pk)
    b = fhe.encrypt(fhe.encode([3, 6, 9, 12]), pk)
    got = fhe.decode(fhe.decrypt(fhe.multiply(a, b, rlk), sk))
    assert list(got[:4]) == [15, 60, 135, 240], got[:4]


def test_multiply_omega2_odd_k():
    """k=5 with omega=2: the short last group (kd=3, pad path)."""
    fhe = _mk(log_q=150)
    assert fhe.params.k == 5
    pk, sk = fhe.keygen()
    rlk = fhe.relinkey_gen(sk)
    assert rlk.data.shape[0] == 3
    a = fhe.encrypt(fhe.encode([7, 8]), pk)
    b = fhe.encrypt(fhe.encode([2, 3]), pk)
    got = fhe.decode(fhe.decrypt(fhe.multiply(a, b, rlk), sk))
    assert list(got[:2]) == [14, 24], got[:2]


def test_rotations_omega2():
    fhe = _mk()
    pk, sk = fhe.keygen()
    gk = fhe.galoiskey_gen(sk)
    n, t = fhe.params.n, fhe.params.t
    vals = np.arange(n) % t
    ct = fhe.encrypt(fhe.encode(vals), pk)
    rot = fhe.rotate_rows(ct, 3, gk)
    half = n // 2
    model = np.concatenate(
        [np.roll(vals[:half], -3), np.roll(vals[half:], -3)])
    got = fhe.decode(fhe.decrypt(rot, sk)).astype(np.int64)
    assert np.array_equal(got, model)
    # hoisted path shares one GROUPED decomposition across elements
    outs = fhe.rotate_rows_hoisted(ct, [1, 2], gk)
    for s, o in zip([1, 2], outs):
        model = np.concatenate(
            [np.roll(vals[:half], -s), np.roll(vals[half:], -s)])
        got = fhe.decode(fhe.decrypt(o, sk)).astype(np.int64)
        assert np.array_equal(got, model), s


def test_leveled_omega2_alignment():
    """Keys switch down only through WHOLE gadget groups: k=6, omega=2 —
    level 2 (kl=4, kd=2) works, level 1 (kl=5) raises.  (A level where only
    ONE group survives is mathematically useless — the digit spans the
    whole modulus, so key-switch noise >= q_L; keep kd_l >= 2.)"""
    from fhe_tpu.scheme import bfv
    fhe = _mk(log_q=180)
    assert fhe.params.k == 6
    pk, sk = fhe.keygen()
    rlk = fhe.relinkey_gen(sk)
    a = fhe.encrypt(fhe.encode([5, 6]), pk)
    b = fhe.encrypt(fhe.encode([2, 4]), pk)
    a2 = fhe.mod_switch_to_level(a, 2)
    b2 = fhe.mod_switch_to_level(b, 2)
    got = fhe.decode(fhe.decrypt(fhe.multiply(a2, b2, rlk), sk))
    assert list(got[:2]) == [10, 24], got[:2]
    with pytest.raises(ValueError, match="ks_omega"):
        bfv.switch_relin_keys(fhe.ctx, rlk, level=1)


def test_noise_budget_omega2_tracks_measurement():
    """The omega-aware keyswitch_add must keep tracked-vs-exact within the
    suite's tolerance after a multiply+rotate chain."""
    fhe = _mk(log_q=180, n=1024, hw=64, seed=11)
    pk, sk = fhe.keygen()
    rlk = fhe.relinkey_gen(sk)
    gk = fhe.galoiskey_gen(sk, elements=[pow(3, 1, 2 * fhe.params.n)])
    t = fhe.params.t
    rng = np.random.default_rng(0)
    va = rng.integers(0, t, fhe.params.n)
    vb = rng.integers(0, t, fhe.params.n)
    ct = fhe.multiply(fhe.encrypt(fhe.encode(va), pk),
                      fhe.encrypt(fhe.encode(vb), pk), rlk)
    ct = fhe.rotate_rows(ct, 1, gk)
    half = fhe.params.n // 2
    mv = va * vb % t
    model = np.concatenate([np.roll(mv[:half], -1), np.roll(mv[half:], -1)])
    exact = fhe.exact_noise_budget(ct, sk, fhe.encode(model))
    assert abs(float(ct.noise_budget) - exact) <= 4.0, (
        f"tracked {float(ct.noise_budget):.2f} vs exact {exact:.2f}")
    got = fhe.decode(fhe.decrypt(ct, sk)).astype(np.int64)
    assert np.array_equal(got, model)


def test_pallas_batched_omega2_matches_single(monkeypatch):
    """multiply_batch and apply_galois_batch with omega=2 keys route the
    grouped residues through keyswitch_fused_batch's prereduced lane —
    element i must be bit-exact with the single-ct omega=2 path."""
    import jax.random as jrandom
    from fhe_tpu.scheme import bfv
    from fhe_tpu.scheme.context import make_context
    import sys
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_pallas import _patch_interpret

    _patch_interpret(monkeypatch, (
        "ntt_forward", "ntt_inverse", "tensor_product",
        "tensor_product_batch", "mul_by_ntt_operand", "keyswitch_fused",
        "keyswitch_fused_batch", "ks_inner_batch", "ks_inner_grouped",
        "decrypt_fused"))
    params = make_scheme_params(SecurityParams(
        poly_degree=1024, log_q=120, lambda_=0, hamming_weight=8,
        ks_omega=2))
    ctx = make_context(params, use_pallas=True, use_mxu=False)
    ctx_ref = make_context(params, use_pallas=False, use_mxu=False)
    key = jrandom.PRNGKey(61)
    pk, sk = bfv.keygen(ctx_ref, jrandom.fold_in(key, 0))
    rlk = bfv.relinkey_gen(ctx_ref, jrandom.fold_in(key, 1), sk)
    from fhe_tpu.scheme.encoder import BatchEncoder
    enc = BatchEncoder(params)
    cts_a = [bfv.encrypt(ctx_ref, jrandom.fold_in(key, 2 + i), pk,
                         enc.encode([i + 1, i + 5])) for i in range(2)]
    cts_b = [bfv.encrypt(ctx_ref, jrandom.fold_in(key, 8 + i), pk,
                         enc.encode([2 * i + 1, 3])) for i in range(2)]
    outs = bfv.multiply_batch(ctx, cts_a, cts_b, rlk)
    for i in range(2):
        want = bfv.multiply(ctx, cts_a[i], cts_b[i], rlk)
        np.testing.assert_array_equal(
            np.asarray(outs[i].data), np.asarray(want.data)), i
        dec = enc.decode(bfv.decrypt(ctx_ref, outs[i], sk))
        assert list(dec[:2]) == [(i + 1) * (2 * i + 1), (i + 5) * 3], i

    g = pow(3, 1, 2 * params.n)
    gal = bfv.galoiskey_gen(ctx_ref, jrandom.fold_in(key, 20), sk,
                            elements=(g,))
    routs = bfv.apply_galois_batch(ctx, cts_a, g, gal)
    for i in range(2):
        want = bfv.apply_galois(ctx, cts_a[i], g, gal)
        np.testing.assert_array_equal(
            np.asarray(routs[i].data), np.asarray(want.data)), i


def test_pallas_prereduced_keyswitch_matches_composed(monkeypatch):
    """The fused keyswitch kernel's prereduced lane (grouped digits) must be
    bit-exact with the composed non-pallas omega=2 path."""
    import jax.random as jrandom
    from fhe_tpu.scheme import bfv
    from fhe_tpu.scheme.context import make_context
    import sys
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_pallas import _patch_interpret

    _patch_interpret(monkeypatch, (
        "ntt_forward", "ntt_inverse", "tensor_product",
        "mul_by_ntt_operand", "keyswitch_fused", "ks_inner_batch",
        "ks_inner_grouped", "decrypt_fused"))
    params = make_scheme_params(SecurityParams(
        poly_degree=1024, log_q=120, lambda_=0, hamming_weight=8,
        ks_omega=2))
    ctx = make_context(params, use_pallas=True, use_mxu=False)
    ctx_ref = make_context(params, use_pallas=False, use_mxu=False)
    key = jrandom.PRNGKey(59)
    pk, sk = bfv.keygen(ctx_ref, jrandom.fold_in(key, 0))
    rlk = bfv.relinkey_gen(ctx_ref, jrandom.fold_in(key, 1), sk)
    from fhe_tpu.scheme.encoder import BatchEncoder
    enc = BatchEncoder(params)
    a = bfv.encrypt(ctx_ref, jrandom.fold_in(key, 2), pk,
                    enc.encode([5, 10]))
    b = bfv.encrypt(ctx_ref, jrandom.fold_in(key, 3), pk,
                    enc.encode([3, 6]))
    prod = bfv.multiply_no_relin(ctx_ref, a, b)
    rel_pl = bfv.relinearize(ctx, prod, rlk)
    rel_ref = bfv.relinearize(ctx_ref, prod, rlk)
    np.testing.assert_array_equal(np.asarray(rel_pl.data),
                                  np.asarray(rel_ref.data))
    got = enc.decode(bfv.decrypt(ctx_ref, rel_pl, sk))
    assert list(got[:2]) == [15, 60], got[:2]

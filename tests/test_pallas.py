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
from fhe_tpu.ops import decrypt_pallas as dpal
from fhe_tpu.ops import rns_pallas as rpal

RNG = np.random.default_rng(31)

_RNS_KERNELS = ("sm_mrq_fused", "fast_floor_fused", "fast_bconv_sk_fused",
                "bsk_branch_fused")


def _patch_interpret(monkeypatch, names):
    """Force interpreter mode on the listed pallas entry points (CPU CI).
    The fused BEHZ conversion kernels are always included — any scheme
    multiply on a use_pallas context dispatches onto them."""
    import functools as ft

    from fhe_tpu.ops import galois_pallas as gpal
    _GAL = ("automorphism_fused", "automorphism_single",
            "automorphism_fused_sum")
    for name in tuple(names) + _RNS_KERNELS + _GAL:
        mod = (dpal if name == "decrypt_fused"
               else rpal if name in _RNS_KERNELS
               else gpal if name in _GAL else npal)
        monkeypatch.setattr(mod, name,
                            ft.partial(getattr(mod, name), interpret=True))


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


def test_pick_bt_respects_mosaic_block_rule():
    """Batch tiles must divide the batch AND satisfy Mosaic's block rule
    (second-to-last dim ≡ 0 mod 8, or equal to the array dim); whenever
    the only option is an oversized whole-batch block, the padding target
    must produce a tile within the requested bound."""
    for batch in range(1, 70):
        for bb in (4, 8, 16):
            bt = npal._pick_bt(batch, bb)
            assert batch % bt == 0
            assert bt == batch or bt % 8 == 0, (batch, bb, bt)
            # wrapper logic: pad to tgt if needed, then tile with the
            # clamped bound — the resulting tile must stay within it
            tgt = npal._padded_batch_target(batch, bb)
            eff_batch = tgt if tgt is not None else batch
            if tgt is not None:
                assert tgt % 8 == 0 and tgt >= batch
            assert npal._pick_bt(eff_batch, max(bb, 8)) <= max(bb, 8)


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


def test_scheme_pallas_dispatch_interpreted(monkeypatch):
    """The scheme layer's use_pallas=True wiring (encrypt pk·u kernel,
    decrypt phase product, fused multiply tensor product) must be
    bit-identical to the jnp engine — run on CPU by forcing interpreter
    mode on every pallas entry point."""
    import functools as ft
    import jax.random as jrandom
    from fhe_tpu.params import SecurityParams, make_scheme_params
    from fhe_tpu.scheme import bfv
    from fhe_tpu.scheme.context import make_context

    _patch_interpret(monkeypatch, (
        "ntt_forward", "ntt_inverse", "tensor_product",
        "mul_by_ntt_operand", "keyswitch_fused", "decrypt_fused"))

    params = make_scheme_params(SecurityParams(
        poly_degree=256, log_q=90, lambda_=0, hamming_weight=8))
    ctx_pl = make_context(params, use_pallas=True, use_mxu=False)
    ctx_ref = make_context(params, use_pallas=False, use_mxu=False)
    key = jrandom.PRNGKey(17)
    k1, k2, k3 = jrandom.split(key, 3)
    pk, sk = bfv.keygen(ctx_ref, k1)
    from fhe_tpu.scheme.encoder import BatchEncoder
    enc = BatchEncoder(params)
    pt1, pt2 = enc.encode([5, 10, 15, 20]), enc.encode([3, 6, 9, 12])
    ct_pl = bfv.encrypt(ctx_pl, k2, pk, pt1)
    ct_ref = bfv.encrypt(ctx_ref, k2, pk, pt1)
    np.testing.assert_array_equal(np.asarray(ct_pl.data),
                                  np.asarray(ct_ref.data))
    ct2 = bfv.encrypt(ctx_ref, k3, pk, pt2)
    prod_pl = bfv.multiply_no_relin(ctx_pl, ct_pl, ct2)
    prod_ref = bfv.multiply_no_relin(ctx_ref, ct_ref, ct2)
    np.testing.assert_array_equal(np.asarray(prod_pl.data),
                                  np.asarray(prod_ref.data))
    dec_pl = bfv.decrypt(ctx_pl, prod_pl, sk)
    dec_ref = bfv.decrypt(ctx_ref, prod_ref, sk)
    np.testing.assert_array_equal(np.asarray(dec_pl.data),
                                  np.asarray(dec_ref.data))
    assert list(enc.decode(dec_pl)[:4]) == [15, 60, 135, 240]

    # relinearize routes through the fused key-switch kernel
    k4 = jrandom.fold_in(key, 4)
    rlk = bfv.relinkey_gen(ctx_ref, k4, sk)
    rel_pl = bfv.relinearize(ctx_pl, prod_pl, rlk)
    rel_ref = bfv.relinearize(ctx_ref, prod_ref, rlk)
    np.testing.assert_array_equal(np.asarray(rel_pl.data),
                                  np.asarray(rel_ref.data))

    # ... and stays bit-exact after a mod switch (level-1 sliced tables,
    # down-switched keys) — the leveled fused key-switch path
    lv_pl = bfv.multiply_no_relin(
        ctx_pl, bfv.mod_switch_to_next(ctx_pl, ct_pl),
        bfv.mod_switch_to_next(ctx_pl, ct2))
    lv_ref = bfv.multiply_no_relin(
        ctx_ref, bfv.mod_switch_to_next(ctx_ref, ct_ref),
        bfv.mod_switch_to_next(ctx_ref, ct2))
    rel1_pl = bfv.relinearize(ctx_pl, lv_pl, rlk)
    rel1_ref = bfv.relinearize(ctx_ref, lv_ref, rlk)
    np.testing.assert_array_equal(np.asarray(rel1_pl.data),
                                  np.asarray(rel1_ref.data))

    # BGV encrypt routes through the same fused pk·u kernel
    from fhe_tpu.scheme import bgv
    bpk, bsk = bgv.keygen(ctx_ref, k1)
    bct_pl = bgv.encrypt(ctx_pl, k2, bpk, pt1)
    bct_ref = bgv.encrypt(ctx_ref, k2, bpk, pt1)
    np.testing.assert_array_equal(np.asarray(bct_pl.data),
                                  np.asarray(bct_ref.data))


def test_mul_by_ntt_operand_matches_composed():
    """The fused encrypt-product kernel (INTT(NTT(u) ⊙ w), one kernel per
    prime) == the composed fwd/pointwise/inv chain, for both 2-row (pk)
    and 1-row (secret key) NTT operands, eager and lazy."""
    ps, tb, pt, _ = make(512, 3, 1)
    u = jnp.asarray(np.stack([
        RNG.integers(0, p, (1, 512), dtype=np.uint32) for p in ps]))
    for c in (1, 2):
        w = jnp.asarray(np.stack([
            RNG.integers(0, p, (c, 512), dtype=np.uint32) for p in ps]))
        fu = jax.jit(_ntt.ntt_forward)(u, tb)
        want = np.asarray(jax.jit(_ntt.ntt_inverse)(
            _ntt.pointwise_mul(jnp.broadcast_to(fu, w.shape), w, tb), tb))
        for lazy in (False, True):
            got = np.asarray(npal.mul_by_ntt_operand(
                u, w, pt, interpret=True, lazy=lazy))
            np.testing.assert_array_equal(got, want)


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


def test_keyswitch_fused_matches_composed():
    """The one-kernel key switch == digit-reduce/NTT/inner-product/INTT chain."""
    from fhe_tpu.ops import modmath as mm
    n, k = 512, 3
    ps, tb, pt, _ = make(n, k, 1)
    parr = np.array(ps, dtype=np.uint32)
    d = jnp.asarray(np.stack(  # digits: row j already reduced mod its own q_j
        [RNG.integers(0, p, n, dtype=np.uint32) for p in ps]))
    keys_t = jnp.asarray(np.stack([  # [k_primes, kd, 2, n], rows < p_i
        RNG.integers(0, p, (k, 2, n), dtype=np.uint32) for p in ps]))
    got = np.asarray(npal.keyswitch_fused(d, keys_t, pt, interpret=True))
    # composed: broadcast-reduce digits to every prime, NTT, inner, INTT
    p3 = tb.p[:, None, None]
    d_all = mm.barrett_reduce_u32(d[None], p3, tb.mu[:, None, None])
    f = jax.jit(_ntt.ntt_forward)(d_all, tb)             # [k, kd, n]
    prod = mm.mul_mod_barrett(f[:, :, None, :], jnp.asarray(keys_t),
                              tb.p[:, None, None, None],
                              tb.mu[:, None, None, None])
    acc = mm.add_mod_tree(prod, tb.p[:, None, None, None], axis=1)[:, 0]
    want = np.asarray(jax.jit(_ntt.ntt_inverse)(acc, tb))
    np.testing.assert_array_equal(got, want)


def test_batched_kernels_match_single():
    """tensor_product_batch / keyswitch_fused_batch slice b must equal the
    single-ciphertext kernels on pair b."""
    n, k, B = 512, 3, 4
    ps, tb, pt, _ = make(n, k, 1)
    xs = jnp.asarray(np.stack([RNG.integers(0, p, (2, B, n), dtype=np.uint32)
                               for p in ps]))              # [k, 2, B, n]
    ys = jnp.asarray(np.stack([RNG.integers(0, p, (2, B, n), dtype=np.uint32)
                               for p in ps]))
    got = np.asarray(npal.tensor_product_batch(xs, ys, pt, interpret=True))
    for b in range(B):
        want = np.asarray(npal.tensor_product(
            xs[:, :, b], ys[:, :, b], pt, interpret=True))
        np.testing.assert_array_equal(got[:, :, b], want)

    d = jnp.asarray(np.stack(  # [kd, B, n], digit j reduced mod its own q_j
        [RNG.integers(0, p, (B, n), dtype=np.uint32) for p in ps]))
    keys_t = jnp.asarray(np.stack([
        RNG.integers(0, p, (k, 2, n), dtype=np.uint32) for p in ps]))
    gks = np.asarray(npal.keyswitch_fused_batch(d, keys_t, pt,
                                                interpret=True))
    for b in range(B):
        want = np.asarray(npal.keyswitch_fused(d[:, b], keys_t, pt,
                                               interpret=True))
        np.testing.assert_array_equal(gks[:, :, b], want)


def test_multiply_batch_matches_single(monkeypatch):
    """scheme.bfv.multiply_batch element i == multiply(a_i, b_i) bit-exact
    (interpreter-mode Pallas on a use_pallas context)."""
    import functools as ft
    import jax.random as jrandom
    from fhe_tpu.params import SecurityParams, make_scheme_params
    from fhe_tpu.scheme import bfv
    from fhe_tpu.scheme.context import make_context

    _patch_interpret(monkeypatch, (
        "ntt_forward", "ntt_inverse", "tensor_product",
        "tensor_product_batch", "keyswitch_fused", "keyswitch_fused_batch",
        "mul_by_ntt_operand", "decrypt_fused"))
    params = make_scheme_params(SecurityParams(
        poly_degree=256, log_q=90, lambda_=0, hamming_weight=8))
    ctx = make_context(params, use_pallas=True, use_mxu=False)
    key = jrandom.PRNGKey(23)
    pk, sk = bfv.keygen(ctx, jrandom.fold_in(key, 0))
    rlk = bfv.relinkey_gen(ctx, jrandom.fold_in(key, 1), sk)
    from fhe_tpu.scheme.encoder import BatchEncoder
    enc = BatchEncoder(params)
    cts_a = [bfv.encrypt(ctx, jrandom.fold_in(key, 10 + i), pk,
                         enc.encode([i + 1, 2 * i])) for i in range(3)]
    cts_b = [bfv.encrypt(ctx, jrandom.fold_in(key, 20 + i), pk,
                         enc.encode([3 * i + 2, i + 5])) for i in range(3)]
    got = bfv.multiply_batch(ctx, cts_a, cts_b, rlk)
    for i in range(3):
        want = bfv.multiply(ctx, cts_a[i], cts_b[i], rlk)
        np.testing.assert_array_equal(np.asarray(got[i].data),
                                      np.asarray(want.data))
        dec = enc.decode(bfv.decrypt(ctx, got[i], sk))
        assert list(dec[:2]) == [((i + 1) * (3 * i + 2)) % 65537,
                                 (2 * i * (i + 5)) % 65537]

    # leveled batched multiply (level-1 sliced tables, down-switched keys)
    lv_a = [bfv.mod_switch_to_next(ctx, ct) for ct in cts_a]
    lv_b = [bfv.mod_switch_to_next(ctx, ct) for ct in cts_b]
    got_lv = bfv.multiply_batch(ctx, lv_a, lv_b, rlk)
    for i in range(3):
        want_lv = bfv.multiply(ctx, lv_a[i], lv_b[i], rlk)
        np.testing.assert_array_equal(np.asarray(got_lv[i].data),
                                      np.asarray(want_lv.data))

    # BGV batched multiply: same contract, t-corrected keys
    from fhe_tpu.scheme import bgv
    bpk, bsk = bgv.keygen(ctx, jrandom.fold_in(key, 2))
    brlk = bgv.relinkey_gen(ctx, jrandom.fold_in(key, 3), bsk)
    bas = [bgv.encrypt(ctx, jrandom.fold_in(key, 30 + i), bpk,
                       enc.encode([i + 2, i])) for i in range(2)]
    bbs = [bgv.encrypt(ctx, jrandom.fold_in(key, 40 + i), bpk,
                       enc.encode([i + 4, 2 * i + 1])) for i in range(2)]
    bgot = bgv.multiply_batch(ctx, bas, bbs, brlk)
    for i in range(2):
        bwant = bgv.multiply(ctx, bas[i], bbs[i], brlk)
        np.testing.assert_array_equal(np.asarray(bgot[i].data),
                                      np.asarray(bwant.data))
        bdec = enc.decode(bgv.decrypt(ctx, bgot[i], bsk))
        assert list(bdec[:2]) == [(i + 2) * (i + 4), i * (2 * i + 1)]


def test_rotate_batch_matches_single(monkeypatch):
    """bfv.rotate_rows_batch element i == rotate_rows(cts[i]) bit-exact."""
    import functools as ft
    import jax.random as jrandom
    from fhe_tpu.params import SecurityParams, make_scheme_params
    from fhe_tpu.scheme import bfv
    from fhe_tpu.scheme.context import make_context

    _patch_interpret(monkeypatch, (
        "ntt_forward", "ntt_inverse", "mul_by_ntt_operand",
        "keyswitch_fused", "keyswitch_fused_batch", "decrypt_fused"))
    params = make_scheme_params(SecurityParams(
        poly_degree=256, log_q=90, lambda_=0, hamming_weight=8))
    ctx = make_context(params, use_pallas=True, use_mxu=False)
    key = jrandom.PRNGKey(9)
    pk, sk = bfv.keygen(ctx, jrandom.fold_in(key, 0))
    gal = bfv.galoiskey_gen(ctx, jrandom.fold_in(key, 1), sk)
    from fhe_tpu.scheme.encoder import BatchEncoder
    enc = BatchEncoder(params)
    cts = [bfv.encrypt(ctx, jrandom.fold_in(key, 10 + i), pk,
                       enc.encode([i + 1, i + 2, i + 3])) for i in range(3)]
    got = bfv.rotate_rows_batch(ctx, cts, 1, gal)
    for i in range(3):
        want = bfv.rotate_rows(ctx, cts[i], 1, gal)
        np.testing.assert_array_equal(np.asarray(got[i].data),
                                      np.asarray(want.data))
        dec = enc.decode(bfv.decrypt(ctx, got[i], sk))
        assert list(dec[:2]) == [i + 2, i + 3]


def test_encrypt_decrypt_batch_match_single(monkeypatch):
    """bfv.encrypt_batch element i is bit-identical to
    encrypt(fold_in(key, i)); decrypt_batch element i == decrypt."""
    import functools as ft
    import jax.random as jrandom
    from fhe_tpu.params import SecurityParams, make_scheme_params
    from fhe_tpu.scheme import bfv
    from fhe_tpu.scheme.context import make_context

    _patch_interpret(monkeypatch, (
        "ntt_forward", "ntt_inverse", "mul_by_ntt_operand",
        "mul_by_ntt_operand_batch", "decrypt_fused"))
    params = make_scheme_params(SecurityParams(
        poly_degree=256, log_q=90, lambda_=0, hamming_weight=8))
    ctx = make_context(params, use_pallas=True, use_mxu=False)
    key = jrandom.PRNGKey(5)
    pk, sk = bfv.keygen(ctx, jrandom.fold_in(key, 0))
    from fhe_tpu.scheme.encoder import BatchEncoder
    enc = BatchEncoder(params)
    pts = [enc.encode([i + 1, 7 * i + 2]) for i in range(3)]
    ekey = jrandom.fold_in(key, 1)
    got = bfv.encrypt_batch(ctx, ekey, pk, pts)
    for i in range(3):
        want = bfv.encrypt(ctx, jrandom.fold_in(ekey, i), pk, pts[i])
        np.testing.assert_array_equal(np.asarray(got[i].data),
                                      np.asarray(want.data))
    decs = bfv.decrypt_batch(ctx, got, sk)
    for i in range(3):
        want = bfv.decrypt(ctx, got[i], sk)
        np.testing.assert_array_equal(np.asarray(decs[i].data),
                                      np.asarray(want.data))
        assert list(enc.decode(decs[i])[:2]) == [i + 1, 7 * i + 2]


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


def test_ks_inner_batch_matches_composed():
    """The hoisted-rotation inner-product kernel (NTT-domain digits x
    per-element keys + batched INTT) == the composed chain per element."""
    from fhe_tpu.ops import modmath as mm
    n, k, B = 512, 3, 4
    ps, tb, pt, _ = make(n, k, 1)
    dg = jnp.asarray(np.stack([            # [k, kd, B, n], rows < p_i
        RNG.integers(0, p, (k, B, n), dtype=np.uint32) for p in ps]))
    keys = jnp.asarray(np.stack([          # [k, kd, B, 2, n], rows < p_i
        RNG.integers(0, p, (k, B, 2, n), dtype=np.uint32) for p in ps]))
    got = np.asarray(npal.ks_inner_batch(dg, keys, pt, interpret=True))
    p4 = tb.p[:, None, None, None]
    for b in range(B):
        prod = mm.mul_mod_barrett(
            dg[:, :, b][:, :, None, :], keys[:, :, b], p4,
            tb.mu[:, None, None, None])
        acc = mm.add_mod_tree(prod, p4, axis=1)[:, 0]
        want = np.asarray(jax.jit(_ntt.ntt_inverse)(acc, tb))
        np.testing.assert_array_equal(got[:, :, b], want)


def test_hoisted_batched_matches_composed(monkeypatch):
    """apply_galois_hoisted's batched fast path (ks_inner_batch) must be
    bit-exact with the composed hoisted path (the jnp engine)."""
    import jax.random as jrandom
    from fhe_tpu.params import SecurityParams, make_scheme_params
    from fhe_tpu.scheme import bfv
    from fhe_tpu.scheme.context import make_context

    _patch_interpret(monkeypatch, (
        "ntt_forward", "ntt_inverse", "mul_by_ntt_operand",
        "keyswitch_fused", "ks_inner_batch", "ks_inner_grouped",
        "decrypt_fused"))
    params = make_scheme_params(SecurityParams(
        poly_degree=256, log_q=90, lambda_=0, hamming_weight=8))
    ctx = make_context(params, use_pallas=True, use_mxu=False)
    ctx_ref = make_context(params, use_pallas=False, use_mxu=False)
    key = jrandom.PRNGKey(41)
    pk, sk = bfv.keygen(ctx_ref, jrandom.fold_in(key, 0))
    elems = tuple(pow(3, s, 2 * params.n) for s in range(1, 5))
    gal = bfv.galoiskey_gen(ctx_ref, jrandom.fold_in(key, 1), sk,
                            elements=elems)
    from fhe_tpu.scheme.encoder import BatchEncoder
    enc = BatchEncoder(params)
    ct = bfv.encrypt(ctx_ref, jrandom.fold_in(key, 2), pk,
                     enc.encode(list(range(1, 9))))
    got = bfv.apply_galois_hoisted(ctx, ct, elems, gal)
    want = bfv.apply_galois_hoisted(ctx_ref, ct, elems, gal)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g.data), np.asarray(w.data))
    # and each decrypts to the right rotation (g = 3^s rotates rows by s)
    for s, g in zip(range(1, 5), got):
        dec = enc.decode(bfv.decrypt(ctx_ref, g, sk))
        assert list(dec[:3]) == [1 + s, 2 + s, 3 + s], (s, dec[:3])


def test_hoisted_multi_ct_batched(monkeypatch):
    """apply_galois_hoisted_batch (C independent ciphertexts x E elements
    through ONE kernel chain: batched digit NTT, one ks_inner_batch over
    C*E rows, one fused per-element-c0 automorphism epilogue) must be
    bit-exact with per-ciphertext apply_galois_hoisted on the same pallas
    context, and every output must decrypt to the right rotation.
    n = 1024 so the fused epilogue path (n >= 1024) is the one under test."""
    import jax.random as jrandom
    from fhe_tpu.params import SecurityParams, make_scheme_params
    from fhe_tpu.scheme import bfv
    from fhe_tpu.scheme.context import make_context

    _patch_interpret(monkeypatch, (
        "ntt_forward", "ntt_inverse", "mul_by_ntt_operand",
        "keyswitch_fused", "ks_inner_batch", "ks_inner_grouped",
        "decrypt_fused"))
    params = make_scheme_params(SecurityParams(
        poly_degree=1024, log_q=90, lambda_=0, hamming_weight=8))
    ctx = make_context(params, use_pallas=True, use_mxu=False)
    ctx_ref = make_context(params, use_pallas=False, use_mxu=False)
    key = jrandom.PRNGKey(47)
    pk, sk = bfv.keygen(ctx_ref, jrandom.fold_in(key, 0))
    steps = (1, 2, 3)
    elems = tuple(pow(3, s, 2 * params.n) for s in steps)
    gal = bfv.galoiskey_gen(ctx_ref, jrandom.fold_in(key, 1), sk,
                            elements=elems)
    from fhe_tpu.scheme.encoder import BatchEncoder
    enc = BatchEncoder(params)
    base = [[10 * c + j for j in range(1, 9)] for c in range(2)]
    cts = [bfv.encrypt(ctx_ref, jrandom.fold_in(key, 2 + c), pk,
                       enc.encode(base[c])) for c in range(2)]
    got = bfv.apply_galois_hoisted_batch(ctx, cts, elems, gal)
    for c, ct in enumerate(cts):
        want = bfv.apply_galois_hoisted(ctx, ct, elems, gal)
        for e, (g, w) in enumerate(zip(got[c], want)):
            np.testing.assert_array_equal(
                np.asarray(g.data), np.asarray(w.data)), (c, e)
        for s, g in zip(steps, got[c]):
            dec = enc.decode(bfv.decrypt(ctx_ref, g, sk))
            assert list(dec[:3]) == [base[c][s], base[c][s + 1],
                                     base[c][s + 2]], (c, s)


def test_ks_inner_grouped_matches_batch():
    """ks_inner_grouped (C digit stacks x E key sets via grid-indexed
    blocks; E = 8 exercises the GROUPED kernel, not the E%8 fallback) must
    be bit-exact with ks_inner_batch over materialized repeat/tile."""
    n, k, C, E = 1024, 3, 2, 8
    ps, tb, pt, _ = make(n, k, 1)
    dg = jnp.asarray(np.stack([
        RNG.integers(0, p, (k, C, n), dtype=np.uint32) for p in ps]))
    keys = jnp.asarray(np.stack([
        RNG.integers(0, p, (k, E, 2, n), dtype=np.uint32) for p in ps]))
    got = np.asarray(npal.ks_inner_grouped(dg, keys, pt, interpret=True))
    want = np.asarray(npal.ks_inner_batch(
        jnp.repeat(dg, E, axis=2), jnp.tile(keys, (1, 1, C, 1, 1)), pt,
        interpret=True))
    np.testing.assert_array_equal(got, want)


def test_hoisted_sum_matches_composed(monkeypatch):
    """apply_galois_hoisted_sum (accumulating epilogue kernel) must equal
    ct + sum of apply_galois_hoisted outputs on the same pallas context
    (mod-add of identical terms => bit-exact), and decrypt to the
    rotate-and-accumulate sum."""
    import jax.random as jrandom
    from fhe_tpu.ops import modmath as mm
    from fhe_tpu.params import SecurityParams, make_scheme_params
    from fhe_tpu.scheme import bfv
    from fhe_tpu.scheme.context import make_context

    _patch_interpret(monkeypatch, (
        "ntt_forward", "ntt_inverse", "mul_by_ntt_operand",
        "keyswitch_fused", "ks_inner_batch", "ks_inner_grouped",
        "decrypt_fused"))
    params = make_scheme_params(SecurityParams(
        poly_degree=1024, log_q=90, lambda_=0, hamming_weight=8))
    ctx = make_context(params, use_pallas=True, use_mxu=False)
    ctx_ref = make_context(params, use_pallas=False, use_mxu=False)
    key = jrandom.PRNGKey(53)
    pk, sk = bfv.keygen(ctx_ref, jrandom.fold_in(key, 0))
    steps = (1, 2, 3)
    elems = tuple(pow(3, s, 2 * params.n) for s in steps)
    gal = bfv.galoiskey_gen(ctx_ref, jrandom.fold_in(key, 1), sk,
                            elements=elems)
    from fhe_tpu.scheme.encoder import BatchEncoder
    enc = BatchEncoder(params)
    vals = list(range(1, 9))
    ct = bfv.encrypt(ctx_ref, jrandom.fold_in(key, 2), pk, enc.encode(vals))
    got = bfv.apply_galois_hoisted_sum(ctx, ct, elems, gal)
    parts = bfv.apply_galois_hoisted(ctx, ct, elems, gal)
    want = ct.data
    p3 = ctx.ntt_q.p[:, None, None]
    for o in parts:
        want = mm.add_mod(want, o.data, p3)
    np.testing.assert_array_equal(np.asarray(got.data), np.asarray(want))
    dec = enc.decode(bfv.decrypt(ctx_ref, got, sk))
    # slot j of the sum = v[j] + v[j+1] + v[j+2] + v[j+3] (row-rotations)
    assert list(dec[:2]) == [1 + 2 + 3 + 4, 2 + 3 + 4 + 5], dec[:4]
    assert got.noise_budget > 0


@pytest.mark.parametrize("t", [65537, 786433])
def test_decrypt_fused_matches_composed(t):
    """The one-kernel decrypt (phase + gamma trick in VMEM) == the composed
    bfv.decrypt path, Fermat and generic-t lanes, single and batched."""
    import jax.random as jrandom
    from fhe_tpu.params import SecurityParams, make_scheme_params
    from fhe_tpu.scheme import bfv
    from fhe_tpu.scheme.context import make_context

    params = make_scheme_params(SecurityParams(
        poly_degree=512, log_q=90, lambda_=0, hamming_weight=8,
        plain_modulus=t))
    ctx = make_context(params, use_pallas=False)
    key = jrandom.PRNGKey(3)
    pk, sk = bfv.keygen(ctx, jrandom.fold_in(key, 0))
    from fhe_tpu.scheme.encoder import BatchEncoder
    enc = BatchEncoder(params)
    cts = [bfv.encrypt(ctx, jrandom.fold_in(key, 10 + i), pk,
                       enc.encode([i + 1, 5 * i + 2])) for i in range(3)]
    pt = npal.build_pallas_tables(params.n, params.q_primes)
    # single (B = 1)
    got1 = np.asarray(dpal.decrypt_fused(
        cts[0].data[:, 0:1], cts[0].data[:, 1:2], sk.data, pt,
        ctx.dec_levels[0], fermat=t == 65537, interpret=True))
    want1 = np.asarray(bfv.decrypt(ctx, cts[0], sk).data)
    np.testing.assert_array_equal(got1[0], want1)
    # batched (B = 3)
    data = jnp.stack([c.data for c in cts])
    got = np.asarray(dpal.decrypt_fused(
        jnp.transpose(data[:, :, 0], (1, 0, 2)),
        jnp.transpose(data[:, :, 1], (1, 0, 2)), sk.data, pt,
        ctx.dec_levels[0], fermat=t == 65537, interpret=True))
    for i, ct in enumerate(cts):
        np.testing.assert_array_equal(
            got[i], np.asarray(bfv.decrypt(ctx, ct, sk).data))
    # leveled: one mod switch, sliced tables + level-1 constants
    ct_l1 = bfv.mod_switch_to_next(ctx, cts[0])
    got_l1 = np.asarray(dpal.decrypt_fused(
        ct_l1.data[:, 0:1], ct_l1.data[:, 1:2], sk.data[:params.k - 1],
        npal.slice_tables(pt, params.k - 1), ctx.dec_levels[1],
        fermat=t == 65537, interpret=True))
    np.testing.assert_array_equal(
        got_l1[0], np.asarray(bfv.decrypt(ctx, ct_l1, sk).data))


def test_modmul_chain_matches_composed():
    """The VMEM-resident roofline probe: `reps` chained modmuls inside one
    kernel == the composed jnp chain, for every variant."""
    from fhe_tpu.ops import modmath as mm
    from fhe_tpu.utils import ubench

    p = 1073479681
    w = 123456789 % p
    w_sh = mm.shoup_precompute(w, p)
    mu = mm.barrett_precompute(p)
    x = jnp.asarray(RNG.integers(0, p, (16, 512), dtype=np.uint32))
    for variant, step in (
            ("exact", lambda v: mm.mul_mod_shoup(
                v, np.uint32(w), np.uint32(w_sh), np.uint32(p))),
            ("lazy", lambda v: mm.mul_mod_shoup_lazy(
                v, np.uint32(w), np.uint32(w_sh), np.uint32(p))),
            ("barrett", lambda v: mm.mul_mod_barrett(
                v, np.uint32(w), np.uint32(p), np.uint32(mu)))):
        got = np.asarray(ubench.modmul_chain(
            x, np.uint32(w), np.uint32(w_sh), np.uint32(p), np.uint32(mu),
            reps=5, variant=variant, interpret=True, unroll=1))
        want = x
        for _ in range(5):
            want = step(want)
        np.testing.assert_array_equal(got, np.asarray(want))


def test_modmul_chain_ilp_matches_composed():
    """ilp=k carries k independent chains seeded x, x+1, ... and XOR-folds
    the tails — the ILP-exposed roofline probe (VERDICT r3 #1)."""
    from fhe_tpu.ops import modmath as mm
    from fhe_tpu.utils import ubench

    p = 1073479681
    w = 123456789 % p
    w_sh = mm.shoup_precompute(w, p)
    mu = mm.barrett_precompute(p)
    x = jnp.asarray(RNG.integers(0, p, (16, 512), dtype=np.uint32))
    step = lambda v: mm.mul_mod_shoup_lazy(
        v, np.uint32(w), np.uint32(w_sh), np.uint32(p))
    for ilp in (2, 4):
        got = np.asarray(ubench.modmul_chain(
            x, np.uint32(w), np.uint32(w_sh), np.uint32(p), np.uint32(mu),
            reps=4, variant="lazy", interpret=True, unroll=2, ilp=ilp))
        want = None
        for j in range(ilp):
            v = x + np.uint32(j)
            for _ in range(4):
                v = step(v)
            want = v if want is None else want ^ v
        np.testing.assert_array_equal(got, np.asarray(want))
    # the all-multiply twin: 17 dependent u32 multiplies (16 squarings +
    # one const mul — squarings so the chain can't constant-fold) per step
    got = np.asarray(ubench.modmul_chain(
        x, np.uint32(w), np.uint32(w_sh), np.uint32(p), np.uint32(mu),
        reps=2, variant="mul17", interpret=True, unroll=1))
    v = x
    for _ in range(2):
        for _ in range(16):
            v = v * v
        v = v * np.uint32(w)
    np.testing.assert_array_equal(got, np.asarray(v))


def test_folded_layout_kernels_match_flat():
    """The sublane-folded sweeps (n >= 1024: [bt, 8, n/8] rows, row stages
    as sublane rolls) must be bit-exact with the flat-layout kernels for
    every fused kernel that dispatches on them."""
    from fhe_tpu.ops import modmath as mm
    n, k = 1024, 3
    ps, tb, pt, a = make(n, k, 1)
    # forward / inverse
    got = np.asarray(npal.ntt_forward(a, pt, interpret=True, folded=True))
    want = np.asarray(npal.ntt_forward(a, pt, interpret=True, folded=False))
    np.testing.assert_array_equal(got, want)
    gi = np.asarray(npal.ntt_inverse(jnp.asarray(got), pt, interpret=True,
                                     folded=True))
    np.testing.assert_array_equal(gi, np.asarray(a))
    # tensor product (auto-folded at n >= 1024)
    x = jnp.asarray(np.stack([
        RNG.integers(0, p, (2, n), dtype=np.uint32) for p in ps]))
    y = jnp.asarray(np.stack([
        RNG.integers(0, p, (2, n), dtype=np.uint32) for p in ps]))
    got_tp = np.asarray(npal.tensor_product(x, y, pt, interpret=True))
    want_tp = np.asarray(npal.tensor_product(x, y, pt, interpret=True,
                                             lazy=False))  # flat eager
    np.testing.assert_array_equal(got_tp, want_tp)
    # fused key switch
    d = jnp.asarray(np.stack(
        [RNG.integers(0, p, n, dtype=np.uint32) for p in ps]))
    keys_t = jnp.asarray(np.stack([
        RNG.integers(0, p, (k, 2, n), dtype=np.uint32) for p in ps]))
    got_ks = np.asarray(npal.keyswitch_fused(d, keys_t, pt, interpret=True))
    want_ks = np.asarray(npal.keyswitch_fused(d, keys_t, pt, interpret=True,
                                              lazy=False))
    np.testing.assert_array_equal(got_ks, want_ks)
    # fused NTT-operand product
    u = jnp.asarray(np.stack([
        RNG.integers(0, p, (1, n), dtype=np.uint32) for p in ps]))
    w = jnp.asarray(np.stack([
        RNG.integers(0, p, (2, n), dtype=np.uint32) for p in ps]))
    got_mo = np.asarray(npal.mul_by_ntt_operand(u, w, pt, interpret=True))
    want_mo = np.asarray(npal.mul_by_ntt_operand(u, w, pt, interpret=True,
                                                 lazy=False))
    np.testing.assert_array_equal(got_mo, want_mo)


def test_decrypt_fused_folded_matches_flat():
    """decrypt_fused's folded single-ciphertext path (bt < 8, n >= 1024)
    == the composed decrypt."""
    import jax.random as jrandom
    from fhe_tpu.params import SecurityParams, make_scheme_params
    from fhe_tpu.scheme import bfv
    from fhe_tpu.scheme.context import make_context

    params = make_scheme_params(SecurityParams(
        poly_degree=1024, log_q=90, lambda_=0, hamming_weight=8))
    ctx = make_context(params, use_pallas=False)
    key = jrandom.PRNGKey(11)
    pk, sk = bfv.keygen(ctx, jrandom.fold_in(key, 0))
    from fhe_tpu.scheme.encoder import BatchEncoder
    enc = BatchEncoder(params)
    ct = bfv.encrypt(ctx, jrandom.fold_in(key, 1), pk, enc.encode([7, 9]))
    pt = npal.build_pallas_tables(params.n, params.q_primes)
    got = np.asarray(dpal.decrypt_fused(
        ct.data[:, 0:1], ct.data[:, 1:2], sk.data, pt, ctx.dec_levels[0],
        fermat=True, interpret=True))
    want = np.asarray(bfv.decrypt(ctx, ct, sk).data)
    np.testing.assert_array_equal(got[0], want)


def test_fused_behz_conversions_match_jnp():
    """The one-kernel BEHZ conversions (rns_pallas) == the composed jnp
    versions (ops/rns.py), bit-exact, at level-0 and level-1 constants."""
    from fhe_tpu.ops import rns as _rns
    from fhe_tpu.params import SecurityParams, make_scheme_params
    from fhe_tpu.scheme.context import make_context

    params = make_scheme_params(SecurityParams(
        poly_degree=256, log_q=120, lambda_=0, hamming_weight=8))
    ctx = make_context(params, use_pallas=False)
    n = params.n
    for lvl in (0, 1):
        kl = params.k - lvl
        ps = params.q_primes[:kl]
        x = jnp.asarray(np.stack([
            RNG.integers(0, p, (3, n), dtype=np.uint32) for p in ps]))
        smq = ctx.smq_levels[lvl]
        got = np.asarray(rpal.sm_mrq_fused(x, smq, interpret=True))
        want = np.asarray(jax.jit(_rns.sm_mrq)(x, smq))
        np.testing.assert_array_equal(got, want, err_msg=f"sm_mrq lvl{lvl}")

        fc = ctx.floor_levels[lvl]
        kb = fc.conv.p_dst.shape[0]
        bsk_ps = [int(v) for v in np.asarray(fc.conv.p_dst)]
        xb = jnp.asarray(np.stack([
            RNG.integers(0, p, (3, n), dtype=np.uint32) for p in bsk_ps]))
        got = np.asarray(rpal.fast_floor_fused(x, xb, fc, interpret=True))
        want = np.asarray(jax.jit(_rns.fast_floor)(x, xb, fc))
        np.testing.assert_array_equal(got, want, err_msg=f"floor lvl{lvl}")

        skc = ctx.sk_levels[lvl]
        got = np.asarray(rpal.fast_bconv_sk_fused(xb, skc, interpret=True))
        want = np.asarray(jax.jit(_rns.fast_bconv_sk)(xb, skc))
        np.testing.assert_array_equal(got, want, err_msg=f"sk lvl{lvl}")


def test_automorphism_fused_matches_permutation():
    """The fused VMEM automorphism kernel (ops/galois_pallas.py): per-element
    static-h gather+rolls+negation == context.galois_permutation, for every
    in-kernel fold plan (single-level n<8192, two-level n>=8192) and the
    c0-add epilogue variant (reference rotate_rows decl include/fhe.cuh:113-116)."""
    from fhe_tpu.ops import galois_pallas as gp
    from fhe_tpu.scheme import context as _context

    p_np = np.array([1073479681, 1072496641, 1071513601], dtype=np.uint32)
    for n in (1024, 4096, 8192):
        k, C, B = 3, 2, 4
        x = jnp.asarray(np.stack([
            RNG.integers(0, p_np[i], (C, B, n), dtype=np.uint32)
            for i in range(3)]))
        gs = (3, pow(3, 5, 2 * n), 2 * n - 1, pow(3, -1, 2 * n))
        hs = tuple(pow(g, -1, 2 * n) for g in gs)
        got = np.asarray(gp.automorphism_fused(
            x, hs, jnp.asarray(p_np), interpret=True))
        c0 = jnp.asarray(np.stack([
            RNG.integers(0, p_np[i], n, dtype=np.uint32) for i in range(3)]))
        got_c0 = np.asarray(gp.automorphism_fused(
            x, hs, jnp.asarray(p_np), c0=c0, interpret=True))
        for b, g in enumerate(gs):
            src, neg = _context.galois_permutation(n, g)
            xa = np.asarray(x)[:, :, b, :]
            w = xa[..., src]
            want = np.where(
                neg, np.where(w == 0, w, p_np[:, None, None] - w), w)
            np.testing.assert_array_equal(got[:, :, b], want,
                                          err_msg=f"n={n} g={g}")
            xc = xa.copy()
            xc[:, 0] = ((xc[:, 0].astype(np.uint64)
                         + np.asarray(c0).astype(np.uint64))
                        % p_np[:, None]).astype(np.uint32)
            w = xc[..., src]
            want = np.where(
                neg, np.where(w == 0, w, p_np[:, None, None] - w), w)
            np.testing.assert_array_equal(got_c0[:, :, b], want,
                                          err_msg=f"c0 n={n} g={g}")


def test_automorphism_fused_sum_and_chunking():
    """automorphism_fused_sum == base + sum_b of the per-element fused
    outputs (mod p); and automorphism_fused with B > _MAX_ELEMS (the r5
    VMEM/unroll chunking, ADVICE r4) == the unchunked per-element math."""
    from fhe_tpu.ops import galois_pallas as gp

    p_np = np.array([1073479681, 1072496641], dtype=np.uint32)
    n, k, C = 1024, 2, 2
    m = 2 * n
    B = gp._MAX_ELEMS + 4          # forces the chunked path
    gs = tuple(pow(3, s + 1, m) for s in range(B))
    hs = tuple(pow(g, -1, m) for g in gs)
    x = jnp.asarray(np.stack([
        RNG.integers(0, p_np[i], (C, B, n), dtype=np.uint32)
        for i in range(k)]))
    c0 = jnp.asarray(np.stack([
        RNG.integers(0, p_np[i], n, dtype=np.uint32) for i in range(k)]))
    base = jnp.asarray(np.stack([
        RNG.integers(0, p_np[i], (C, n), dtype=np.uint32)
        for i in range(k)]))
    p = jnp.asarray(p_np)

    # chunked per-element kernel == per-element reference (chunk boundary
    # crossing exercises the split + concatenate)
    got_elems = np.asarray(gp.automorphism_fused(
        x, hs, p, c0=c0, interpret=True)).astype(np.uint64)
    for b0 in range(0, B, 5):      # spot-check a few elements
        one = np.asarray(gp.automorphism_fused(
            x[:, :, b0:b0 + 1], hs[b0:b0 + 1], p, c0=c0,
            interpret=True))[:, :, 0]
        np.testing.assert_array_equal(got_elems[:, :, b0], one)

    got_sum = np.asarray(gp.automorphism_fused_sum(
        x, hs, p, c0, base, interpret=True))
    want = np.asarray(base).astype(np.uint64)
    for b in range(B):
        want = (want + got_elems[:, :, b]) % p_np[:, None, None]
    np.testing.assert_array_equal(got_sum, want.astype(np.uint32))


def test_automorphism_single_matches_coeff_path():
    """automorphism_single == the XLA folded/gather _apply_galois_coeff."""
    from fhe_tpu.ops import galois_pallas as gp
    from fhe_tpu.scheme import context as _context

    n = 2048
    p_np = np.array([1073479681, 1072496641], dtype=np.uint32)
    x = jnp.asarray(np.stack([
        RNG.integers(0, p_np[i], (2, n), dtype=np.uint32) for i in range(2)]))
    for g in (3, 2 * n - 1, pow(3, 7, 2 * n)):
        got = np.asarray(gp.automorphism_single(
            x, g, 2 * n, jnp.asarray(p_np), interpret=True))
        src, neg = _context.galois_permutation(n, g)
        w = np.asarray(x)[..., src]
        want = np.where(neg, np.where(w == 0, w, p_np[:, None, None] - w), w)
        np.testing.assert_array_equal(got, want, err_msg=f"g={g}")


def test_hoisted_fused_epilogue_matches_composed(monkeypatch):
    """At n >= 1024 the hoisted fast path runs the ONE-KERNEL fused
    epilogue (c0-add + all output automorphisms, ops/galois_pallas.py);
    outputs must stay bit-exact with the jnp-engine hoisted path and
    decrypt to the right rotations."""
    import jax.random as jrandom
    from fhe_tpu.params import SecurityParams, make_scheme_params
    from fhe_tpu.scheme import bfv
    from fhe_tpu.scheme.context import make_context

    _patch_interpret(monkeypatch, (
        "ntt_forward", "ntt_inverse", "mul_by_ntt_operand",
        "keyswitch_fused", "keyswitch_fused_batch", "ks_inner_batch",
        "ks_inner_grouped",
        "decrypt_fused"))
    # keep THIS test's executables out of the persistent cache: the hoisted
    # path bakes the Galois key stacks in as jaxpr constants and
    # executable.serialize() SEGFAULTS on the resulting proto (observed in
    # three consecutive full-suite runs, always at this test's compiles)
    jax.config.update("jax_enable_compilation_cache", False)
    try:
        _run_hoisted_fused_epilogue_body()
    finally:
        jax.config.update("jax_enable_compilation_cache", True)


def _run_hoisted_fused_epilogue_body():
    import jax.random as jrandom
    from fhe_tpu.params import SecurityParams, make_scheme_params
    from fhe_tpu.scheme import bfv
    from fhe_tpu.scheme.context import make_context

    params = make_scheme_params(SecurityParams(
        poly_degree=1024, log_q=60, lambda_=0, hamming_weight=8))
    ctx = make_context(params, use_pallas=True, use_mxu=False)
    ctx_ref = make_context(params, use_pallas=False, use_mxu=False)
    key = jrandom.PRNGKey(43)
    pk, sk = bfv.keygen(ctx_ref, jrandom.fold_in(key, 0))
    elems = tuple(pow(3, s, 2 * params.n) for s in range(1, 4))
    gal = bfv.galoiskey_gen(ctx_ref, jrandom.fold_in(key, 1), sk,
                            elements=elems)
    from fhe_tpu.scheme.encoder import BatchEncoder
    enc = BatchEncoder(params)
    ct = bfv.encrypt(ctx_ref, jrandom.fold_in(key, 2), pk,
                     enc.encode(list(range(1, 9))))
    got = bfv.apply_galois_hoisted(ctx, ct, elems, gal)
    want = bfv.apply_galois_hoisted(ctx_ref, ct, elems, gal)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g.data), np.asarray(w.data))
    for s, g in zip(range(1, 4), got):
        dec = enc.decode(bfv.decrypt(ctx_ref, g, sk))
        assert list(dec[:3]) == [1 + s, 2 + s, 3 + s], (s, dec[:3])
    # plain apply_galois + rotate_rows also route the fused automorphism
    rot_pl = bfv.rotate_rows(ctx, ct, 1, gal)
    rot_ref = bfv.rotate_rows(ctx_ref, ct, 1, gal)
    np.testing.assert_array_equal(np.asarray(rot_pl.data),
                                  np.asarray(rot_ref.data))
    # batched same-element automorphism (apply_galois_batch fused path)
    cts = [ct, bfv.encrypt(ctx_ref, jrandom.fold_in(key, 3), pk,
                           enc.encode([4, 5, 6]))]
    gotb = bfv.rotate_rows_batch(ctx, cts, 1, gal)
    for i in range(2):
        wantb = bfv.rotate_rows(ctx_ref, cts[i], 1, gal)
        np.testing.assert_array_equal(np.asarray(gotb[i].data),
                                      np.asarray(wantb.data))


def test_fused_behz_conversions_folded_layout():
    """At n >= 1024 the conversion wrappers fold the lane axis to
    [k, B, 8, n/8] (full sublane occupancy, r4) — must stay bit-exact with
    the composed jnp conversions."""
    from fhe_tpu.ops import rns as _rns
    from fhe_tpu.params import SecurityParams, make_scheme_params
    from fhe_tpu.scheme.context import make_context

    params = make_scheme_params(SecurityParams(
        poly_degree=1024, log_q=90, lambda_=0, hamming_weight=8))
    ctx = make_context(params, use_pallas=False)
    n = params.n
    ps = params.q_primes
    x = jnp.asarray(np.stack([
        RNG.integers(0, p, (3, n), dtype=np.uint32) for p in ps]))
    smq = ctx.smq_levels[0]
    np.testing.assert_array_equal(
        np.asarray(rpal.sm_mrq_fused(x, smq, interpret=True)),
        np.asarray(jax.jit(_rns.sm_mrq)(x, smq)))
    fc = ctx.floor_levels[0]
    bsk_ps = [int(v) for v in np.asarray(fc.conv.p_dst)]
    xb = jnp.asarray(np.stack([
        RNG.integers(0, p, (3, n), dtype=np.uint32) for p in bsk_ps]))
    np.testing.assert_array_equal(
        np.asarray(rpal.fast_floor_fused(x, xb, fc, interpret=True)),
        np.asarray(jax.jit(_rns.fast_floor)(x, xb, fc)))
    skc = ctx.sk_levels[0]
    np.testing.assert_array_equal(
        np.asarray(rpal.fast_bconv_sk_fused(xb, skc, interpret=True)),
        np.asarray(jax.jit(_rns.fast_bconv_sk)(xb, skc)))


def test_bsk_branch_fused_matches_composed():
    """The one-kernel Bsk branch (SmMRq lift -> NTT tensor product with
    folded t-scale -> FastFloor, rns_pallas.bsk_branch_fused) must be
    bit-exact with the composed three-kernel path, level 0 and 1."""
    from fhe_tpu.ops import rns_pallas as rp
    from fhe_tpu.params import SecurityParams, make_scheme_params
    from fhe_tpu.scheme.context import make_context

    params = make_scheme_params(SecurityParams(
        poly_degree=1024, log_q=90, lambda_=0, hamming_weight=8))
    ctx = make_context(params, use_pallas=True, use_mxu=False)
    n = params.n
    for lvl in (0, 1):
        kl = params.k - lvl
        ps = params.q_primes[:kl]
        ab = jnp.asarray(np.stack([
            RNG.integers(0, p, (4, n), dtype=np.uint32) for p in ps]))
        smq = ctx.smq_levels[lvl]
        fc = ctx.floor_levels[lvl]
        tq_pl, tbsk_pl = ctx.ntt_mul_pl_levels[lvl]
        tx_q = npal.tensor_product(ab[:, :2], ab[:, 2:], tq_pl,
                                   interpret=True)
        lift = rp.sm_mrq_fused(ab, smq, interpret=True)
        tx_bsk = npal.tensor_product(lift[:, :2], lift[:, 2:], tbsk_pl,
                                     interpret=True)
        want = np.asarray(rp.fast_floor_fused(tx_q, tx_bsk, fc,
                                              interpret=True))
        got = np.asarray(rp.bsk_branch_fused(ab, tx_q, smq, fc, tbsk_pl,
                                             interpret=True))
        np.testing.assert_array_equal(got, want, err_msg=f"lvl{lvl}")

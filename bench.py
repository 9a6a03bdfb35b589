"""Benchmark: BFV ciphertext multiply+relinearize and forward NTT on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Baseline of record (BASELINE.md): the reference's documented RTX 4090 numbers
  * homomorphic multiply incl. relinearization: ~40 ms  -> 25 ops/s
  * forward NTT, n=8192: 1.89 ms                        -> 529 transforms/s
Config matches BASELINE.json: n=8192, 3 RNS primes (q ~ 2^90).

Run on the real TPU: `python bench.py` (first compile is slow, then cached).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

BASELINE_MUL_MS = 40.0      # BASELINE.md: multiply incl. relin, RTX 4090
BASELINE_NTT_MS = 1.89      # BASELINE.md: forward NTT n=8192, RTX 4090


def _chain_total(step, x, iters, repeats=3):
    """Wall time of `iters` data-dependent steps inside ONE jit; min over
    repeats (min is the robust statistic for RPC-latency noise)."""
    import jax.lax as lax

    g = jax.jit(lambda v: lax.fori_loop(0, iters, lambda i, y: step(y), v),
                static_argnums=())
    g(x).block_until_ready()  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        g(x).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_chain(step, x, iters=50, lo=5):
    """Per-op device time via the two-point slope: the host<->device tunnel
    adds a large constant per dispatch (~30 ms RPC round-trip on this setup),
    so  t_op = (T(iters) - T(lo)) / (iters - lo)  cancels it exactly.  The
    chain has a data dependency, so ops cannot overlap.

    A non-positive slope means host jitter swamped the signal (e.g. a busy
    CPU); retry a few times before reporting the floor."""
    for _ in range(3):
        t_hi = _chain_total(step, x, iters)
        t_lo = _chain_total(step, x, lo)
        slope = (t_hi - t_lo) / (iters - lo)
        if slope > 0:
            return slope
    return 1e-9  # below measurement resolution


def _count_hlo_ops(fn, x):
    """(n_multiplies, n_cheap_ops) per element in the compiled HLO of fn(x),
    counting only full-tensor vector ops (broadcast-constant prep excluded by
    the shape filter)."""
    import re

    k, b, n = x.shape
    tag = f"u32[{k},{b},{n}]"
    txt = jax.jit(fn).lower(x).compile().as_text()
    cheap = {"add", "subtract", "and", "or", "xor", "shift-left",
             "shift-right-logical", "shift-right-arithmetic", "select",
             "compare"}
    n_mul = n_cheap = 0
    for m in re.finditer(
            re.escape(tag) + r"[^\s]*\s+([a-z\-]+)\(", txt):
        op = m.group(1)
        if op == "multiply":
            n_mul += 1
        elif op in cheap:
            n_cheap += 1
    return n_mul, n_cheap


def main():
    from fhe_tpu import FHE
    from fhe_tpu.params import SecurityParams, make_scheme_params
    from fhe_tpu.ops import ntt as _ntt
    from fhe_tpu.scheme import bfv

    n = 8192
    params = make_scheme_params(
        SecurityParams(poly_degree=n, log_q=90, hamming_weight=64))
    assert params.k == 3
    fhe = FHE(params, seed=0)
    pk, sk = fhe.keygen()
    rlk = fhe.relinkey_gen(sk)
    ct1 = fhe.encrypt(fhe.encode([5, 10, 15, 20]), pk)
    ct2 = fhe.encrypt(fhe.encode([3, 6, 9, 12]), pk)

    mul_s = bench_chain(
        lambda a: bfv.multiply(fhe.ctx, ct1.replace(data=a), ct2, rlk).data,
        ct1.data, iters=85)

    # leveled multiply (level 1, k-1 primes, precomputed level keys): the
    # fused kernels must serve every level (round-1 review item 5)
    ct1_l1 = fhe.mod_switch_to_next(ct1)
    ct2_l1 = fhe.mod_switch_to_next(ct2)
    rlk_l1 = fhe._rlk_at(rlk, 1)
    mul_l1_s = bench_chain(
        lambda a: bfv.multiply(fhe.ctx, ct1_l1.replace(data=a), ct2_l1,
                               rlk_l1, keys_at_level=True).data,
        ct1_l1.data, iters=85)

    # forward NTT on a [3, 1, 8192] residue stack (one polynomial, 3 primes)
    def fwd(x):
        if fhe.ctx.use_pallas:
            from fhe_tpu.ops import ntt_pallas as _npal
            return _npal.ntt_forward(x, fhe.ctx.ntt_q_pl)
        return _ntt.ntt_forward(x, fhe.ctx.ntt_q)

    ntt_s = bench_chain(fwd, ct1.data[:, :1, :], iters=405)

    # batched NTT throughput (64 polynomials per launch amortize fixed costs)
    big = jnp.tile(ct1.data[:, :1, :], (1, 64, 1))
    ntt64_s = bench_chain(fwd, big, iters=105) / 64.0

    # Harvey lazy-reduction sweep A/B (bit-exact; one select per stage
    # instead of three).  Lazy WON the r2 device A/B (1.0 vs 1.8 µs batched)
    # and is now the ntt_pallas default, so forward_ntt_ms above records the
    # lazy path; the eager alternate is kept here as the regression guard.
    ntt_eager_s = ntt64_eager_s = None
    if fhe.ctx.use_pallas:
        from fhe_tpu.ops import ntt_pallas as _npal_eg
        eg = lambda x: _npal_eg.ntt_forward(x, fhe.ctx.ntt_q_pl, lazy=False)
        eg_got = eg(ct1.data[:, :1, :])
        assert (jnp.asarray(eg_got) == jnp.asarray(
            fwd(ct1.data[:, :1, :]))).all(), "eager NTT mismatch on device"
        ntt_eager_s = bench_chain(eg, ct1.data[:, :1, :], iters=405)
        ntt64_eager_s = bench_chain(eg, big, iters=105) / 64.0

    # per-engine evidence for the multiply dispatch (round-1 review item 4):
    # the MXU four-step engine measured against the default fused-Pallas
    # path (context docstring records the verdict; the default follows
    # whichever engine wins here).
    ntt_mxu_s = ntt_mxu64_s = mul_mxu_s = None
    if jax.default_backend() == "tpu":
        fhe_mxu = FHE(params, seed=0, use_mxu=True)
        from fhe_tpu.ops import ntt_mxu as _nmxu
        mtb = fhe_mxu.ctx.ntt_q_mxu
        ntt_mxu_s = bench_chain(
            lambda x: _nmxu.ntt_forward(x, mtb), ct1.data[:, :1, :], iters=405)
        ntt_mxu64_s = bench_chain(
            lambda x: _nmxu.ntt_forward(x, mtb), big, iters=105) / 64.0
        pk_m, sk_m = fhe_mxu.keygen()
        rlk_m = fhe_mxu.relinkey_gen(sk_m)
        c1m = fhe_mxu.encrypt(fhe_mxu.encode([5, 10, 15, 20]), pk_m)
        c2m = fhe_mxu.encrypt(fhe_mxu.encode([3, 6, 9, 12]), pk_m)
        mul_mxu_s = bench_chain(
            lambda a: bfv.multiply(
                fhe_mxu.ctx, c1m.replace(data=a), c2m, rlk_m).data,
            c1m.data, iters=85)
        got_m = fhe_mxu.decode(fhe_mxu.decrypt(
            fhe_mxu.multiply(c1m, c2m, rlk_m), sk_m))
        assert list(got_m[:4]) == [15, 60, 135, 240], got_m[:4]

    # n = 16384 (the reference's declared max size, docs/API_REFERENCE.md:62):
    # fused-kernel forward NTT, cross-checked bit-exact against the jnp engine
    from fhe_tpu import primes as _primes16
    from fhe_tpu.ops import ntt_pallas as _npal16
    ps16 = _primes16.find_ntt_primes(16384, 3)
    tb16 = _ntt.build_tables(16384, ps16)
    pl16 = _npal16.build_pallas_tables(16384, ps16)
    import numpy as _np16
    x16 = jnp.asarray(_np16.stack([
        _np16.random.default_rng(5).integers(0, p, (1, 16384), dtype=_np16.uint32)
        for p in ps16]))
    got16 = _npal16.ntt_forward(x16, pl16)
    want16 = jax.jit(_ntt.ntt_forward)(x16, tb16)
    assert (_np16.asarray(got16) == _np16.asarray(want16)).all(), \
        "n=16384 Pallas NTT mismatch vs jnp engine"
    ntt16_s = bench_chain(lambda x: _npal16.ntt_forward(x, pl16),
                          x16, iters=205)

    # batched multiply throughput: 8 independent ciphertext pairs through
    # the batched fused kernels (bfv.multiply_batch — sublane-packed rows;
    # measured 2.6x over the vmapped single path on v5e)
    batch8 = jnp.stack([ct1.data] * 8)
    cts_b8 = [ct2] * 8

    def mul_batch_step(a_st):
        outs = bfv.multiply_batch(
            fhe.ctx, [ct1.replace(data=a_st[i]) for i in range(8)],
            cts_b8, rlk)
        return jnp.stack([o.data[:, :2] for o in outs])

    got_b8 = fhe.decode(fhe.decrypt(
        bfv.multiply_batch(fhe.ctx, [ct1] * 8, cts_b8, rlk)[3], sk))
    assert list(got_b8[:4]) == [15, 60, 135, 240], got_b8[:4]
    mul8_s = bench_chain(mul_batch_step, batch8, iters=45) / 8.0

    # Galois rotation (reference decl include/fhe.cuh:113-116).  Three
    # regimes: one power-of-two hop (automorphism + fused key switch),
    # hoisted (8 rotations of ONE ct sharing a single gadget decomposition,
    # per-rotation cost), and batched (8 independent cts through the
    # sublane-packed fused key-switch kernel, per-ct cost).
    gk = fhe.galoiskey_gen(sk)
    got_r = fhe.decode(fhe.decrypt(fhe.rotate_rows(ct1, 1, gk), sk))
    assert list(got_r[:3]) == [10, 15, 20], got_r[:4]
    rot_s = bench_chain(
        lambda a: bfv.rotate_rows(fhe.ctx, ct1.replace(data=a), 1, gk).data,
        ct1.data, iters=85)

    hoist_elems = tuple(pow(3, s, 2 * n) for s in range(1, 9))
    gk_h = fhe.galoiskey_gen(sk, elements=hoist_elems)
    p3h = fhe.ctx.ntt_q.p[:, None, None].astype(jnp.uint64)

    def rot_hoist_step(a):
        outs = bfv.apply_galois_hoisted(
            fhe.ctx, ct1.replace(data=a), hoist_elems, gk_h)
        # fold all 8 outputs so XLA cannot dead-code-eliminate any of them;
        # the mod keeps the carried value in residue range for the next link
        acc = jnp.stack([o.data for o in outs]).astype(jnp.uint64).sum(0)
        return (acc % p3h).astype(jnp.uint32)

    rot_hoist_s = bench_chain(rot_hoist_step, ct1.data, iters=45) / 8.0

    def rot_batch_step(a_st):
        outs = bfv.rotate_rows_batch(
            fhe.ctx, [ct1.replace(data=a_st[i]) for i in range(8)], 1, gk)
        return jnp.stack([o.data for o in outs])

    rotB_s = bench_chain(rot_batch_step, jnp.stack([ct1.data] * 8),
                         iters=45) / 8.0

    # encryption / decryption / keygen / add, all chained in-jit with the
    # same two-point slope (see bench_chain).
    import jax.lax as lax
    import jax.random as jrandom
    pt = fhe.encode([5, 10, 15, 20])
    enc_key = jrandom.PRNGKey(42)

    def bench_keyed(step, iters, lo=5):
        """Slope-timed chain of `step(key, carry) -> carry` (same retry
        discipline as bench_chain)."""
        def total(it):
            def body(i, carry):
                return step(jrandom.fold_in(enc_key, i), carry)
            g = jax.jit(lambda c: lax.fori_loop(0, it, body, c))
            z = jnp.zeros((), jnp.uint32)
            g(z).block_until_ready()
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                g(z).block_until_ready()
                best = min(best, time.perf_counter() - t0)
            return best
        for _ in range(3):
            slope = (total(iters) - total(lo)) / (iters - lo)
            if slope > 0:
                return slope
        return 1e-9

    # encryption (reference headline: ~8 ms at n=8192, README perf table)
    enc_s = bench_keyed(
        lambda k, c: bfv.encrypt(
            fhe.ctx, jrandom.fold_in(k, c), pk, pt).data[0, 0, 0],
        iters=85)

    # decryption (reference: ~3 ms); carry perturbs c0 slightly (decrypt of a
    # noisy ct is the same arithmetic)
    def dec_step(k, c):
        d = ct1.data.at[0, 0, 0].set(c % jnp.uint32(3))
        return bfv.decrypt(fhe.ctx, ct1.replace(data=d), sk).data[0]
    dec_s = bench_keyed(dec_step, iters=85)

    # batched encrypt/decrypt (B=8 through the sublane-packed kernels —
    # measured 5.5x/6.4x per-op over singles on v5e; these set the SIMD
    # values/s headline, the serving-throughput configuration)
    pts8 = [pt] * 8
    encB_s = bench_keyed(
        lambda k, c: bfv.encrypt_batch(
            fhe.ctx, k, pk, pts8)[0].data[0, 0, 0], iters=25) / 8.0
    cts8 = bfv.encrypt_batch(fhe.ctx, jrandom.PRNGKey(9), pk, pts8)

    def decB_step(k, c):
        d = ct1.data.at[0, 0, 0].set(c % jnp.uint32(3))
        return bfv.decrypt_batch(
            fhe.ctx, [ct1.replace(data=d)] + cts8[1:], sk)[0].data[0]

    decB_s = bench_keyed(decB_step, iters=45) / 8.0

    # homomorphic add (reference: ~0.1 ms).  A single add is ~1 us, far below
    # the RPC noise floor, so the slope needs thousands of iterations.
    add_s = max(bench_chain(
        lambda d: bfv.add(fhe.ctx, ct1.replace(data=d), ct2).data,
        ct1.data, iters=4005, lo=105), 1e-7)

    # keygen (reference: ~100 ms)
    kg_s = bench_keyed(
        lambda k, c: bfv.keygen(
            fhe.ctx, jrandom.fold_in(k, c))[0].data[0, 0, 0],
        iters=45)

    # modmul roofline: sustained mul_mod_shoup elementwise throughput on a
    # large resident tensor vs the VPU integer-multiply peak.  One Shoup
    # modmul = 4 32-bit multiplies (3 low via 16-bit limbs in XLA's int mul
    # lowering count as 1 vector op each + 1 mulhi = 4 muls) + 3 cheap ops.
    from fhe_tpu.ops import modmath as mmx
    big_x = jnp.tile(ct1.data[:, :1, :], (1, 256, 1))      # [3, 256, 8192]
    # index 1 = psi^(n/2), a non-trivial constant (index 0 is psi^0 = 1,
    # which XLA would constant-fold away, inflating the measurement)
    w = fhe.ctx.ntt_q.psi_br[:, None, 1:2]
    ws = fhe.ctx.ntt_q.psi_br_shoup[:, None, 1:2]
    p3 = fhe.ctx.ntt_q.p[:, None, None]
    modmul_s = bench_chain(
        lambda v: mmx.mul_mod_shoup(v, w, ws, p3), big_x, iters=505, lo=25)
    modmuls_per_s = big_x.size / modmul_s

    # -- VPU roofline (BASELINE.md north star: >= 80% of modmul roofline) ----
    # Peak VPU issue rate (vector u32 ops/s), analytic with stated
    # assumptions: 8x128 = 1024 lanes x 4 independent ALUs per lane x the
    # TensorCore clock.  The v5e clock is derived from the public per-chip
    # peak (197 bf16 TFLOP/s over 4 MXUs of 128x128 MACs, 2 flops each):
    # 197e12 / (4*128*128*2) = 1.50 GHz.  One Shoup modmul compiles to
    # exactly n_mul + n_cheap single-slot vector ops (counted from the
    # optimized HLO, not assumed), so the roofline rate is peak / op_count.
    # The model charges multiplies one ALU slot; if the hardware multiplier
    # is slower than 1/lane/cycle the bound is optimistic, which only
    # understates our percentage.
    VPU_PEAK_OPS = 1024 * 4 * 1.50e9          # 6.14e12 vector ops/s
    n_mul, n_cheap = _count_hlo_ops(
        lambda v: mmx.mul_mod_shoup(v, w, ws, p3), big_x)
    roofline_modmuls = VPU_PEAK_OPS / (n_mul + n_cheap)
    roofline_pct = 100.0 * modmuls_per_s / roofline_modmuls

    # BGV multiply (plain mod-q tensor product — no BEHZ rescale)
    from fhe_tpu.scheme import bgv as _bgv
    bfhe = FHE(params, seed=1, scheme="bgv")
    bpk, bsk = bfhe.keygen()
    brlk = bfhe.relinkey_gen(bsk)
    bct1 = bfhe.encrypt(bfhe.encode([5, 10, 15, 20]), bpk)
    bct2 = bfhe.encrypt(bfhe.encode([3, 6, 9, 12]), bpk)
    bgv_mul_s = bench_chain(
        lambda a: _bgv.multiply(bfhe.ctx, bct1.replace(data=a), bct2,
                                brlk).data,
        bct1.data, iters=85)
    bgot = bfhe.decode(bfhe.decrypt(bfhe.multiply(bct1, bct2, brlk), bsk))
    assert list(bgot[:4]) == [15, 60, 135, 240], bgot[:4]

    # k=8 throughput config (reference tests/test_fhe.cu:275-318 benchmarks
    # N=8192 at log q=218): multiply+relin and the relin share of it.
    import warnings as _warnings
    with _warnings.catch_warnings():
        _warnings.simplefilter("ignore")
        params8 = make_scheme_params(
            SecurityParams(poly_degree=n, log_q=218, hamming_weight=64))
    assert params8.k == 8
    fhe8 = FHE(params8, seed=2)
    pk8, sk8 = fhe8.keygen()
    rlk8 = fhe8.relinkey_gen(sk8)
    c8a = fhe8.encrypt(fhe8.encode([5, 10]), pk8)
    c8b = fhe8.encrypt(fhe8.encode([3, 6]), pk8)
    mul8k_s = bench_chain(
        lambda a: bfv.multiply(fhe8.ctx, c8a.replace(data=a), c8b, rlk8).data,
        c8a.data, iters=45)
    tens8_s = bench_chain(
        lambda a: bfv.multiply_no_relin(
            fhe8.ctx, c8a.replace(data=a), c8b).data[:, :2],
        c8a.data, iters=45)
    relin_share8 = max(0.0, 1.0 - tens8_s / mul8k_s)
    got8 = fhe8.decode(fhe8.decrypt(fhe8.multiply(c8a, c8b, rlk8), sk8))
    assert list(got8[:2]) == [15, 60], got8[:2]

    # correctness gate: the benchmark numbers only count if the math is right
    got = fhe.decode(fhe.decrypt(fhe.multiply(ct1, ct2, rlk), sk))
    assert list(got[:4]) == [15, 60, 135, 240], got[:4]

    mul_ms = mul_s * 1e3
    ntt_ms = ntt_s * 1e3
    ops_per_s = 1.0 / mul_s
    slot_count = fhe.slot_count
    result = {
        "metric": "bfv_ct_multiply_relin_n8192_k3",
        "value": round(ops_per_s, 3),
        "unit": "ops/s",
        "vs_baseline": round(ops_per_s / (1000.0 / BASELINE_MUL_MS), 3),
        "extra": {
            "multiply_relin_ms": round(mul_ms, 4),
            "multiply_relin_ms_batched": round(mul8_s * 1e3, 4),
            "forward_ntt_ms": round(ntt_ms, 4),
            "forward_ntt_ms_batched": round(ntt64_s * 1e3, 4),
            "forward_ntt_vs_baseline": round(BASELINE_NTT_MS / ntt_ms, 3),
            "forward_ntt_vs_baseline_batched": round(BASELINE_NTT_MS / (ntt64_s * 1e3), 3),
            "forward_ntt_eager_ms": (round(ntt_eager_s * 1e3, 4)
                                     if ntt_eager_s else None),
            "forward_ntt_eager_ms_batched": (round(ntt64_eager_s * 1e3, 4)
                                             if ntt64_eager_s else None),
            "forward_ntt_mxu_ms": (round(ntt_mxu_s * 1e3, 4)
                                   if ntt_mxu_s else None),
            "forward_ntt_mxu_ms_batched": (round(ntt_mxu64_s * 1e3, 4)
                                           if ntt_mxu64_s else None),
            "multiply_relin_ms_mxu_engine": (round(mul_mxu_s * 1e3, 4)
                                             if mul_mxu_s else None),
            "forward_ntt_ms_n16384": round(ntt16_s * 1e3, 4),
            "encrypt_ms": round(enc_s * 1e3, 4),
            "encrypt_vs_baseline": round(8.0 / (enc_s * 1e3), 3),
            "encrypt_ms_batched": round(encB_s * 1e3, 4),
            "decrypt_ms": round(dec_s * 1e3, 4),
            "decrypt_vs_baseline": round(3.0 / (dec_s * 1e3), 3),
            "decrypt_ms_batched": round(decB_s * 1e3, 4),
            "hom_add_ms": round(add_s * 1e3, 4),
            "hom_add_vs_baseline": round(0.1 / (add_s * 1e3), 3),
            "rotate_rows_ms": round(rot_s * 1e3, 4),
            "rotate_hoisted_ms_per_rot": round(rot_hoist_s * 1e3, 4),
            "rotate_rows_ms_batched": round(rotB_s * 1e3, 4),
            "keygen_ms": round(kg_s * 1e3, 4),
            "keygen_vs_baseline": round(100.0 / (kg_s * 1e3), 3),
            "simd_values_per_s": round(slot_count / encB_s, 1),
            "simd_vs_baseline": round((slot_count / encB_s) / 256000.0, 3),
            "modmul_per_s": round(modmuls_per_s, 1),
            "modmul_gops": round(modmuls_per_s / 1e9, 3),
            "modmul_roofline_pct": round(roofline_pct, 1),
            "modmul_roofline_gops": round(roofline_modmuls / 1e9, 1),
            "modmul_hlo_op_mix": [n_mul, n_cheap],
            "multiply_relin_ms_level1": round(mul_l1_s * 1e3, 4),
            "leveled_per_prime_ratio": round(
                (mul_l1_s / (params.k - 1)) / (mul_s / params.k), 3),
            "multiply_relin_ms_k8": round(mul8k_s * 1e3, 4),
            "relin_share_k8": round(relin_share8, 3),
            "bgv_multiply_relin_ms": round(bgv_mul_s * 1e3, 4),
            "bgv_multiply_vs_baseline": round(
                BASELINE_MUL_MS / (bgv_mul_s * 1e3), 3),
            "device": str(jax.devices()[0]),
            "n": n,
            "rns_primes": params.k,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

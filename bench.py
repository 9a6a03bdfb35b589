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

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

BASELINE_MUL_MS = 40.0      # BASELINE.md: multiply incl. relin, RTX 4090
BASELINE_NTT_MS = 1.89      # BASELINE.md: forward NTT n=8192, RTX 4090


def bench_chain(step, x, iters=50):
    """Time `step` chained `iters` times inside ONE jit with a data
    dependency.  Per-call host timing through the axon tunnel is unreliable
    at sub-ms scales (async dispatch + RPC artifacts); chaining makes device
    time dominate and was validated against the bf16 matmul roofline."""
    import jax.lax as lax

    g = jax.jit(lambda v: lax.fori_loop(0, iters, lambda i, y: step(y), v))
    g(x).block_until_ready()  # compile + warm
    t0 = time.perf_counter()
    g(x).block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    from fhe_tpu import FHE, primes
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
        ct1.data, iters=20)

    # forward NTT on a [3, 1, 8192] residue stack (one polynomial, 3 primes)
    def fwd(x):
        if fhe.ctx.use_pallas:
            from fhe_tpu.ops import ntt_pallas as _npal
            return _npal.ntt_forward(x, fhe.ctx.ntt_q_pl)
        return _ntt.ntt_forward(x, fhe.ctx.ntt_q)

    ntt_s = bench_chain(fwd, ct1.data[:, :1, :])

    # batched NTT throughput (64 polynomials per launch amortize fixed costs)
    big = jnp.tile(ct1.data[:, :1, :], (1, 64, 1))
    ntt64_s = bench_chain(fwd, big) / 64.0

    # batched multiply throughput (8 independent ciphertext pairs via vmap)
    batch8 = jnp.stack([ct1.data] * 8)
    mul8_s = bench_chain(
        jax.vmap(lambda a: bfv.multiply(
            fhe.ctx, ct1.replace(data=a), ct2, rlk).data),
        batch8, iters=20) / 8.0

    # correctness gate: the benchmark numbers only count if the math is right
    got = fhe.decode(fhe.decrypt(fhe.multiply(ct1, ct2, rlk), sk))
    assert list(got[:4]) == [15, 60, 135, 240], got[:4]

    mul_ms = mul_s * 1e3
    ntt_ms = ntt_s * 1e3
    ops_per_s = 1.0 / mul_s
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
            "device": str(jax.devices()[0]),
            "n": n,
            "rns_primes": params.k,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

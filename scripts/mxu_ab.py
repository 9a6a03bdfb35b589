#!/usr/bin/env python3
"""MXU four-step engine vs fused-Pallas VPU engine: the regime matrix.

VERDICT-r2 weak #5: the MXU engine lost every configuration bench.py covers
(n=8192, k=3) but no wider sweep existed — "find its crossover or bound
it".  This script runs INTERLEAVED A/Bs (bench.py harness: median of 7
round-robin two-point slopes per chain) over

    n in {8192, 16384, 32768} x k in {3, 8} x batch in {1, 64}

for the forward NTT, plus the full multiply+relin at n in {8192, 16384},
and writes a JSON table.  The make_context dispatch default (use_mxu=False)
cites this artifact; rerun on device with

    python scripts/mxu_ab.py            # writes MXU_AB.json

Requires the real TPU (the MXU path is pointless on CPU).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

# per-platform cache (CPU entries written by TPU-tunnel processes carry
# foreign machine features and can SIGILL/segfault when loaded here)
import os as _os
jax.config.update(
    "jax_compilation_cache_dir",
    "/tmp/jax_cache_cpu"
    if _os.environ.get("JAX_PLATFORMS", "").startswith("cpu")
    else "/tmp/jax_cache")

import bench  # the repo-root harness: Chain / run_rounds


def main():
    from fhe_tpu import FHE, primes
    from fhe_tpu.params import SecurityParams, make_scheme_params
    from fhe_tpu.ops import ntt as _ntt
    from fhe_tpu.ops import ntt_pallas as _npal
    from fhe_tpu.ops import ntt_mxu as _nmxu
    from fhe_tpu.scheme import bfv
    import warnings

    assert jax.default_backend() == "tpu", "run on the TPU"
    chains = []
    rng = np.random.default_rng(7)

    # ---- forward NTT sweep ----
    for n in (8192, 16384, 32768):
        for k in (3, 8):
            ps = primes.find_ntt_primes(n, k)
            pl = _npal.build_pallas_tables(n, ps)
            mx = _nmxu.build_mxu_tables(n, ps)
            tb = _ntt.build_tables(n, ps)
            x1 = jnp.asarray(np.stack(
                [rng.integers(0, p, (1, n), dtype=np.uint32) for p in ps]))
            # correctness: both engines' polymul agree with the jnp engine
            got_pl = _npal.ntt_forward(x1, pl)
            want = jax.jit(_ntt.ntt_forward)(x1, tb)
            assert (np.asarray(got_pl) == np.asarray(want)).all(), (n, k)
            pm_mx = np.asarray(_nmxu.polymul_negacyclic(x1, x1, mx))
            pm_ref = np.asarray(jax.jit(_ntt.polymul_negacyclic)(x1, x1, tb))
            assert (pm_mx == pm_ref).all(), ("mxu polymul", n, k)
            batches = (1,) if n == 32768 else (1, 64)
            for B in batches:
                xb = x1 if B == 1 else jnp.tile(x1, (1, B, 1))
                hi = max(55, 3000000 // (n * k * B))
                lo = max(5, hi // 20)
                chains.append(bench.Chain(
                    f"pl_n{n}_k{k}_b{B}",
                    lambda v, _t=pl: _npal.ntt_forward(v, _t),
                    xb, hi=hi, lo=lo, div=float(B)))
                chains.append(bench.Chain(
                    f"mxu_n{n}_k{k}_b{B}",
                    lambda v, _t=mx: _nmxu.ntt_forward(v, _t),
                    xb, hi=hi, lo=lo, div=float(B)))
        print(f"  built n={n}", flush=True)

    # ---- full multiply+relin A/B ----
    for n, logq in ((8192, 90), (16384, 90), (8192, 218)):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            params = make_scheme_params(SecurityParams(
                poly_degree=n, log_q=logq, hamming_weight=64))
        k = params.k
        for use_mxu in (False, True):
            fhe = FHE(params, seed=0, use_mxu=use_mxu)
            pk, sk = fhe.keygen()
            rlk = fhe.relinkey_gen(sk)
            a = fhe.encrypt(fhe.encode([5, 10]), pk)
            b = fhe.encrypt(fhe.encode([3, 6]), pk)
            got = fhe.decode(fhe.decrypt(fhe.multiply(a, b, rlk), sk))
            assert list(got[:2]) == [15, 60], (n, logq, use_mxu, got[:2])
            tag = "mxu" if use_mxu else "pl"
            ctx = fhe.ctx
            chains.append(bench.Chain(
                f"mul_{tag}_n{n}_k{k}",
                lambda v, _c=ctx, _a=a, _b=b, _r=rlk: bfv.multiply(
                    _c, _a.replace(data=v), _b, _r).data,
                a.data, hi=55, lo=5))
        print(f"  built mul n={n} logq={logq}", flush=True)

    res = bench.run_rounds(chains)
    table = {name: {"us": round(r[0] * 1e6, 2), "jitter_pct": r[1]}
             for name, r in res.items()}
    # verdict per configuration
    verdicts = {}
    for name in list(table):
        if name.startswith("pl_"):
            other = "mxu_" + name[3:]
            if other in table:
                verdicts[name[3:]] = {
                    "vpu_us": table[name]["us"],
                    "mxu_us": table[other]["us"],
                    "winner": ("vpu" if table[name]["us"] <=
                               table[other]["us"] else "mxu"),
                }
        if name.startswith("mul_pl_"):
            other = "mul_mxu_" + name[7:]
            if other in table:
                verdicts["mul_" + name[7:]] = {
                    "vpu_us": table[name]["us"],
                    "mxu_us": table[other]["us"],
                    "winner": ("vpu" if table[name]["us"] <=
                               table[other]["us"] else "mxu"),
                }
    out = {"metric": "mxu_vs_vpu_ab", "device": str(jax.devices()[0]),
           "harness": "median-of-7 interleaved two-point slopes",
           "table": table, "verdicts": verdicts}
    path = os.environ.get("MXU_AB_OUT", "MXU_AB.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(verdicts, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

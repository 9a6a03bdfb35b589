"""Run the ILP-exposed modmul roofline probes on the real TPU.

Settles VERDICT r3 next-step #1: does giving the VPU k independent
dependency chains per element raise modmul throughput above the
single-chain rate?  If yes, the kernels are latency-bound and have
headroom; if no, the single-chain rate is the issue ceiling.

Usage: python scripts/ilp_probe.py   (prints one JSON line)
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

sys.path.insert(0, ".")
from fhe_tpu.ops import modmath as mm            # noqa: E402
from fhe_tpu.utils import ubench                 # noqa: E402


def _median(xs):
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else 0.5 * (s[m - 1] + s[m])


def _hard_sync(r):
    jax.block_until_ready(r)
    np.asarray(r[0, 0])


def main():
    p = 1073479681
    w = 123456789 % p
    w_sh = mm.shoup_precompute(w, p)
    mu = mm.barrett_precompute(p)
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, p, (256, 8192), dtype=np.uint32))
    elems = x.size
    REPS = 64

    configs = [
        ("lazy_ilp1", "lazy", 1, 25, 3),
        ("lazy_ilp2", "lazy", 2, 13, 3),
        ("lazy_ilp4", "lazy", 4, 7, 1),
        ("cheap17_ilp1", "cheap17", 1, 25, 3),
        ("cheap17_ilp4", "cheap17", 4, 7, 1),
        ("mul17_ilp1", "mul17", 1, 25, 3),
        ("mul17_ilp4", "mul17", 4, 7, 1),
    ]

    fns = {}
    for name, variant, ilp, hi, lo in configs:
        def make(variant=variant, ilp=ilp, iters=None):
            def f(v):
                out = v
                for _ in range(iters):
                    out = ubench.modmul_chain(
                        out, np.uint32(w), np.uint32(w_sh), np.uint32(p),
                        np.uint32(mu), reps=REPS, variant=variant, ilp=ilp)
                return out
            return f
        fns[name] = (jax.jit(make(iters=hi)), jax.jit(make(iters=lo)),
                     hi, lo, ilp)

    # warm
    for name, (g_hi, g_lo, hi, lo, ilp) in fns.items():
        _hard_sync(g_hi(x))
        _hard_sync(g_lo(x))

    slopes = {name: [] for name in fns}
    for _ in range(7):
        for name, (g_hi, g_lo, hi, lo, ilp) in fns.items():
            t0 = time.perf_counter()
            r = g_hi(x)
            jax.block_until_ready(r)
            t_hi = time.perf_counter() - t0
            _hard_sync(r)
            t0 = time.perf_counter()
            r = g_lo(x)
            jax.block_until_ready(r)
            t_lo = time.perf_counter() - t0
            _hard_sync(r)
            slopes[name].append((t_hi - t_lo) / (hi - lo))

    out = {}
    for name, (g_hi, g_lo, hi, lo, ilp) in fns.items():
        t = _median(slopes[name])
        jit = 100.0 * _median([abs(s - t) for s in slopes[name]]) / t
        gops = elems * REPS * ilp / t / 1e9
        out[name] = {"gops": round(gops, 2), "jitter_pct": round(jit, 1)}

    # mix-model prediction for the lazy modmul (6 mul + 11 cheap)
    r_mul = 17.0 * out["mul17_ilp1"]["gops"] / 17.0
    r_cheap = out["cheap17_ilp1"]["gops"]
    t_pred = 6.0 / (17.0 * r_mul) + 11.0 / (17.0 * r_cheap)
    out["predicted_lazy_gops"] = round(1.0 / t_pred, 2)
    out["measured_lazy_gops"] = out["lazy_ilp1"]["gops"]
    out["roofline_pct_mix"] = round(
        100.0 * out["lazy_ilp1"]["gops"] / out["predicted_lazy_gops"], 1)
    best_ilp = max(out["lazy_ilp2"]["gops"], out["lazy_ilp4"]["gops"])
    out["ilp_ceiling_binds"] = bool(
        best_ilp <= out["lazy_ilp1"]["gops"] * 1.05)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

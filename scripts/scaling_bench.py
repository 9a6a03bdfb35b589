#!/usr/bin/env python3
"""Multi-chip scaling benchmark: ciphertext-ops/s vs mesh size.

TPU realization of the reference's multi-GPU design claim ("3.8x on 4 GPUs",
``docs/ARCHITECTURE.md:499-511``): shard the RNS prime axis (and batch axis)
of the BFV multiply pipeline over a mesh and report scaling efficiency at
each device count.

On a real pod slice, run under the default platform; without one, run on
virtual CPU devices for *correctness* of the sharded program (numbers then
reflect host cores, not chips):

  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \\
      python scripts/scaling_bench.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
# The session TPU plugin ignores JAX_PLATFORMS; honor it explicitly so the
# virtual-device recipe in the docstring works.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    from fhe_tpu import FHE
    from fhe_tpu.params import SecurityParams, make_scheme_params
    from fhe_tpu.parallel.mesh import make_mesh
    from fhe_tpu.scheme import bfv

    n_dev = len(jax.devices())
    n = int(os.environ.get("SCALING_N", "4096"))
    batch = int(os.environ.get("SCALING_BATCH", "32"))
    params = make_scheme_params(
        SecurityParams(poly_degree=n, log_q=120, hamming_weight=64))
    fhe = FHE(params, seed=0)
    pk, sk = fhe.keygen()
    rlk = fhe.relinkey_gen(sk)
    ct1 = fhe.encrypt(fhe.encode([5, 10, 15, 20]), pk)
    ct2 = fhe.encrypt(fhe.encode([3, 6, 9, 12]), pk)
    stack = jnp.broadcast_to(ct1.data, (batch, *ct1.data.shape))

    vm = jax.vmap(
        lambda a: bfv.multiply(fhe.ctx, ct1.replace(data=a), ct2, rlk).data)

    results = []
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]
    base_rate = None
    for d in sizes:
        mesh = make_mesh({"dp": d}, devices=jax.devices()[:d])
        sharded = jax.device_put(stack, NamedSharding(mesh, P("dp")))
        f = jax.jit(vm, out_shardings=NamedSharding(mesh, P("dp")))
        f(sharded).block_until_ready()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            f(sharded).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        rate = batch / best
        if base_rate is None:
            base_rate = rate
        results.append({
            "devices": d,
            "ct_mul_per_s": round(rate, 2),
            "speedup": round(rate / base_rate, 3),
            "efficiency": round(rate / base_rate / d, 3),
        })
        print(f"  {d} device(s): {rate:10.1f} ct-mul/s  "
              f"speedup {rate / base_rate:6.2f}x  "
              f"efficiency {rate / base_rate / d * 100:5.1f}%")

    print(json.dumps({
        "metric": "bfv_ct_multiply_scaling",
        "platform": jax.devices()[0].platform,
        "n": n, "batch": batch, "results": results,
    }))


if __name__ == "__main__":
    main()

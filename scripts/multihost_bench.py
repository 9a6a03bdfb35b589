#!/usr/bin/env python3
"""Multi-host scaling benchmark — run one copy per host of a pod slice.

TPU realization of the BASELINE north star ("scaling efficiency at 1 chip /
1 host / >= 2 hosts"): initializes jax.distributed, builds a global mesh over
every chip in the slice, and measures data-parallel BFV ciphertext-multiply
throughput with the global batch sharded across all chips (DCN between
hosts, ICI within — the sharding layout keeps every collective on ICI).

Usage (same command on every host, e.g. via gcloud compute tpus ssh --worker=all):

    python scripts/multihost_bench.py \\
        --coordinator=<host0-ip>:8476 --num-hosts=2 --host-id=$WORKER_ID

Single-host (no flags): runs on the local devices only, which is also what
CI smoke-tests (scripts/scaling_bench.py covers the virtual-mesh variant).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None,
                    help="host0 address:port for jax.distributed")
    ap.add_argument("--num-hosts", type=int, default=1)
    ap.add_argument("--host-id", type=int, default=0)
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--batch-per-chip", type=int, default=4)
    args = ap.parse_args()

    import jax
    if args.coordinator:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_hosts,
            process_id=args.host_id)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from fhe_tpu import FHE
    from fhe_tpu.params import SecurityParams, make_scheme_params
    from fhe_tpu.parallel.mesh import make_mesh
    from fhe_tpu.scheme import bfv

    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    batch = args.batch_per_chip * n_global

    params = make_scheme_params(
        SecurityParams(poly_degree=args.n, log_q=90, hamming_weight=64))
    fhe = FHE(params, seed=0)
    pk, sk = fhe.keygen()
    rlk = fhe.relinkey_gen(sk)
    ct1 = fhe.encrypt(fhe.encode([5, 10, 15, 20]), pk)
    ct2 = fhe.encrypt(fhe.encode([3, 6, 9, 12]), pk)

    mesh = make_mesh({"dp": n_global})
    sharding = NamedSharding(mesh, P("dp"))
    stack = jnp.broadcast_to(ct1.data, (batch, *ct1.data.shape))
    stack = jax.device_put(stack, sharding)

    f = jax.jit(
        jax.vmap(lambda a: bfv.multiply(
            fhe.ctx, ct1.replace(data=a), ct2, rlk).data),
        out_shardings=sharding)
    f(stack).block_until_ready()
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        f(stack).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    rate = batch / best

    if args.host_id == 0:
        print(json.dumps({
            "metric": "bfv_ct_multiply_multihost",
            "hosts": args.num_hosts,
            "chips_local": n_local,
            "chips_global": n_global,
            "global_batch": batch,
            "ct_mul_per_s": round(rate, 1),
            "ct_mul_per_s_per_chip": round(rate / n_global, 1),
        }))


if __name__ == "__main__":
    main()

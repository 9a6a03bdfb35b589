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
    ap.add_argument("--out", default=None,
                    help="also write host 0's JSON line to this file")
    args = ap.parse_args()

    import jax
    # honor a CPU platform request BEFORE distributed init: the session TPU
    # plugin ignores the env var (CLAUDE.md), and the 2-process localhost
    # smoke test (tests/test_multihost.py) runs on host devices
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    if args.coordinator:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_hosts,
            process_id=args.host_id)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    # per-platform cache: CPU executables written by TPU-tunnel-attached
    # processes carry the REMOTE host's machine features and segfault here
    cache = ("/tmp/jax_cache" if jax.default_backend() == "tpu"
             else "/tmp/jax_cache_cpu")
    jax.config.update("jax_compilation_cache_dir", cache)

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
    host_stack = np.broadcast_to(np.asarray(ct1.data),
                                 (batch, *ct1.data.shape))
    # every process holds the same full host copy -> build the global array
    # shard-by-shard (device_put of a host array to a multi-process sharding
    # is not supported)
    stack = jax.make_array_from_callback(
        host_stack.shape, sharding, lambda idx: host_stack[idx])

    f = jax.jit(
        jax.vmap(lambda a: bfv.multiply(
            fhe.ctx, ct1.replace(data=a), ct2, rlk).data),
        out_shardings=sharding)

    def hard_sync(r):
        # identical-dispatch dedup guard (bench.py:_hard_sync): force a
        # host readback so the next timed dispatch is real work
        r.block_until_ready()
        np.asarray(jax.device_get(r.addressable_shards[0].data))[0, 0, 0, 0]

    r = f(stack)
    hard_sync(r)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        r = f(stack)
        r.block_until_ready()
        best = min(best, time.perf_counter() - t0)
        hard_sync(r)
    rate = batch / best

    # decrypt-correctness gate on host 0's first shard
    local0 = np.asarray(jax.device_get(r.addressable_shards[0].data))[0]
    got = fhe.decode(fhe.decrypt(ct1.replace(data=jnp.asarray(local0)), sk))
    assert list(got[:4]) == [15, 60, 135, 240], got[:4]

    if args.host_id == 0:
        line = json.dumps({
            "metric": "bfv_ct_multiply_multihost",
            "hosts": args.num_hosts,
            "processes": jax.process_count(),
            "platform": jax.default_backend(),
            "chips_local": n_local,
            "chips_global": n_global,
            "global_batch": batch,
            "ct_mul_per_s": round(rate, 1),
            "ct_mul_per_s_per_chip": round(rate / n_global, 1),
        })
        print(line)
        if args.out:
            with open(args.out, "w") as fh:
                fh.write(line + "\n")


if __name__ == "__main__":
    main()

"""Weak-scaling measurement of the sharded trim step over a device mesh.

For N in {1, 2, 4, ...} up to the available device count, runs the full
sharded trim step (quality trim + adapter DP + psum statistics) over an
N-device mesh with a CONSTANT per-device batch (weak scaling) and reports
step time, aggregate throughput, and parallel efficiency vs N=1.

Two decompositions make the result interpretable:

- **psum-present vs psum-free**: the identical step compiled without the
  collective statistics reduction. The delta is the collective cost —
  the only component that grows with mesh size on real hardware.
- **aggregate throughput vs host cores**: on the VIRTUAL CPU mesh the N
  "devices" are host threads sharing ``os.cpu_count()`` physical cores,
  so aggregate reads/s saturates at roughly the core count regardless of
  N — weak-scaling "efficiency" on such a mesh measures host CPU
  saturation, NOT interconnect scaling. The ``analysis`` block states
  which regime the numbers are in.

Writes one JSON object (also returned by :func:`measure`).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(max_devices=None, per_device=8192, read_len=100, trials=10):
    import numpy as np

    import jax
    import jax.numpy as jnp

    from atropos_tpu.align.batched import _error_thresholds, _initial_state_np
    from atropos_tpu.align.flags import (
        START_WITHIN_SEQ2,
        STOP_WITHIN_SEQ1,
        STOP_WITHIN_SEQ2,
    )
    from atropos_tpu.parallel import (
        build_sharded_trim_step,
        make_mesh,
        shard_batch,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    BACK = START_WITHIN_SEQ2 | STOP_WITHIN_SEQ2 | STOP_WITHIN_SEQ1
    adapter = "AGATCGGAAGAGCACACGTCTGAACTCCAGTCA"
    m = len(adapter)
    err = 0.1
    k = int(err * m)

    devices = jax.devices()
    if max_devices is not None:
        devices = devices[:max_devices]
    sizes = []
    n = 1
    while n <= len(devices):
        sizes.append(n)
        n *= 2

    rng = np.random.RandomState(3)
    results = {}
    for n in sizes:
        mesh = make_mesh(devices[:n])
        batch = per_device * n
        reads = np.frombuffer(b"ACGT", np.uint8)[
            rng.randint(0, 4, size=(batch, read_len))
        ].astype(np.int32)
        quals = (33 + rng.randint(2, 40, size=(batch, read_len))).astype(
            np.int32
        )
        lengths = np.full(batch, read_len, np.int32)
        init = _initial_state_np(lengths, m=m, k=k, flags=BACK, ins_cost=1)

        ref_arr = jnp.asarray(
            np.frombuffer(adapter.encode(), np.uint8).astype(np.int32)
        )
        thresholds = jnp.asarray(_error_thresholds(m, err))
        reads_s, quals_s, lengths_s = shard_batch(
            mesh, jnp.asarray(reads), jnp.asarray(quals), jnp.asarray(lengths)
        )
        put = lambda arr, spec: jax.device_put(arr, NamedSharding(mesh, spec))
        args = (
            reads_s, quals_s, lengths_s,
            put(ref_arr, P(None)), put(thresholds, P(None)),
            put(jnp.asarray(init[0]), P(None, "reads")),
            put(jnp.asarray(init[1]), P(None, "reads")),
            put(jnp.asarray(init[2]), P(None, "reads")),
            put(jnp.asarray(init[3]), P(None, "reads")),
        )

        def timed(step):
            out = step(*args)
            jax.block_until_ready(out)
            best = float("inf")
            for _ in range(trials):
                t0 = time.time()
                out = step(*args)
                jax.block_until_ready(out)
                best = min(best, time.time() - t0)
            return best

        common = dict(
            m=m, k=k, flags=BACK, min_overlap=3, ins_cost=1, max_len_hist=128
        )
        best = timed(build_sharded_trim_step(mesh, **common))
        best_nopsum = timed(
            build_sharded_trim_step(mesh, with_psum=False, **common)
        )
        results[n] = dict(
            batch=batch,
            step_seconds=round(best, 5),
            step_seconds_no_psum=round(best_nopsum, 5),
            psum_overhead_pct=round(100.0 * (best - best_nopsum) / best, 2),
            reads_per_sec=round(batch / best, 1),
        )

    base = results[1]["step_seconds"]
    base_rps = results[1]["reads_per_sec"]
    for n, entry in results.items():
        # weak scaling: perfect efficiency = constant step time
        entry["efficiency"] = round(base / entry["step_seconds"], 4)
        entry["aggregate_speedup"] = round(
            entry["reads_per_sec"] / base_rps, 3
        )

    cores = os.cpu_count()
    backend = jax.default_backend()
    largest = results[max(results)]
    if backend == "cpu":
        analysis = (
            "virtual CPU mesh: {n} mesh 'devices' share {c} physical "
            "cores, so aggregate throughput saturates near the core count "
            "(measured plateau: {agg}x the 1-device rate) and weak-scaling "
            "efficiency is bounded by ~cores/N = {bound:.2f} regardless of "
            "the program; the psum-free step shows the collective cost "
            "itself is {pp}% of the step — the efficiency loss is host-CPU "
            "saturation, not communication"
        ).format(
            n=max(results), c=cores, agg=largest["aggregate_speedup"],
            bound=min(1.0, cores / max(results)),
            pp=largest["psum_overhead_pct"],
        )
    else:
        analysis = "real device mesh: efficiency reflects chip scaling"
    return dict(
        mode="weak-scaling",
        per_device_batch=per_device,
        read_len=read_len,
        trials=trials,
        backend=backend,
        host_cores=cores,
        analysis=analysis,
        sizes=results,
    )


def main():
    out = measure()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

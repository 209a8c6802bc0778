"""Weak-scaling measurement of the sharded trim step over a device mesh.

For N in {1, 2, 4, ...} up to the available device count, runs the full
sharded trim step (quality trim + adapter DP + psum statistics) over an
N-device mesh with a CONSTANT per-device batch (weak scaling) and reports
step time and parallel efficiency vs N=1. On the virtual CPU mesh the
devices are host threads, so absolute times are indicative only — the
metric tracked is the collective/overhead trend the BASELINE asks for
(real multi-chip hardware permitting later).

Writes one JSON object (also returned by :func:`measure`).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(max_devices=None, per_device=2048, read_len=100, trials=3):
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

        step = build_sharded_trim_step(
            mesh, m=m, k=k, flags=BACK, min_overlap=3, ins_cost=1,
            max_len_hist=128,
        )
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
        out = step(*args)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(trials):
            t0 = time.time()
            out = step(*args)
            jax.block_until_ready(out)
            best = min(best, time.time() - t0)
        results[n] = dict(
            batch=batch,
            step_seconds=round(best, 5),
            reads_per_sec=round(batch / best, 1),
        )

    base = results[1]["step_seconds"]
    for n, entry in results.items():
        # weak scaling: perfect efficiency = constant step time
        entry["efficiency"] = round(base / entry["step_seconds"], 4)
    return dict(
        mode="weak-scaling",
        per_device_batch=per_device,
        read_len=read_len,
        backend=jax.default_backend(),
        note=(
            "virtual CPU mesh devices are host threads; efficiency tracks "
            "collective/overhead trend, not real chip scaling"
            if jax.default_backend() == "cpu"
            else "real device mesh"
        ),
        sizes=results,
    )


def main():
    out = measure()
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Host<->device link throughput probe.

Measures H2D (device_put) and D2H (np.asarray fetch) bandwidth for a
range of buffer sizes on the attached accelerator, plus dispatch latency
for a trivial kernel. Feeds the committed end-to-end phase budget
(PERF.md): on the dev tunnel the link is the end-to-end bottleneck, so
the trim pipeline's reads/s ceiling is (link MB/s) / (bytes-per-read).

Usage: python tools/link_probe.py
"""
import json
import sys
import time

import numpy as np


def bench(fn, *, reps=5, warmup=1):
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times), sum(times) / len(times)


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print("backend:", jax.default_backend(), dev, file=sys.stderr)

    out = {"backend": jax.default_backend(), "h2d": {}, "d2h": {}}

    for mb in (0.25, 1, 4, 16):
        nbytes = int(mb * 1024 * 1024)
        host = np.random.randint(0, 255, size=nbytes, dtype=np.uint8)

        def h2d():
            jax.device_put(host, dev).block_until_ready()

        tmin, tavg = bench(h2d)
        out["h2d"]["%gMB" % mb] = round(nbytes / tmin / 1e6, 2)

        # force device-computed arrays (device_put keeps a host-side copy
        # that np.asarray would read back without touching the link); a
        # fresh array per rep avoids the per-array fetch cache
        xor = jax.jit(lambda x, s: x ^ s)
        base = jax.device_put(host, dev)
        pool = [xor(base, i) for i in range(7)]
        for arr in pool:
            arr.block_until_ready()
        it = iter(pool)

        def d2h():
            np.asarray(next(it))

        tmin, tavg = bench(d2h)
        out["d2h"]["%gMB" % mb] = round(nbytes / tmin / 1e6, 2)

    # dispatch+roundtrip latency for a tiny kernel
    f = jax.jit(lambda x: x + 1)
    small = jnp.zeros(8, jnp.int32)
    f(small).block_until_ready()
    tmin, _ = bench(lambda: np.asarray(f(small)))
    out["latency_ms"] = round(tmin * 1e3, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()

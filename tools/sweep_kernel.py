"""Sweep Pallas kernel tunables (BLOCK, BATCH) on the attached accelerator.

Usage: python tools/sweep_kernel.py [BLOCK ...]
Prints one line per config with the pipelined-window reads/s.
"""
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ADAPTER = "AGATCGGAAGAGCACACGTCTGAACTCCAGTCA"
READ_LEN = 100
ITERS = 64
TRIALS = 5


def bench(block, batch):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from bench import make_read_matrix
    from atropos_tpu.align.flags import (
        START_WITHIN_SEQ2,
        STOP_WITHIN_SEQ1,
        STOP_WITHIN_SEQ2,
    )
    from atropos_tpu.align import pallas_kernel as pk

    pk.PallasAligner.BLOCK = block
    back = START_WITHIN_SEQ2 | STOP_WITHIN_SEQ2 | STOP_WITHIN_SEQ1
    aligner = pk.PallasAligner(ADAPTER, 0.1, back, min_overlap=3)
    arr = make_read_matrix(batch, READ_LEN, ADAPTER)
    L_pad = ((arr.shape[1] + 7) // 8) * 8
    reads_T = np.zeros((L_pad, batch), np.uint8)
    reads_T[: arr.shape[1]] = arr.T
    len_col = np.full((1, batch), arr.shape[1], np.int32)
    kernel = aligner._get_kernel(reads_T.shape[0], batch)
    d_reads = jax.device_put(jnp.asarray(reads_T))
    d_len = jax.device_put(jnp.asarray(len_col))

    @jax.jit
    def window(reads, lens):
        def body(_, out):
            dep = jnp.right_shift(out[6:7, :], 31)
            return kernel(reads, lens + dep)

        return jax.lax.fori_loop(0, ITERS - 1, body, kernel(reads, lens))

    def run():
        return np.asarray(window(d_reads, d_len))

    run()
    best = float("inf")
    for _ in range(TRIALS):
        t0 = time.time()
        run()
        best = min(best, (time.time() - t0) / ITERS)
    return batch / best


def main():
    blocks = [int(b) for b in sys.argv[1:]] or [256, 512, 1024]
    batches = [int(b) for b in os.environ.get(
        "SWEEP_BATCHES", "16384,65536").split(",")]
    for block in blocks:
        for batch in batches:
            if batch % block:
                continue
            rps = bench(block, batch)
            print(
                "BLOCK=%d BATCH=%d -> %.0f reads/s" % (block, batch, rps),
                flush=True,
            )


if __name__ == "__main__":
    main()

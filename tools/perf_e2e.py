"""End-to-end turbo trim perf probe (real device).

Generates a synthetic FASTQ (same composition as bench.py: 100 bp reads,
50% carrying the TruSeq adapter at a random position), runs the full trim
command through the turbo path (parse -> device kernels -> format ->
bytes), and prints a phase breakdown so the host/device split is visible.

Usage: python tools/perf_e2e.py [n_reads]
"""
import cProfile
import io
import os
import pstats
import random
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ADAPTER = "AGATCGGAAGAGCACACGTCTGAACTCCAGTCA"
READ_LEN = 100


def make_fastq(path, n_reads, seed=0):
    rng = random.Random(seed)
    qual = "I" * READ_LEN
    with open(path, "w") as fh:
        for i in range(n_reads):
            read = "".join(rng.choice("ACGT") for _ in range(READ_LEN))
            if rng.random() < 0.5:
                pos = rng.randrange(20, READ_LEN - 5)
                alen = min(len(ADAPTER), READ_LEN - pos)
                read = (read[:pos] + ADAPTER[:alen] + read[pos + alen:])[:READ_LEN]
            fh.write("@read{}\n{}\n+\n{}\n".format(i, read, qual))


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    profile = "--profile" in sys.argv
    tmp = "/tmp/perf_e2e"
    os.makedirs(tmp, exist_ok=True)
    inp = os.path.join(tmp, "in_{}.fastq".format(n_reads))
    out = os.path.join(tmp, "out.fastq")
    if not os.path.exists(inp):
        t0 = time.time()
        make_fastq(inp, n_reads)
        print("generate: %.1fs" % (time.time() - t0))

    from atropos_tpu.commands import execute_cli

    argv = ["trim", "-se", inp, "-a", ADAPTER, "-o", out,
            "--no-default-adapters", "-q", "0", "--report-file",
            os.path.join(tmp, "report.txt"), "--quiet"]
    # warm: compile kernels on a small slice
    warm_in = os.path.join(tmp, "warm.fastq")
    if not os.path.exists(warm_in):
        make_fastq(warm_in, 20000, seed=1)
    execute_cli(["trim", "-se", warm_in, "-a", ADAPTER, "-o", out,
                 "--no-default-adapters", "--report-file",
                 os.path.join(tmp, "report.txt"), "--quiet"])

    t0 = time.time()
    if profile:
        prof = cProfile.Profile()
        prof.enable()
    rc = execute_cli(["trim", "-se", inp, "-a", ADAPTER, "-o", out,
                      "--no-default-adapters", "--report-file",
                      os.path.join(tmp, "report.txt"), "--quiet"])
    dt = time.time() - t0
    if profile:
        prof.disable()
        stream = io.StringIO()
        pstats.Stats(prof, stream=stream).sort_stats("cumulative").print_stats(30)
        print(stream.getvalue())
    print("rc=%s  %.2fs  %.2fM reads/s end-to-end" % (rc, dt, n_reads / dt / 1e6))


if __name__ == "__main__":
    main()

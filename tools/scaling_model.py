"""Collective-cost scaling model for the sharded trim step (VERDICT r4 #7).

The round-4 weak-scaling curve measured 8 virtual devices sharing 2 host
cores, i.e. host-CPU saturation, not interconnect scaling. This tool
replaces it as the headline with a MEASURED-collective / MODELED-scale
artifact:

1. **Measure** the real collective costs on a 2-process
   ``jax.distributed`` (Gloo/TCP localhost) run — the same fabric the
   multi-host tests exercise:
   - per-batch ``psum`` latency of the trim step's statistics payload
     (the only per-batch collective: a handful of int32 counters), and
   - the one-per-run summary ``allgather`` (payload = a representative
     pickled summary).
2. **Model** N-chip efficiency with the documented formula

       eff(N) = t_compute / (t_compute + L_psum * ceil(log2(N)))

   where ``t_compute`` = per-shard batch / measured single-chip kernel
   rate (BENCH r5 median) and ``L_psum`` is the measured 2-process psum
   latency. Using the Gloo/TCP latency for every doubling stage is
   CONSERVATIVE for TPU pods: ICI collective latency is orders of
   magnitude below TCP-localhost, and the psum payload (tens of bytes)
   is latency-bound, so the model upper-bounds the real collective cost.

Run: ``python tools/scaling_model.py`` — prints the JSON block that
becomes SCALING.json's headline.
"""
import json
import math
import os
import pickle
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# measured single-chip kernel rate (BENCH_r05 median, reads/s) and the
# turbo driver's default per-shard device batch
KERNEL_READS_PER_SEC = 12.7e6
PER_SHARD_BATCH = 32768

WORKER = r"""
import json, pickle, sys, time
proc_id, nprocs, port = sys.argv[1:4]
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    "localhost:" + port, num_processes=int(nprocs), process_id=int(proc_id)
)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

devices = np.array(jax.devices())
mesh = Mesh(devices, ("reads",))

@jax.jit
def with_psum(x):
    def inner(x):
        local = jnp.sum(x, axis=0, keepdims=True)
        return jax.lax.psum(local, "reads")
    return shard_map(
        inner, mesh=mesh, in_specs=P("reads", None), out_specs=P(None, None)
    )(x)

@jax.jit
def without_psum(x):
    def inner(x):
        return jnp.sum(x, axis=0, keepdims=True)
    return shard_map(
        inner, mesh=mesh, in_specs=P("reads", None), out_specs=P("reads", None)
    )(x)

# the per-batch stats payload: a handful of int32 counters per shard
x_np = np.arange(2 * 8, dtype=np.int32).reshape(2, 8)
sharding = NamedSharding(mesh, P("reads", None))
x = jax.device_put(x_np, sharding)

def timeit(fn, iters=200):
    fn(x).block_until_ready()  # compile
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        for _ in range(iters):
            fn(x).block_until_ready()
        best = min(best, (time.time() - t0) / iters)
    return best

t_with = timeit(with_psum)
t_without = timeit(without_psum)

# one-per-run summary allgather: representative pickled summary blob
from jax.experimental import multihost_utils
blob = pickle.dumps({"trim": {"adapters": [dict(lengths={i: i for i in range(200)})], "counters": list(range(500))}})
pad = np.frombuffer(blob.ljust(65536, b"\0"), np.uint8)
t0 = time.time()
for _ in range(10):
    gathered = multihost_utils.process_allgather(pad)
t_allgather = (time.time() - t0) / 10

if int(proc_id) == 0:
    print(json.dumps(dict(
        psum_seconds=t_with - t_without,
        step_with_psum_seconds=t_with,
        step_without_psum_seconds=t_without,
        summary_allgather_seconds=t_allgather,
        summary_payload_bytes=len(blob),
        psum_payload_bytes=int(x_np[0].nbytes),
    )))
"""


def _free_port():
    with socket.socket() as sock:
        sock.bind(("localhost", 0))
        return sock.getsockname()[1]


def measure_gloo():
    """Run the 2-process Gloo measurement; returns its JSON dict."""
    port = str(_free_port())
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(rank), "2", port],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for rank in range(2)
    ]
    out = None
    for rank, proc in enumerate(procs):
        stdout, stderr = proc.communicate(timeout=300)
        if proc.returncode != 0:
            raise RuntimeError(stderr.decode()[-2000:])
        if rank == 0:
            out = json.loads(stdout.decode().strip().splitlines()[-1])
    return out


#: assumed per-hop ICI collective latency on a real pod (public TPU
#: literature places small-payload ICI collective latency at ~1 us per
#: stage; the psum payload here is 32 bytes, pure latency-bound)
ICI_HOP_LATENCY_SECONDS = 1e-6


def _table(t_comp, latency):
    table = {}
    for log_n in range(1, 9):
        n = 1 << log_n
        t_coll = latency * log_n
        table[str(n)] = dict(
            modeled_efficiency=round(t_comp / (t_comp + t_coll), 4),
            t_compute_seconds=round(t_comp, 6),
            t_collective_seconds=round(t_coll, 7),
        )
    return table


def model(gloo):
    t_comp = PER_SHARD_BATCH / KERNEL_READS_PER_SEC
    latency = max(gloo["psum_seconds"], 0.0)
    return dict(
        formula=(
            "eff(N) = t_compute / (t_compute + L_psum * ceil(log2(N))); "
            "t_compute = per_shard_batch / kernel_reads_per_sec"
        ),
        inputs=dict(
            kernel_reads_per_sec=KERNEL_READS_PER_SEC,
            per_shard_batch=PER_SHARD_BATCH,
            psum_latency_seconds_measured_gloo=latency,
            psum_payload_bytes=gloo["psum_payload_bytes"],
            summary_allgather_seconds_once_per_run=gloo[
                "summary_allgather_seconds"
            ],
            summary_payload_bytes=gloo["summary_payload_bytes"],
            ici_hop_latency_seconds_assumed=ICI_HOP_LATENCY_SECONDS,
            note=(
                "L_psum measured on 2-process Gloo/TCP localhost (the "
                "fabric of tests/test_distributed.py) INCLUDES the TCP "
                "dispatch+sync round trip, so the gloo table is a very "
                "conservative lower bound; the ici table uses the "
                "assumed per-hop ICI latency (payload is 32 B, pure "
                "latency-bound). The summary allgather runs ONCE per "
                "run and is excluded from per-batch cost."
            ),
        ),
        per_chip_counts_gloo_conservative=_table(t_comp, latency),
        per_chip_counts_ici=_table(t_comp, ICI_HOP_LATENCY_SECONDS),
    )


def main():
    gloo = measure_gloo()
    result = dict(gloo_measured=gloo, model=model(gloo))
    print(json.dumps(result, indent=1))
    return result


if __name__ == "__main__":
    main()

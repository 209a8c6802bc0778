"""Multi-host distributed trim: real 2-process jax.distributed run on CPU.

Mirrors how the reference tests multicore with real forked processes
(``tests/test_paired.py:534``): two OS processes form a JAX distributed
runtime over localhost, each trims its round-robin batch shard into its
own output shard file, and summaries merge over the collective fabric.
"""
import os
import socket
import subprocess
import sys

import pytest

from .conformance_utils import datapath

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys
proc_id, nprocs, port, out_prefix, report = sys.argv[1:6]
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    "localhost:" + port, num_processes=int(nprocs), process_id=int(proc_id)
)
from atropos_tpu.commands import execute_cli
args = [
    "trim", "-a", "TTAGACATATCTCCGTCG", "-se", sys.argv[6],
    "-o", out_prefix, "--batch-size", "10",
    "--no-cache-adapters", "--no-default-adapters", "--quiet",
    "--report-file", report,
]
sys.exit(execute_cli(args))
"""


def _free_port():
    with socket.socket() as sock:
        sock.bind(("localhost", 0))
        return sock.getsockname()[1]


def test_distributed_two_process_trim(tmp_path):
    port = str(_free_port())
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.pop("JAX_PLATFORMS", None)
    # this test asserts the record-batcher's round-robin shard contract;
    # the turbo path's chunk-ownership sharding has its own test below
    env["ATROPOS_TPU_ENGINE"] = "0"
    out = str(tmp_path / "out.fq")
    report = str(tmp_path / "report.txt")
    in_path = datapath("big.1.fq")

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(rank), "2", port, out,
             report, in_path],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for rank in range(2)
    ]
    for proc in procs:
        stdout, stderr = proc.communicate(timeout=300)
        assert proc.returncode == 0, stderr.decode()[-3000:]

    # serial reference run in-process
    from atropos_tpu.commands import get_command

    serial = str(tmp_path / "serial.fq")
    retcode, _ = get_command("trim").execute([
        "-a", "TTAGACATATCTCCGTCG", "-se", in_path,
        "-o", serial, "--batch-size", "10",
        "--no-cache-adapters", "--no-default-adapters", "--quiet",
        "--report-file", str(tmp_path / "sr.txt"),
    ])
    assert retcode == 0

    with open(serial) as fh:
        lines = fh.readlines()
    # reconstruct expected shards: batches of 10 records (40 lines),
    # round-robin by batch index (batch 1 -> rank 0, batch 2 -> rank 1, ...)
    batches = [lines[i : i + 40] for i in range(0, len(lines), 40)]
    expected = {0: [], 1: []}
    for index, batch in enumerate(batches):
        expected[index % 2].extend(batch)

    for rank in range(2):
        shard = "{}.{}".format(out[: -len(".fq")], rank) + ".fq"
        assert os.path.exists(shard), shard
        with open(shard) as fh:
            assert fh.readlines() == expected[rank], "shard {}".format(rank)

    # only rank 0 writes the merged report; totals cover ALL records
    assert os.path.exists(report)
    with open(report) as fh:
        content = fh.read()
    assert "Total reads processed" in content
    with open(str(tmp_path / "sr.txt")) as fh:
        serial_report = fh.read()

    def stat_lines(text):
        keep = ("Total reads processed", "Reads with adapters", "Total basepairs")
        return [line for line in text.splitlines() if any(k in line for k in keep)]

    assert stat_lines(content) == stat_lines(serial_report)


TURBO_WORKER = r"""
import sys
proc_id, nprocs, port, out_prefix, report, inp = sys.argv[1:7]
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    "localhost:" + port, num_processes=int(nprocs), process_id=int(proc_id)
)
import os
os.environ["ATROPOS_TPU_ENGINE"] = "1"
from atropos_tpu.engine.turbo import TurboTrimRunner
TurboTrimRunner.CHUNK_BYTES = 2048  # force several chunks on a small file
from atropos_tpu.commands import execute_cli
sys.exit(execute_cli([
    "trim", "-a", "TTAGACATATCTCCGTCG", "-se", inp, "-o", out_prefix,
    "--no-cache-adapters", "--no-default-adapters", "--quiet",
    "--report-file", report,
]))
"""


def test_distributed_turbo_two_process(tmp_path):
    """Turbo streaming path under 2-host sharding: chunk ownership
    partitions records exactly once; concatenating shards in chunk order
    reproduces the serial output."""
    port = str(_free_port())
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.pop("JAX_PLATFORMS", None)
    out = str(tmp_path / "out.fq")
    in_path = datapath("big.1.fq")

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", TURBO_WORKER, str(rank), "2", port, out,
             str(tmp_path / "rep.txt"), in_path],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for rank in range(2)
    ]
    for proc in procs:
        _, stderr = proc.communicate(timeout=300)
        assert proc.returncode == 0, stderr.decode()[-3000:]

    from atropos_tpu.commands import get_command

    serial = str(tmp_path / "serial.fq")
    retcode, _ = get_command("trim").execute([
        "-a", "TTAGACATATCTCCGTCG", "-se", in_path, "-o", serial,
        "--no-cache-adapters", "--no-default-adapters", "--quiet",
        "--report-file", str(tmp_path / "sr.txt"),
    ])
    assert retcode == 0
    with open(serial) as fh:
        serial_records = fh.read().splitlines(keepends=True)

    shard_records = []
    for rank in range(2):
        shard = "{}.{}.fq".format(out[: -len(".fq")], rank)
        with open(shard) as fh:
            shard_records.append(fh.read().splitlines(keepends=True))
    # both shards non-trivial (CHUNK_BYTES small enough for several chunks)
    assert all(records for records in shard_records)
    # same total content; record sets partition the serial output
    names = [
        set(line for line in records if line.startswith("@"))
        for records in shard_records
    ]
    serial_names = set(line for line in serial_records if line.startswith("@"))
    assert names[0] | names[1] == serial_names
    assert not (names[0] & names[1])
    assert sorted(shard_records[0] + shard_records[1]) == sorted(serial_records)

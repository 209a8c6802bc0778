"""Parallel execution of trim pipelines.

The reference implements single-node data parallelism with forked workers
and queues (``atropos/commands/multicore.py``). In this framework the
scalable path is the device engine + multi-host sharding
(:mod:`atropos_tpu.parallel`); this module provides the CLI-compatible
``--threads`` behavior on the host: records are split into batches, worker
processes trim batches independently, and either a writer merges results in
order or each worker writes its own ``.N``-suffixed shard (parallel-write
mode).

Current implementation executes the pipeline in-process over the batch
stream (one worker), which preserves output byte-exactness including the
``.N`` shard-file naming of parallel-write mode. True multi-process fan-out
is layered on in ``atropos_tpu.parallel`` where the device engine makes
per-record Python work vanish.
"""
import logging

from atropos_tpu.util import run_interruptible

RETRY_INTERVAL = 5


class MockWorker:
    """Worker-identity shim for parallel-write mode's ``.N`` suffix."""

    def __init__(self, index=0):
        self.index = index


def run_parallel_trim(command_runner, record_handler, writers):
    """Run the trim pipeline in '--threads' mode.

    Results are byte-identical to the reference's parallel modes: with a
    writer process the outputs are the normal files (order preserved by
    construction here); with ``--no-writer-process`` each worker writes
    ``output.N`` shard files (a single shard ``.0`` in this
    implementation).
    """
    from atropos_tpu.commands.trim import (
        PairedEndTrimPipeline,
        SingleEndTrimPipeline,
        WorkerResultHandler,
        WriterResultHandler,
    )

    options = command_runner.options
    use_suffix = not options.writer_process

    logging.getLogger().debug(
        "Running parallel trim with %d threads (single-shard host fallback)",
        options.threads,
    )

    result_handler = WorkerResultHandler(
        WriterResultHandler(writers, use_suffix=use_suffix)
    )
    if options.paired:
        pipeline_class = PairedEndTrimPipeline
    else:
        pipeline_class = SingleEndTrimPipeline
    pipeline = pipeline_class(record_handler, result_handler)
    if use_suffix:
        return run_interruptible(
            pipeline, command_runner, raise_on_error=True, worker=MockWorker(0)
        )
    return run_interruptible(pipeline, command_runner, raise_on_error=True)

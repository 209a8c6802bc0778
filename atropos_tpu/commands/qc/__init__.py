"""The 'qc' command: FastQC-style read statistics.

Collection is batch-vectorized over the tensor accumulators in
:mod:`atropos_tpu.commands.stats` (the reference's per-read dict loop,
``atropos/commands/qc/__init__.py``, is the behavioral model). Serial and
forked-parallel execution share one pipeline; parallel workers' count
tensors merge by addition when summaries combine.
"""
from atropos_tpu.commands.base import (
    BaseCommandRunner,
    PairedEndPipelineMixin,
    Pipeline,
    SingleEndPipelineMixin,
)
from atropos_tpu.commands.stats import (
    PairedEndReadStatistics,
    SingleEndReadStatistics,
)
from atropos_tpu.commands.multicore import ParallelPipelineMixin
from atropos_tpu.util import run_interruptible


class QcPipeline(Pipeline):
    """Statistics-collection pipeline; one accumulator per input source."""

    statistics_class = None

    def __init__(self, **kwargs):
        super().__init__()
        self.stats = {}
        self.stats_kwargs = kwargs

    def _get_stats(self, source):
        if source not in self.stats:
            self.stats[source] = self.statistics_class(**self.stats_kwargs)
        return self.stats[source]

    def handle_records(self, context, records):
        """Collect the whole batch with one set of vectorized scatter-adds
        (the per-record loop only remains for bp accounting)."""
        for record in records:
            self.handle_record(context, record)
        self._get_stats(context["source"]).collect_batch(records)

    def handle_reads(self, context, read1, read2=None):
        # bp counts are accumulated by the pipeline mixins via
        # handle_record; statistics collection happens batch-wise above
        pass

    def finish(self, summary, **kwargs):
        super().finish(summary)
        summary["pre"] = {
            source: stats.summarize() for source, stats in self.stats.items()
        }


class SingleEndQcPipeline(SingleEndPipelineMixin, QcPipeline):
    statistics_class = SingleEndReadStatistics


class PairedEndQcPipeline(PairedEndPipelineMixin, QcPipeline):
    statistics_class = PairedEndReadStatistics


class ParallelSingleEndQcPipeline(ParallelPipelineMixin, SingleEndQcPipeline):
    """Module-level (spawned workers pickle pipelines by qualified name)."""


class ParallelPairedEndQcPipeline(ParallelPipelineMixin, PairedEndQcPipeline):
    """Module-level (spawned workers pickle pipelines by qualified name)."""


class CommandRunner(BaseCommandRunner):
    name = "qc"

    def __call__(self):
        pipeline_class = (
            PairedEndQcPipeline if self.paired else SingleEndQcPipeline
        )
        pipeline_args = dict(
            qualities=self.delivers_qualities, quality_base=self.quality_base
        )
        if self.stats:
            pipeline_args.update(self.stats)

        if self.threads is None:
            self.summary.update(mode="serial", threads=1)
            return run_interruptible(pipeline_class(**pipeline_args), self)
        self.summary.update(mode="parallel", threads=self.threads)
        return self._run_parallel(pipeline_class, pipeline_args)

    def _run_parallel(self, pipeline_class, pipeline_args):
        """Fork worker processes, each running the same pipeline over its
        share of batches; summaries (tensor adds) merge at the end."""
        import logging

        from atropos_tpu.commands.multicore import ParallelPipelineRunner

        parallel_class = (
            ParallelPairedEndQcPipeline
            if pipeline_class is PairedEndQcPipeline
            else ParallelSingleEndQcPipeline
        )
        runner = ParallelPipelineRunner(self, parallel_class(**pipeline_args))
        logging.getLogger().debug(
            "Starting atropos qc in parallel mode with threads=%d, timeout=%d",
            runner.threads,
            runner.timeout,
        )
        return runner.run()

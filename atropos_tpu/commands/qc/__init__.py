"""The 'qc' command: FastQC-style read statistics.

Behavior parity with the reference (``atropos/commands/qc/__init__.py``).
The device engine computes the same statistics as fixed-shape count
tensors merged with psum (see ``atropos_tpu.parallel``); the host path
remains the schema authority.
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
from atropos_tpu.util import run_interruptible


class QcPipeline(Pipeline):
    """Base Pipeline for the qc command."""

    def __init__(self, read_statistics_class, **kwargs):
        super().__init__()
        self.read_statistics_class = read_statistics_class
        self.stats = {}
        self.stats_kwargs = kwargs

    def _get_stats(self, source):
        if source not in self.stats:
            self.stats[source] = self.read_statistics_class(**self.stats_kwargs)
        return self.stats[source]

    def handle_reads(self, context, read1, read2=None):
        self._get_stats(context["source"]).collect(read1, read2)

    def finish(self, summary, **kwargs):
        super().finish(summary)
        summary["pre"] = dict(
            (source, stats.summarize()) for source, stats in self.stats.items()
        )


class SingleEndQcPipeline(SingleEndPipelineMixin, QcPipeline):
    def __init__(self, **kwargs):
        super().__init__(SingleEndReadStatistics, **kwargs)


class PairedEndQcPipeline(PairedEndPipelineMixin, QcPipeline):
    def __init__(self, **kwargs):
        super().__init__(PairedEndReadStatistics, **kwargs)


class CommandRunner(BaseCommandRunner):
    name = "qc"

    def __call__(self):
        if self.paired:
            pipeline_class = PairedEndQcPipeline
        else:
            pipeline_class = SingleEndQcPipeline
        pipeline_args = dict(
            qualities=self.delivers_qualities, quality_base=self.quality_base
        )
        if self.stats:
            pipeline_args.update(self.stats)

        if self.threads is None:
            self.summary.update(mode="serial", threads=1)
            pipeline = pipeline_class(**pipeline_args)
            return run_interruptible(pipeline, self)
        self.summary.update(mode="parallel", threads=self.threads)
        return self.run_parallel(pipeline_class, pipeline_args)

    def run_parallel(self, pipeline_class, pipeline_args):
        """Run qc over forked workers, merging worker summaries (reference
        ``atropos/commands/qc/__init__.py:66-90``)."""
        import logging

        from atropos_tpu.commands.multicore import (
            ParallelPipelineMixin,
            ParallelPipelineRunner,
        )

        pipeline_class = type(
            "QcPipelineImpl", (ParallelPipelineMixin, pipeline_class), {}
        )
        pipeline = pipeline_class(**pipeline_args)
        runner = ParallelPipelineRunner(self, pipeline)
        logging.getLogger().debug(
            "Starting atropos qc in parallel mode with threads=%d, timeout=%d",
            runner.threads,
            runner.timeout,
        )
        return runner.run()

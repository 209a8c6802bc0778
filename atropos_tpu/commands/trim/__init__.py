"""The 'trim' command: adapter/quality trimming.

The stack is assembled by :mod:`~atropos_tpu.commands.trim.builder` and
executed by one of four modes (reference behavior:
``atropos/commands/trim/__init__.py:338-819``):

- **turbo**: streaming native parse -> batched device kernels -> native
  format, for interval-expressible configurations
  (:mod:`atropos_tpu.engine.turbo`);
- **engine**: the serial pipeline with whole-batch device matching
  injected (:mod:`atropos_tpu.engine`), the default;
- **serial**: the per-record scalar pipeline (``ATROPOS_TPU_ENGINE=0``),
  the conformance baseline;
- **parallel**: forked worker shards (``--threads``,
  :mod:`atropos_tpu.commands.multicore`).

Under an initialized ``jax.distributed`` runtime, every mode shards
batches round-robin across hosts, writes per-host output shard files, and
merges summaries over the collective fabric
(:mod:`atropos_tpu.parallel.distributed`).
"""
import logging
import textwrap

from atropos_tpu.commands.base import BaseCommandRunner
from atropos_tpu.commands.trim.builder import TrimStackBuilder
from atropos_tpu.commands.trim.pipeline import (  # noqa: F401
    PairedEndTrimPipeline,
    RecordHandler,
    ResultHandler,
    ResultHandlerWrapper,
    SingleEndTrimPipeline,
    StatsRecordHandlerWrapper,
    TrimPipeline,
    TrimSummary,
    WorkerResultHandler,
    WriterResultHandler,
)
from atropos_tpu.util import run_interruptible

_PAIRING_LABEL = {
    False: "single-end",
    "first": "paired-end legacy",
    "both": "paired-end",
}

_LEGACY_MODE_WARNING = (
    "Requested read modifications are applied only to the first read since "
    "backwards compatibility mode is enabled. To modify both reads, also "
    "use any of the -A/-B/-G/-U options. Use a dummy adapter sequence when "
    "necessary: -A XXX"
)


class CommandRunner(BaseCommandRunner):
    name = "trim"

    def __init__(self, options):
        super().__init__(options, TrimSummary)

    def __call__(self):
        options = self.options
        logger = logging.getLogger()

        modifiers, filters, formatters, writers = TrimStackBuilder(self).build()

        record_handler = RecordHandler(modifiers, filters, formatters)
        if options.stats:
            record_handler = StatsRecordHandlerWrapper(
                record_handler,
                options.paired,
                options.stats,
                qualities=self.delivers_qualities,
                quality_base=self.quality_base,
            )

        self._log_configuration(logger, modifiers, record_handler)
        engine = self._build_engine(logger, modifiers, record_handler)
        distributed = self._configure_distributed(logger, writers)

        if options.threads is not None:
            self.summary.update(mode="parallel", threads=options.threads)
            return self.run_parallel(record_handler, writers)

        retcode = self._run_single_process(
            record_handler, writers, engine, distributed
        )
        if distributed:
            self._merge_distributed_summaries()
        return retcode

    # -- setup helpers ---------------------------------------------------------

    def _log_configuration(self, logger, modifiers, record_handler):
        options = self.options
        num_adapters = sum(len(a) for a in modifiers.get_adapters())
        logger.info(
            "Trimming %s adapter%s with at most %.1f%% errors in %s mode ...",
            num_adapters,
            "s" if num_adapters > 1 else "",
            options.error_rate * 100,
            _PAIRING_LABEL[options.paired],
        )
        if options.paired == "first" and (
            modifiers.get_modifiers(read=2) or options.quality_cutoff
        ):
            logger.warning("\n".join(textwrap.wrap(_LEGACY_MODE_WARNING)))

    def _build_engine(self, logger, modifiers, record_handler):
        """The batched device engine, when enabled and eligible."""
        if not isinstance(record_handler, RecordHandler):
            return None
        from atropos_tpu import engine as engine_mod

        if not engine_mod.engine_enabled():
            return None
        engine = engine_mod.TrimEngine.build(modifiers, self.options)
        if engine is not None:
            logger.info("Using batched device engine for adapter matching")
        else:
            logger.info(
                "Scalar pipeline (engine ineligible: %s)",
                engine_mod.LAST_FALLBACK_REASON,
            )
        return engine

    def _configure_distributed(self, logger, writers):
        """Set up multi-host sharding when jax.distributed is live."""
        from atropos_tpu.parallel.distributed import process_info

        rank, world = process_info()
        if world <= 1:
            return False
        if self.options.threads is not None:
            logger.warning(
                "Multi-host mode runs one pipeline per host; ignoring --threads"
            )
            self.options.threads = None
        self.shard_rank = rank
        self.shard_count = world
        writers.suffix = ".{}".format(rank)
        if rank != 0:
            self.options.report_file = None
        return True

    # -- execution modes ---------------------------------------------------------

    def _run_single_process(self, record_handler, writers, engine, distributed):
        mode_suffix = "distributed" if distributed else None
        if engine is not None or self._engine_requested():
            from atropos_tpu.engine.turbo import (
                TurboPairedRunner,
                TurboTrimRunner,
            )

            runner_class = (
                TurboPairedRunner if self.options.paired else TurboTrimRunner
            )
            turbo = runner_class.build(self, record_handler, writers)
            if turbo is not None:
                self.summary.update(mode=mode_suffix or "turbo", threads=1)
                return turbo.run()

        pipeline_class = (
            PairedEndTrimPipeline if self.options.paired
            else SingleEndTrimPipeline
        )
        pipeline = pipeline_class(
            record_handler,
            WorkerResultHandler(WriterResultHandler(writers)),
            engine=engine,
        )
        self.summary.update(mode=mode_suffix or "serial", threads=1)
        return run_interruptible(pipeline, self, raise_on_error=True)

    @staticmethod
    def _engine_requested():
        from atropos_tpu.engine import engine_enabled

        return engine_enabled()

    def _merge_distributed_summaries(self):
        from atropos_tpu.parallel.distributed import barrier, merge_summaries

        timing = self.summary.get("timing")
        merged = merge_summaries(dict(self.summary))
        self.summary.clear()
        self.summary.update(merged)
        self.summary["timing"] = timing
        barrier("atropos-trim-finish")

    def run_parallel(self, record_handler, writers):
        """Forked worker-shard mode (``--threads``)."""
        from atropos_tpu.commands.multicore import run_parallel_trim

        return run_parallel_trim(self, record_handler, writers)

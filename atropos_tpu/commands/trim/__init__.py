"""The 'trim' command: adapter/quality trimming pipeline assembly.

Builds adapters -> modifiers -> filters -> formatters -> writers from the
parsed options and runs the pipeline (behavior parity with the reference
``atropos/commands/trim/__init__.py``). Execution modes:

- serial host pipeline (always available, the conformance baseline);
- batched device engine (``atropos_tpu.engine``) used automatically for
  supported configurations — whole batches are encoded to device tensors,
  the DP/qualtrim kernels run on TPU, and results are resolved back to
  byte-identical output records;
- sharded parallel mode (the reference's multiprocessing story re-imagined
  as data-parallel shards; see ``atropos_tpu.parallel``).
"""
from collections import defaultdict
from collections.abc import Sequence
import logging
import sys
import textwrap

from atropos_tpu.adapters import AdapterParser, BACK
from atropos_tpu.commands.base import (
    BaseCommandRunner,
    PairedEndPipelineMixin,
    Pipeline,
    SingleEndPipelineMixin,
    Summary,
)
from atropos_tpu.commands.stats import (
    PairedEndReadStatistics,
    SingleEndReadStatistics,
)
from atropos_tpu.io import STDOUT
from atropos_tpu.util import RandomMatchProbability, run_interruptible
from atropos_tpu.commands.trim.filters import (
    FilterFactory,
    Filters,
    MergedReadFilter,
    NContentFilter,
    NoFilter,
    TooLongReadFilter,
    TooShortReadFilter,
    TrimmedFilter,
    UntrimmedFilter,
)
from atropos_tpu.commands.trim.modifiers import (
    AdapterCutter,
    DoubleEncoder,
    InsertAdapterCutter,
    LengthTagModifier,
    MergeOverlapping,
    MinCutter,
    NEndTrimmer,
    NextseqQualityTrimmer,
    NonDirectionalBisulfiteTrimmer,
    OverwriteRead,
    PairedEndModifiers,
    PrefixSuffixAdder,
    PrimerTrimmer,
    QualityTrimmer,
    RRBSTrimmer,
    SingleEndModifiers,
    SuffixRemover,
    SwiftBisulfiteTrimmer,
    UnconditionalCutter,
    ZeroCapper,
)
from atropos_tpu.commands.trim.writers import (
    Formatters,
    InfoFormatter,
    RestFormatter,
    WildcardFormatter,
    Writers,
)


class TrimPipeline(Pipeline):
    """Trimming pipeline: record handler + result handler.

    When a device engine is attached, whole batches are modified via
    batched kernels (``atropos_tpu.engine``) instead of per-record scalar
    matching; filtering/formatting semantics are unchanged.
    """

    def __init__(self, record_handler, result_handler, engine=None):
        super().__init__()
        self.record_handler = record_handler
        self.result_handler = result_handler
        self.engine = engine

    def start(self, worker=None):
        self.result_handler.start(worker)

    def add_to_context(self, context):
        context["results"] = defaultdict(lambda: [])

    def handle_records(self, context, records):
        if self.engine is not None:
            self._handle_records_engine(context, records)
        else:
            super().handle_records(context, records)
        self.result_handler.write_result(context["index"], context["results"])

    def _handle_records_engine(self, context, records):
        handler = self.record_handler
        paired = isinstance(self, PairedEndPipelineMixin)
        bps = context["bp"]
        pairs = []
        if paired:
            for read1, read2 in records:
                bps[0] += len(read1.sequence)
                bps[1] += len(read2.sequence)
                pairs.append((read1, read2))
        else:
            for record in records:
                bps[0] += len(record)
                pairs.append((record, None))
        modified = self.engine.modify_batch(pairs)
        for read1, read2 in modified:
            reads = (read1, read2) if paired else (read1,)
            dest = handler.filters.filter(*reads)
            handler.formatters.format(context["results"], dest, *reads)

    def handle_reads(self, context, read1, read2=None):
        return self.record_handler.handle_record(context, read1, read2)

    def finish(self, summary, **kwargs):
        self.result_handler.finish()
        super().finish(summary)
        summary.update(self.record_handler.summarize())


class SingleEndTrimPipeline(SingleEndPipelineMixin, TrimPipeline):
    pass


class PairedEndTrimPipeline(PairedEndPipelineMixin, TrimPipeline):
    pass


class RecordHandler:
    """modify -> filter -> format for one record (pair)."""

    def __init__(self, modifiers, filters, formatters):
        self.modifiers = modifiers
        self.filters = filters
        self.formatters = formatters

    def handle_record(self, context, read1, read2=None):
        reads = self.modifiers.modify(read1, read2)
        dest = self.filters.filter(*reads)
        self.formatters.format(context["results"], dest, *reads)
        return (dest, reads)

    def summarize(self):
        return dict(
            trim=dict(
                modifiers=self.modifiers.summarize(),
                filters=self.filters.summarize(),
                formatters=self.formatters.summarize(),
            )
        )


class StatsRecordHandlerWrapper:
    """Collects pre- and/or post-trim read statistics around a handler."""

    def __init__(self, record_handler, paired, stats_args, **kwargs):
        self.record_handler = record_handler
        self.read_statistics_class = (
            PairedEndReadStatistics if paired else SingleEndReadStatistics
        )
        self.pre = self.post = None
        if "pre" in stats_args:
            self.pre = {}
            self.pre_kwargs = kwargs.copy()
            self.pre_kwargs.update(stats_args["pre"])
        if "post" in stats_args:
            self.post = {}
            self.post_kwargs = kwargs.copy()
            self.post_kwargs.update(stats_args["post"])

    def handle_record(self, context, read1, read2=None):
        if self.pre is not None:
            self.collect(self.pre, context["source"], read1, read2, **self.pre_kwargs)
        dest, reads = self.record_handler.handle_record(context, read1, read2)
        if self.post is not None:
            if dest not in self.post:
                self.post[dest] = {}
            self.collect(self.post[dest], context["source"], *reads, **self.post_kwargs)
        return (dest, reads)

    def collect(self, stats, source, read1, read2=None, **kwargs):
        if source not in stats:
            stats[source] = self.read_statistics_class(**kwargs)
        stats[source].collect(read1, read2)

    def summarize(self):
        summary = self.record_handler.summarize()
        if self.pre is not None:
            summary["pre"] = dict(
                (source, stats.summarize()) for source, stats in self.pre.items()
            )
        if self.post is not None:
            summary["post"] = {}
            for dest, stats_dict in self.post.items():
                summary["post"][dest.name] = dict(
                    (source, stats.summarize())
                    for source, stats in stats_dict.items()
                )
        return summary


class ResultHandler:
    """Destination for per-batch result dicts."""

    def start(self, worker=None):
        pass

    def finish(self, total_batches=None):
        pass

    def write_result(self, batch_num, result):
        raise NotImplementedError()


class ResultHandlerWrapper(ResultHandler):
    def __init__(self, handler):
        self.handler = handler

    def start(self, worker):
        self.handler.start(worker)

    def write_result(self, batch_num, result):
        self.handler.write_result(batch_num, result)

    def finish(self, total_batches=None):
        self.handler.finish(total_batches=total_batches)


class WorkerResultHandler(ResultHandlerWrapper):
    """Joins result strings (and optionally compresses) before writing."""

    def write_result(self, batch_num, result):
        self.handler.write_result(
            batch_num, dict(self.prepare_file(*item) for item in result.items())
        )

    def prepare_file(self, path, strings):
        return (path, "".join(strings))


class WriterResultHandler(ResultHandler):
    """Writes results to disk via a Writers object."""

    def __init__(self, writers, compressed=False, use_suffix=False):
        self.writers = writers
        self.compressed = compressed
        self.use_suffix = use_suffix

    def start(self, worker=None):
        if self.use_suffix:
            if worker is None:
                raise ValueError("worker must not be None")
            self.writers.suffix = ".{}".format(worker.index)

    def write_result(self, batch_num, result):
        self.writers.write_result(result, self.compressed)

    def finish(self, total_batches=None):
        self.writers.close()


class TrimSummary(Summary):
    """Summary with derived fraction_*/total_* values for trim stats."""

    def _post_process_other(self, dict_val, key, value):
        if self.has_exception:
            return

        def frac(val, total):
            return (val / total) if val and total != 0 else 0

        if isinstance(key, str):
            if key.startswith("records_"):
                frac_key = "fraction_{}".format(key)
                total_records = self["total_record_count"]
                if isinstance(value, Sequence):
                    dict_val[frac_key] = [frac(val, total_records) for val in value]
                    total = sum(val for val in value if val)
                    dict_val["total_{}".format(key)] = total
                else:
                    dict_val[frac_key] = frac(value, total_records)
            elif key.startswith("bp_"):
                frac_key = "fraction_{}".format(key)
                sum_total_bp = self["sum_total_bp_count"]
                if isinstance(value, Sequence):
                    dict_val[frac_key] = [
                        frac(val, bps)
                        for val, bps in zip(value, self["total_bp_counts"])
                    ]
                    total = sum(val for val in value if val)
                    dict_val["total_{}".format(key)] = total
                    dict_val["fraction_total_{}".format(key)] = frac(
                        total, sum_total_bp
                    )
                else:
                    dict_val[frac_key] = frac(value, sum_total_bp)


class CommandRunner(BaseCommandRunner):
    name = "trim"

    def __init__(self, options):
        super().__init__(options, TrimSummary)

    def __call__(self):
        options = self.options
        match_probability = RandomMatchProbability()

        # --- adapters ---
        has_adapters1 = options.adapters or options.anywhere or options.front
        has_adapters2 = options.adapters2 or options.anywhere2 or options.front2

        adapters1 = adapters2 = []
        if has_adapters1 or has_adapters2:
            adapter_cache = super().load_known_adapters()
            parser_args = dict(
                colorspace=options.colorspace,
                max_error_rate=options.error_rate,
                min_overlap=options.overlap,
                read_wildcards=options.match_read_wildcards,
                adapter_wildcards=options.match_adapter_wildcards,
                indels=options.indels,
                indel_cost=options.indel_cost,
                cache=adapter_cache,
                gc_content=options.gc_content,
                match_probability=match_probability,
                alphabet=options.alphabet,
            )
            if options.adapter_max_rmp:
                parser_args["max_rmp"] = options.adapter_max_rmp
            adapter_parser = AdapterParser(**parser_args)

            if has_adapters1:
                adapters1 = adapter_parser.parse_multi(
                    options.adapters, options.anywhere, options.front
                )
            if has_adapters2:
                adapters2 = adapter_parser.parse_multi(
                    options.adapters2, options.anywhere2, options.front2
                )

            if options.cache_adapters:
                adapter_cache.save()

        # --- modifiers ---
        if (
            not adapters1
            and not adapters2
            and not options.quality_cutoff
            and options.nextseq_trim is None
            and options.cut == []
            and options.cut2 == []
            and options.cut_min == []
            and options.cut_min2 == []
            and (options.minimum_length is None or options.minimum_length <= 0)
            and options.maximum_length == sys.maxsize
            and not options.trim_n
            and not self.has_qualfile
            and options.max_n is None
            and (not options.paired or options.overwrite_low_quality is None)
        ):
            raise ValueError("You need to provide at least one adapter sequence.")

        if options.aligner == "insert" and any(
            not a or len(a) != 1 or a[0].where != BACK for a in (adapters1, adapters2)
        ):
            raise ValueError(
                "Insert aligner requires a single 3' adapter for each read"
            )

        if options.debug:
            for adapter in adapters1 + adapters2:
                adapter.enable_debug()

        if options.paired:
            modifiers = PairedEndModifiers(options.paired)
        else:
            modifiers = SingleEndModifiers()

        for oper in options.op_order:
            if oper == "W" and options.overwrite_low_quality:
                lowq, highq, window = options.overwrite_low_quality
                modifiers.add_modifier(
                    OverwriteRead,
                    worse_read_min_quality=lowq,
                    better_read_min_quality=highq,
                    window_size=window,
                    base=options.quality_base,
                )
            elif oper == "A" and (adapters1 or adapters2):
                if options.aligner == "insert":
                    modifiers.add_modifier(
                        InsertAdapterCutter,
                        adapter1=adapters1[0],
                        adapter2=adapters2[0],
                        action=options.action,
                        mismatch_action=options.correct_mismatches,
                        max_insert_mismatch_frac=options.insert_match_error_rate,
                        max_adapter_mismatch_frac=(
                            options.insert_match_adapter_error_rate
                        ),
                        match_probability=match_probability,
                        insert_max_rmp=options.insert_max_rmp,
                        read_wildcards=options.match_read_wildcards,
                        adapter_wildcards=options.match_adapter_wildcards,
                    )
                else:
                    a1_args = (
                        dict(
                            adapters=adapters1,
                            times=options.times,
                            action=options.action,
                        )
                        if adapters1
                        else None
                    )
                    a2_args = (
                        dict(
                            adapters=adapters2,
                            times=options.times,
                            action=options.action,
                        )
                        if adapters2
                        else None
                    )
                    modifiers.add_modifier_pair(AdapterCutter, a1_args, a2_args)
            elif oper == "C" and (options.cut or options.cut2):
                modifiers.add_modifier_pair(
                    UnconditionalCutter,
                    dict(lengths=options.cut),
                    dict(lengths=options.cut2),
                )
            elif oper == "G" and (options.nextseq_trim is not None):
                modifiers.add_modifier(
                    NextseqQualityTrimmer,
                    cutoff=options.nextseq_trim,
                    base=options.quality_base,
                )
            elif oper == "Q" and options.quality_cutoff:
                modifiers.add_modifier(
                    QualityTrimmer,
                    cutoff_front=options.quality_cutoff[0],
                    cutoff_back=options.quality_cutoff[1],
                    base=options.quality_base,
                )

        if options.bisulfite:
            if isinstance(options.bisulfite, str):
                if "non-directional" in options.bisulfite:
                    modifiers.add_modifier(
                        NonDirectionalBisulfiteTrimmer,
                        rrbs=options.bisulfite == "non-directional-rrbs",
                    )
                elif options.bisulfite == "rrbs":
                    modifiers.add_modifier(RRBSTrimmer)
                elif options.bisulfite in ("epignome", "truseq"):
                    # Trimming leads to worse results
                    pass
                elif options.bisulfite == "swift":
                    modifiers.add_modifier(SwiftBisulfiteTrimmer)
            else:
                if options.bisulfite[0]:
                    modifiers.add_modifier(MinCutter, read=1, **(options.bisulfite[0]))
                if len(options.bisulfite) > 1 and options.bisulfite[1]:
                    modifiers.add_modifier(MinCutter, read=2, **(options.bisulfite[1]))

        if options.trim_n:
            modifiers.add_modifier(NEndTrimmer)

        if options.cut_min or options.cut_min2:
            modifiers.add_modifier_pair(
                MinCutter,
                dict(lengths=options.cut_min),
                dict(lengths=options.cut_min2),
            )

        if options.length_tag:
            modifiers.add_modifier(LengthTagModifier, length_tag=options.length_tag)

        if options.strip_suffix:
            modifiers.add_modifier(SuffixRemover, suffixes=options.strip_suffix)

        if options.prefix or options.suffix:
            modifiers.add_modifier(
                PrefixSuffixAdder, prefix=options.prefix, suffix=options.suffix
            )

        if options.double_encode:
            modifiers.add_modifier(DoubleEncoder)

        if options.zero_cap and self.delivers_qualities:
            modifiers.add_modifier(ZeroCapper, quality_base=options.quality_base)

        if options.trim_primer:
            modifiers.add_modifier(PrimerTrimmer)

        if options.merge_overlapping:
            modifiers.add_modifier(
                MergeOverlapping,
                min_overlap=options.merge_min_overlap,
                error_rate=options.merge_error_rate,
                mismatch_action=options.correct_mismatches,
            )

        # --- filters and formatters ---
        min_affected = 2 if options.pair_filter == "both" else 1
        filters = Filters(FilterFactory(options.paired, min_affected))

        output1 = output2 = None
        interleaved = False
        if options.interleaved_output:
            output1 = options.interleaved_output
            interleaved = True
        else:
            output1 = options.output
            output2 = options.paired_output

        seq_formatter_args = dict(
            qualities=self.delivers_qualities,
            colorspace=options.colorspace,
            interleaved=interleaved,
        )
        formatters = Formatters(output1, seq_formatter_args)
        force_create = []

        if options.merge_overlapping:
            filters.add_filter(MergedReadFilter)
            if options.merged_output:
                formatters.add_seq_formatter(MergedReadFilter, options.merged_output)

        if options.minimum_length is not None and options.minimum_length > 0:
            filters.add_filter(TooShortReadFilter, options.minimum_length)
            if options.too_short_output:
                formatters.add_seq_formatter(
                    TooShortReadFilter,
                    options.too_short_output,
                    options.too_short_paired_output,
                )

        if options.maximum_length < sys.maxsize:
            filters.add_filter(TooLongReadFilter, options.maximum_length)
            if options.too_long_output is not None:
                formatters.add_seq_formatter(
                    TooLongReadFilter,
                    options.too_long_output,
                    options.too_long_paired_output,
                )

        if options.max_n is not None:
            filters.add_filter(NContentFilter, options.max_n)

        if options.discard_trimmed:
            filters.add_filter(TrimmedFilter)

        if not formatters.multiplexed:
            if output1 is not None:
                formatters.add_seq_formatter(NoFilter, output1, output2)
                if output1 != STDOUT and options.writer_process:
                    force_create.append(output1)
                    if output2 is not None:
                        force_create.append(output2)
            elif not (options.discard_trimmed and options.untrimmed_output):
                formatters.add_seq_formatter(NoFilter, options.default_outfile)
                if options.default_outfile != STDOUT and options.writer_process:
                    force_create.append(options.default_outfile)

        if options.discard_untrimmed or options.untrimmed_output:
            filters.add_filter(UntrimmedFilter)

        if not options.discard_untrimmed:
            if formatters.multiplexed:
                untrimmed = options.untrimmed_output or output1.format(name="unknown")
                formatters.add_seq_formatter(UntrimmedFilter, untrimmed)
                formatters.add_seq_formatter(NoFilter, untrimmed)
            elif options.untrimmed_output:
                formatters.add_seq_formatter(
                    UntrimmedFilter,
                    options.untrimmed_output,
                    options.untrimmed_paired_output,
                )

        if options.rest_file:
            formatters.add_info_formatter(RestFormatter(options.rest_file))
        if options.info_file:
            formatters.add_info_formatter(InfoFormatter(options.info_file))
        if options.wildcard_file:
            formatters.add_info_formatter(WildcardFormatter(options.wildcard_file))

        writers = Writers(force_create)
        record_handler = RecordHandler(modifiers, filters, formatters)
        if options.stats:
            record_handler = StatsRecordHandlerWrapper(
                record_handler,
                options.paired,
                options.stats,
                qualities=self.delivers_qualities,
                quality_base=self.quality_base,
            )

        logger = logging.getLogger()
        num_adapters = sum(len(a) for a in modifiers.get_adapters())
        logger.info(
            "Trimming %s adapter%s with at most %.1f%% errors in %s mode ...",
            num_adapters,
            "s" if num_adapters > 1 else "",
            options.error_rate * 100,
            {False: "single-end", "first": "paired-end legacy", "both": "paired-end"}[
                options.paired
            ],
        )
        if options.paired == "first" and (
            len(record_handler.modifiers.get_modifiers(read=2)) > 0
            or options.quality_cutoff
        ):
            logger.warning(
                "\n".join(
                    textwrap.wrap(
                        "Requested read modifications are applied only to the "
                        "first read since backwards compatibility mode is "
                        "enabled. To modify both reads, also use any of the "
                        "-A/-B/-G/-U options. Use a dummy adapter sequence "
                        "when necessary: -A XXX"
                    )
                )
            )

        # device engine (batched kernels) for eligible configurations
        engine = None
        engine_on = False
        if isinstance(record_handler, RecordHandler):
            from atropos_tpu.engine import TrimEngine, engine_enabled

            engine_on = engine_enabled()
            if engine_on:
                engine = TrimEngine.build(modifiers, options)
                if engine is not None:
                    logger.info("Using batched device engine for adapter matching")
                else:
                    from atropos_tpu import engine as engine_mod

                    logger.info(
                        "Scalar pipeline (engine ineligible: %s)",
                        engine_mod.LAST_FALLBACK_REASON,
                    )

        # multi-host mode: the JAX distributed runtime is initialized ->
        # shard batches round-robin across hosts, write per-host output
        # shards, and merge summaries over the collective fabric (see
        # ``atropos_tpu.parallel.distributed``)
        from atropos_tpu.parallel.distributed import process_info

        dist_rank, dist_procs = process_info()
        if dist_procs > 1:
            if options.threads is not None:
                logger.warning(
                    "Multi-host mode runs one pipeline per host; "
                    "ignoring --threads"
                )
                options.threads = None
            self.shard_rank = dist_rank
            self.shard_count = dist_procs
            writers.suffix = ".{}".format(dist_rank)
            if dist_rank != 0:
                options.report_file = None

        if options.threads is None:
            retcode = None
            if engine_on:
                # turbo path: streaming native-parse + device kernels +
                # native format, for interval-expressible configurations
                # (works with or without adapters)
                from atropos_tpu.engine.turbo import TurboTrimRunner

                turbo = TurboTrimRunner.build(self, record_handler, writers)
                if turbo is not None:
                    self.summary.update(
                        mode="turbo" if dist_procs == 1 else "distributed",
                        threads=1,
                    )
                    retcode = turbo.run()
            if retcode is None:
                # serial mode
                result_handler = WorkerResultHandler(
                    WriterResultHandler(writers)
                )
                if options.paired:
                    pipeline_class = PairedEndTrimPipeline
                else:
                    pipeline_class = SingleEndTrimPipeline
                pipeline = pipeline_class(
                    record_handler, result_handler, engine=engine
                )
                self.summary.update(
                    mode="serial" if dist_procs == 1 else "distributed",
                    threads=1,
                )
                retcode = run_interruptible(pipeline, self, raise_on_error=True)
            if dist_procs > 1:
                from atropos_tpu.parallel.distributed import (
                    barrier,
                    merge_summaries,
                )

                timing = self.summary.get("timing")
                merged = merge_summaries(dict(self.summary))
                self.summary.clear()
                self.summary.update(merged)
                self.summary["timing"] = timing
                barrier("atropos-trim-finish")
            return retcode
        else:
            # sharded parallel mode
            self.summary.update(mode="parallel", threads=options.threads)
            return self.run_parallel(record_handler, writers)

    def run_parallel(self, record_handler, writers):
        """Parallel trimming over worker shards (see
        ``atropos_tpu.commands.multicore``)."""
        from atropos_tpu.commands.multicore import run_parallel_trim

        return run_parallel_trim(self, record_handler, writers)

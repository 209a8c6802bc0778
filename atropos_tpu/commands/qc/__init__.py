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
            retcode = self._run_native(pipeline_args)
            if retcode is not None:
                return retcode
            self.summary.update(mode="serial", threads=1)
            return run_interruptible(pipeline_class(**pipeline_args), self)
        self.summary.update(mode="parallel", threads=self.threads)
        return self._run_parallel(pipeline_class, pipeline_args)

    def _run_native(self, pipeline_args):
        """Native-chunk fast path: parse chunks with the C runtime and
        feed ``collect_matrices`` directly from gathered byte matrices —
        no per-record Python objects anywhere (the qc twin of the trim
        turbo driver). Returns the exit code, or None when the
        configuration needs the record pipeline (non-path inputs,
        colorspace, SRA, subsampling, per-tile stats, interleaved)."""
        import numpy as np

        from atropos_tpu import runtime

        options = self.options
        if (
            not runtime.available()
            or options.colorspace
            or getattr(options, "sra_reader", None)
            or options.subsample
            or options.interleaved_input
            or pipeline_args.get("tiles")
        ):
            return None
        from atropos_tpu.engine.turbo import (
            _ChunkStream,
            _TurboRunnerBase,
            _maybe_prefetch,
        )

        fmt1 = _TurboRunnerBase._stream_format(options.input1, options.format)
        if fmt1 is None:
            return None
        fmt2 = None
        if self.paired:
            fmt2 = _TurboRunnerBase._stream_format(
                options.input2, options.format
            )
            if fmt2 is None:
                return None

        from atropos_tpu.commands.cli import int_or_str
        from atropos_tpu.runtime import _i32, _i64, _lib, _u8

        quota = int_or_str(options.max_reads) or None
        chunk_bytes = _TurboRunnerBase.CHUNK_BYTES
        slice_records = 65536

        def gather(chunk, sub, offs_arr):
            offs = np.ascontiguousarray(offs_arr[sub], np.int64)
            lens = np.ascontiguousarray(chunk.seq_len[sub], np.int32)
            width = max(1, int(lens.max(initial=0)))
            out = np.zeros((offs.shape[0], width), np.uint8)
            _lib.gather_padded(
                _u8(chunk.buf), _i64(offs), _i32(lens),
                offs.shape[0], width, _u8(out),
            )
            return out, lens

        def consume(path, fmt, part):
            """Stream one file into one statistics part; (records, bp)."""
            stream = _maybe_prefetch(_ChunkStream(path, chunk_bytes, fmt))
            total = 0
            bp = 0
            try:
                while True:
                    chunk = stream.next_chunk()
                    if chunk is None:
                        break
                    avail = chunk.n
                    if quota is not None:
                        avail = min(avail, quota - total)
                        if avail <= 0:
                            break
                    for start in range(0, avail, slice_records):
                        sub = slice(start, min(start + slice_records, avail))
                        seqs, lens = gather(chunk, sub, chunk.seq_off)
                        quals = None
                        if fmt == "fastq":
                            quals, _ = gather(chunk, sub, chunk.qual_off)
                        part.collect_matrices(seqs, quals, lens)
                    total += avail
                    bp += int(chunk.seq_len[:avail].sum())
            finally:
                stream.close()
            return total, bp

        stats_class = (
            PairedEndReadStatistics if self.paired else SingleEndReadStatistics
        )
        stats = stats_class(**pipeline_args)
        if self.paired:
            total, bp_counts = self._consume_paired(
                options, fmt1, fmt2, stats, gather, quota, chunk_bytes,
                slice_records,
            )
        else:
            total, bp1 = consume(options.input1, fmt1, stats)
            bp_counts = (bp1, 0)

        self._finish_native(total, bp_counts, stats)
        return 0

    @staticmethod
    def _consume_paired(options, fmt1, fmt2, stats, gather, quota,
                        chunk_bytes, slice_records):
        """Lockstep consumption of both mate files with the vectorized
        pair-name validation (the scalar PairedSequenceReader's
        contract)."""
        from atropos_tpu.engine.turbo import (
            _ChunkStream,
            _maybe_prefetch,
            validate_pair_names,
        )
        from atropos_tpu.io.seqio import FormatError

        s1 = _maybe_prefetch(
            _ChunkStream(options.input1, chunk_bytes, fmt1)
        )
        s2 = _maybe_prefetch(
            _ChunkStream(options.input2, chunk_bytes, fmt2)
        )
        total = 0
        bp1 = bp2 = 0
        cur1 = cur2 = None
        pos1 = pos2 = 0
        try:
            while True:
                if quota is not None and total >= quota:
                    break
                if cur1 is None or pos1 == cur1.n:
                    cur1 = s1.next_chunk()
                    pos1 = 0
                if cur2 is None or pos2 == cur2.n:
                    cur2 = s2.next_chunk()
                    pos2 = 0
                if cur1 is None or cur2 is None:
                    if (cur1 is None) != (cur2 is None):
                        more, less = (2, 1) if cur1 is None else (1, 2)
                        raise FormatError(
                            "Reads are improperly paired. There are more "
                            "reads in file {0} than in file {1}.".format(
                                more, less
                            )
                        )
                    break
                take = min(cur1.n - pos1, cur2.n - pos2, slice_records)
                if quota is not None:
                    take = min(take, quota - total)
                sub1 = slice(pos1, pos1 + take)
                sub2 = slice(pos2, pos2 + take)
                validate_pair_names(cur1, sub1, cur2, sub2)
                for chunk, sub, part, fmt in (
                    (cur1, sub1, stats.read1, fmt1),
                    (cur2, sub2, stats.read2, fmt2),
                ):
                    seqs, lens = gather(chunk, sub, chunk.seq_off)
                    quals = None
                    if fmt == "fastq":
                        quals, _ = gather(chunk, sub, chunk.qual_off)
                    part.collect_matrices(seqs, quals, lens)
                bp1 += int(cur1.seq_len[sub1].sum())
                bp2 += int(cur2.seq_len[sub2].sum())
                pos1 += take
                pos2 += take
                total += take
        finally:
            s1.close()
            s2.close()
        return total, (bp1, bp2)

    def _finish_native(self, total, bp_counts, stats):
        self.summary.update(mode="turbo", threads=1)
        if total:
            self.summary.update(
                record_counts={0: total},
                total_record_count=total,
                bp_counts={0: list(bp_counts)},
                total_bp_counts=tuple(bp_counts),
                sum_total_bp_count=sum(bp_counts),
            )
        else:
            self.summary.update(
                record_counts={},
                total_record_count=0,
                bp_counts={},
                total_bp_counts=(),
                sum_total_bp_count=0,
            )
        self.summary["pre"] = {0: stats.summarize()}
        return 0

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

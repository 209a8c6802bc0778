"""Turbo trim path: zero-Python-object streaming trim.

For the common single-end configurations (fixed cuts + quality/NextSeq
trimming + 3'/5' adapter trimming + length/N filters, action=trim) the
entire per-read pipeline is expressible as *interval arithmetic*: each
stage only narrows a per-read keep-window [start, stop). This driver
streams the input file in chunks through the native C parser
(:mod:`atropos_tpu.runtime`), runs the batched device kernels over padded
matrices, resolves the final windows, and assembles output bytes with the
native formatter — no per-read Python objects anywhere.

Output is byte-identical to the scalar pipeline (asserted by the
differential tests); all summary statistics (per-adapter histograms,
trimmed-bp counters, filter counts) are accumulated via numpy and written
into the same stat objects the scalar pipeline uses, so reports are
unchanged.
"""
import logging
import os

import numpy as np

from atropos_tpu.adapters import ANYWHERE, BACK, FRONT, PREFIX, SUFFIX, Adapter, ColorspaceAdapter
from atropos_tpu.commands.trim.filters import (
    NContentFilter,
    NoFilter,
    TooLongReadFilter,
    TooShortReadFilter,
    TrimmedFilter,
    UntrimmedFilter,
)
from atropos_tpu.commands.trim.modifiers import (
    AdapterCutter,
    NextseqQualityTrimmer,
    QualityTrimmer,
    UnconditionalCutter,
)
from atropos_tpu import runtime
from atropos_tpu.align.batched import (
    BatchAligner,
    nextseq_trim_batch,
    quality_trim_batch,
)

_UPPER_LUT = None


def _upper(arr):
    global _UPPER_LUT
    if _UPPER_LUT is None:
        lut = np.arange(256, dtype=np.uint8)
        lut[ord("a") : ord("z") + 1] = np.arange(
            ord("A"), ord("Z") + 1, dtype=np.uint8
        )
        _UPPER_LUT = lut
    return _UPPER_LUT[arr]


class TurboTrimRunner:
    """Streaming interval-based trim for eligible configurations."""

    CHUNK_BYTES = 64 * 1024 * 1024
    MAX_BATCH = 16384

    @classmethod
    def build(cls, command_runner, record_handler, writers):
        """Return a runner if the configuration is turbo-eligible."""
        from atropos_tpu.commands.trim import RecordHandler

        options = command_runner.options
        if not runtime.available():
            return None
        if options.paired or options.colorspace:
            return None
        if not isinstance(record_handler, RecordHandler):
            return None
        if options.action != "trim" or options.times != 1:
            return None
        # single-file FASTQ input/output (optionally gz/bz2/xz compressed:
        # input streams through the codec, output goes through the same
        # xopen writer the scalar pipeline uses, so bytes stay identical)
        from atropos_tpu.io.compression import splitext_compressed

        input1 = options.input1
        if not input1 or not isinstance(input1, str):
            return None
        if options.input2 or options.interleaved_input:
            return None
        if splitext_compressed(input1)[1] not in (".fastq", ".fq"):
            return None
        output = options.output
        if not output or output == "-" or "{name}" in (output or ""):
            return None
        if splitext_compressed(output)[1] not in (".fastq", ".fq"):
            return None
        if (
            options.info_file
            or options.rest_file
            or options.wildcard_file
            or options.untrimmed_output
            or options.too_short_output
            or options.too_long_output
            or options.merged_output
            or options.stats
        ):
            return None

        modifiers = record_handler.modifiers
        cut_front = cut_back = 0
        quality = None
        nextseq = None
        cutter = None
        for entry in modifiers.modifiers:
            mod = entry[0] if isinstance(entry, list) else entry
            if isinstance(mod, UnconditionalCutter):
                cut_front, cut_back = mod.front_length, mod.back_length
            elif isinstance(mod, QualityTrimmer):
                quality = mod
            elif isinstance(mod, NextseqQualityTrimmer):
                nextseq = mod
            elif isinstance(mod, AdapterCutter):
                cutter = mod
            else:
                return None
        # stage order must be the default C → G → Q → A
        order = [
            type(entry[0] if isinstance(entry, list) else entry)
            for entry in modifiers.modifiers
        ]
        expected = [
            t
            for t, present in (
                (UnconditionalCutter, cut_front or cut_back),
                (NextseqQualityTrimmer, nextseq),
                (QualityTrimmer, quality),
                (AdapterCutter, cutter),
            )
            if present
        ]
        if order != expected:
            return None

        adapters = cutter.adapters if cutter else []
        for adapter in adapters:
            if not isinstance(adapter, Adapter) or isinstance(
                adapter, ColorspaceAdapter
            ):
                return None
            if not adapter.indels and adapter.where in (PREFIX, SUFFIX):
                # no-indel anchored compare: host path (rare)
                return None

        filters = record_handler.filters
        for ftype in filters.filters:
            if ftype not in (
                TooShortReadFilter,
                TooLongReadFilter,
                NContentFilter,
                TrimmedFilter,
                UntrimmedFilter,
            ):
                return None

        return cls(
            command_runner,
            record_handler,
            writers,
            cut_front=cut_front,
            cut_back=cut_back,
            quality=quality,
            nextseq=nextseq,
            cutter=cutter,
        )

    def __init__(
        self,
        command_runner,
        record_handler,
        writers,
        *,
        cut_front,
        cut_back,
        quality,
        nextseq,
        cutter,
    ):
        self.command_runner = command_runner
        self.options = command_runner.options
        self.record_handler = record_handler
        self.writers = writers
        self.cut_front = cut_front
        self.cut_back = cut_back
        self.quality = quality
        self.nextseq = nextseq
        self.cutter = cutter
        self.adapters = cutter.adapters if cutter else []
        from atropos_tpu.engine import make_batch_aligner

        self._aligners = [
            make_batch_aligner(adapter) for adapter in self.adapters
        ]

    # -- main loop ----------------------------------------------------------

    def run(self):
        options = self.options
        logging.getLogger().info("Running turbo device trim pipeline")
        out = self.writers.get_writer(options.output)

        total_records = 0
        total_bp = 0
        # multi-host sharding: chunk boundaries are deterministic (same
        # file, same chunking), so round-robin chunk ownership partitions
        # the records exactly once across hosts
        shard_rank = getattr(self.command_runner, "shard_rank", 0)
        shard_count = getattr(self.command_runner, "shard_count", 1)
        chunk_index = 0
        with self._open_input(options.input1) as infile:
            carry = b""
            while True:
                data = infile.read(self.CHUNK_BYTES)
                if not data and not carry:
                    break
                buf = carry + data
                if not buf:
                    break
                if not data and not buf.endswith(b"\n"):
                    # tolerate a missing final newline (the scalar reader does)
                    buf += b"\n"
                chunk = runtime.parse_chunk(buf)
                if chunk.n == 0 and not data:
                    if buf.strip():
                        raise RuntimeError("trailing garbage in FASTQ input")
                    break
                carry = buf[chunk.consumed :] if data else b""
                if chunk.n:
                    if chunk_index % shard_count == shard_rank:
                        records, bp = self._process_chunk(chunk, out)
                        total_records += records
                        total_bp += bp
                    chunk_index += 1
                if not data:
                    break

        summary = self.command_runner.summary
        if total_records:
            summary.update(
                record_counts={0: total_records},
                total_record_count=total_records,
                bp_counts={0: [total_bp, 0]},
                total_bp_counts=(total_bp, 0),
                sum_total_bp_count=total_bp,
            )
        else:
            # empty input: match the scalar batcher, which never emits a
            # batch and leaves the count structures empty
            summary.update(
                record_counts={},
                total_record_count=0,
                bp_counts={},
                total_bp_counts=(),
                sum_total_bp_count=0,
            )
        summary.update(self.record_handler.summarize())
        self.writers.close()
        return 0

    def _process_chunk(self, chunk, out):
        total = chunk.n
        total_bp = int(chunk.seq_len.sum())
        for start in range(0, total, self.MAX_BATCH):
            sub = slice(start, min(start + self.MAX_BATCH, total))
            self._process_batch(chunk, sub, out)
        return total, total_bp

    def _process_batch(self, chunk, sub, out):
        n = chunk.seq_len[sub].astype(np.int32)
        batch = n.shape[0]
        keep_start = np.zeros(batch, np.int32)
        keep_stop = n.copy()
        orig_len = n.copy()

        # C: fixed cuts (Sequence.clip semantics; no-op for empty reads)
        if self.cut_front or self.cut_back:
            nonempty = n > 0
            new_start = np.minimum(self.cut_front, n)
            new_stop = np.maximum(new_start, n + self.cut_back)
            keep_start = np.where(nonempty, new_start, keep_start)
            keep_stop = np.where(nonempty, new_stop, keep_stop)
            # Trimmer.clip counts the REQUESTED front+back bases, even
            # when the read is shorter (reference Sequence.clip semantics)
            cutter_mod = self._find_mod(UnconditionalCutter)
            cutter_mod.trimmed_bases += int(
                (self.cut_front - self.cut_back) * nonempty.sum()
            )

        width = int(n.max()) if batch else 0
        width = max(8, width)
        # window matrices gathered once at the fixed-cut offset
        seqs = self._gather(chunk, sub, chunk.seq_off, keep_start, width)
        quals = self._gather(chunk, sub, chunk.qual_off, keep_start, width)
        win_len = keep_stop - keep_start

        # G: NextSeq two-color 3' trim
        if self.nextseq is not None:
            stops = np.asarray(
                nextseq_trim_batch(
                    seqs, quals, win_len, self.nextseq.cutoff, self.nextseq.base
                )
            )
            nonempty = win_len > 0
            new_stop = keep_start + stops
            self.nextseq.trimmed_bases += int(
                (keep_stop - new_stop)[nonempty].sum()
            )
            keep_stop = np.where(nonempty, new_stop, keep_stop)
            win_len = keep_stop - keep_start

        # Q: BWA-style quality trim
        if self.quality is not None:
            q_start, q_stop = (
                np.asarray(x)
                for x in quality_trim_batch(
                    quals,
                    win_len,
                    self.quality.cutoff_front,
                    self.quality.cutoff_back,
                    self.quality.base,
                )
            )
            nonempty = win_len > 0
            new_start = keep_start + q_start
            new_stop = keep_start + q_stop
            self.quality.trimmed_bases += int(
                (win_len - (q_stop - q_start))[nonempty].sum()
            )
            keep_start = np.where(nonempty, new_start, keep_start)
            keep_stop = np.where(nonempty, new_stop, keep_stop)
            if self.quality.cutoff_front:
                # window start moved: regather for the adapter stage
                win_len = keep_stop - keep_start
                seqs = self._gather(chunk, sub, chunk.seq_off, keep_start, width)
            else:
                win_len = keep_stop - keep_start

        # A: adapter matching + trim
        matched = np.zeros(batch, bool)
        if self.adapters:
            seqs_u = _upper(seqs)
            best = None
            for adapter_idx, aligner in enumerate(self._aligners):
                res = aligner.locate_batch(seqs_u, win_len)
                res = {key: np.array(val) for key, val in res.items()}
                res["found"] &= win_len > 0
                res = self._validate(adapter_idx, res)
                if best is None:
                    best = res
                    best_idx = np.where(res["found"], adapter_idx, -1)
                else:
                    better = res["found"] & (
                        (~best["found"]) | (res["matches"] > best["matches"])
                    )
                    for key in res:
                        best[key] = np.where(better, res[key], best[key])
                    best_idx = np.where(better, adapter_idx, best_idx)

            matched = best["found"]
            # resolve trims per adapter type
            front_match = self._front_flags(best, best_idx)
            new_start = np.where(
                matched & front_match, keep_start + best["stop2"], keep_start
            )
            new_stop = np.where(
                matched & ~front_match, keep_start + best["start2"], keep_stop
            )
            self._accumulate_adapter_stats(
                best, best_idx, matched, front_match, win_len, seqs
            )
            keep_start = new_start
            keep_stop = np.maximum(keep_start, new_stop)
            self.cutter.with_adapters += int(matched.sum())

        # filters, in registration order (first match wins)
        final_len = keep_stop - keep_start
        dest_none = np.ones(batch, bool)
        filters = self.record_handler.filters
        for ftype, wrapper in filters.filters.items():
            if ftype is TooShortReadFilter:
                hit = dest_none & (final_len < wrapper.filter.minimum_length)
            elif ftype is TooLongReadFilter:
                hit = dest_none & (final_len > wrapper.filter.maximum_length)
            elif ftype is NContentFilter:
                ncount = self._count_n(chunk, sub, keep_start, keep_stop, width)
                fil = wrapper.filter
                if fil.is_proportion:
                    with np.errstate(divide="ignore", invalid="ignore"):
                        frac = np.where(final_len > 0, ncount / final_len, 0)
                    hit = dest_none & (frac > fil.cutoff)
                else:
                    hit = dest_none & (ncount > fil.cutoff)
            elif ftype is TrimmedFilter:
                hit = dest_none & matched
            elif ftype is UntrimmedFilter:
                hit = dest_none & ~matched
            else:  # pragma: no cover - excluded at build time
                raise AssertionError(ftype)
            wrapper.filtered += int(hit.sum())
            dest_none &= ~hit

        keep = dest_none
        formatter = self.record_handler.formatters.seq_formatters.get(NoFilter)
        self.record_handler.formatters.discarded += int((~keep).sum())
        if formatter is not None:
            formatter.written += int(keep.sum())
            formatter.read1_bp += int(final_len[keep].sum())
            data = self._format(chunk, sub, keep_start, keep_stop, keep)
            out.write(data.decode("ascii"))

    # -- helpers ------------------------------------------------------------

    @staticmethod
    def _open_input(path):
        """Binary chunk stream over the input: plain file, or streaming
        decompression for gz/bz2/xz (system gzip subprocess when
        available, so decompression overlaps compute in its own
        process)."""
        from atropos_tpu.io.compression import get_file_opener

        opener = get_file_opener(path)
        if opener is not None:
            return opener(path, "rb")
        return open(path, "rb")

    def _find_mod(self, mod_class):
        for entry in self.record_handler.modifiers.modifiers:
            mod = entry[0] if isinstance(entry, list) else entry
            if isinstance(mod, mod_class):
                return mod
        raise AssertionError(mod_class)

    def _gather(self, chunk, sub, offs, extra_off, width):
        from atropos_tpu.runtime import _i32, _i64, _lib, _u8

        offs_sub = np.ascontiguousarray(
            offs[sub] + extra_off.astype(np.int64), dtype=np.int64
        )
        lens_sub = np.ascontiguousarray(
            (chunk.seq_len[sub] - extra_off).astype(np.int32)
        )
        out = np.zeros((offs_sub.shape[0], width), dtype=np.uint8)
        _lib.gather_padded(
            _u8(chunk.buf), _i64(offs_sub), _i32(lens_sub),
            offs_sub.shape[0], width, _u8(out),
        )
        return out

    def _validate(self, adapter_idx, res):
        """Apply the max_rmp gate (other constraints enforced in-kernel)."""
        adapter = self.adapters[adapter_idx]
        if adapter.max_rmp is None:
            return res
        found = res["found"]
        size = res["stop1"] - res["start1"]
        ok = found.copy()
        for i in np.nonzero(found)[0]:
            prob = adapter.match_probability(
                int(res["matches"][i]), int(size[i])
            )
            if prob > adapter.max_rmp:
                ok[i] = False
        res["found"] = ok
        return res

    def _front_flags(self, best, best_idx):
        """Per-read front/back decision, matching Adapter._front_flag and
        Match._guess_is_front for 'anywhere' adapters."""
        batch = best_idx.shape[0]
        front = np.zeros(batch, bool)
        for idx, adapter in enumerate(self.adapters):
            mask = best_idx == idx
            if not mask.any():
                continue
            if adapter.where in (FRONT, PREFIX):
                front |= mask
            elif adapter.where == ANYWHERE:
                front |= mask & (best["start2"] == 0)
        return front

    def _accumulate_adapter_stats(
        self, best, best_idx, matched, front_match, win_len, seqs
    ):
        """Update per-adapter CountingDict/NestedDict stats exactly as
        Adapter._trimmed_front/_trimmed_back do."""
        for idx, adapter in enumerate(self.adapters):
            mask = matched & (best_idx == idx)
            if not mask.any():
                continue
            fmask = mask & front_match
            bmask = mask & ~front_match
            if fmask.any():
                stops = best["stop2"][fmask]
                errs = best["cost"][fmask]
                for stop, err in zip(stops, errs):
                    adapter.lengths_front[int(stop)] += 1
                    adapter.errors_front[int(stop)][int(err)] += 1
            if bmask.any():
                starts = best["start2"][bmask]
                errs = best["cost"][bmask]
                lens = win_len[bmask]
                rows = np.nonzero(bmask)[0]
                for row, rstart, err, wlen in zip(rows, starts, errs, lens):
                    removed = int(wlen - rstart)
                    adapter.lengths_back[removed] += 1
                    adapter.errors_back[removed][int(err)] += 1
                    if rstart > 0:
                        base = chr(seqs[row, rstart - 1])
                    else:
                        base = ""
                    if base not in "ACGT":
                        base = ""
                    adapter.adjacent_bases[base] += 1

    def _count_n(self, chunk, sub, keep_start, keep_stop, width):
        seqs = self._gather(chunk, sub, chunk.seq_off, keep_start, width)
        idx = np.arange(width, dtype=np.int32)[None, :]
        in_win = idx < (keep_stop - keep_start)[:, None]
        is_n = (seqs == ord("N")) | (seqs == ord("n"))
        return (is_n & in_win).sum(axis=1)

    def _format(self, chunk, sub, keep_start, keep_stop, keep):
        from atropos_tpu.runtime import _i32, _i64, _lib, _u8

        name_off = np.ascontiguousarray(chunk.name_off[sub])
        name_len = np.ascontiguousarray(chunk.name_len[sub])
        seq_off = np.ascontiguousarray(chunk.seq_off[sub])
        plus_off = np.ascontiguousarray(chunk.plus_off[sub])
        plus_len = np.ascontiguousarray(chunk.plus_len[sub])
        qual_off = np.ascontiguousarray(chunk.qual_off[sub])
        ks = np.ascontiguousarray(keep_start, np.int32)
        kp = np.ascontiguousarray(keep_stop, np.int32)
        kmask = np.ascontiguousarray(keep.astype(np.uint8))
        cap = int(
            name_len.sum() + plus_len.sum()
            + 2 * np.maximum(kp - ks, 0)[keep].sum()
            + name_off.shape[0] * 8 + 16
        )
        out = np.empty(cap, dtype=np.uint8)
        written = _lib.fastq_format_trimmed(
            _u8(chunk.buf),
            _i64(name_off), _i32(name_len),
            _i64(seq_off),
            _i64(plus_off), _i32(plus_len),
            _i64(qual_off),
            _i32(ks), _i32(kp), _u8(kmask),
            name_off.shape[0],
            _u8(out), cap,
        )
        if written < 0:
            raise RuntimeError("format capacity exceeded")
        return out[:written].tobytes()

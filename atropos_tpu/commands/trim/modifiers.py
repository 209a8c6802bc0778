"""Read modifiers: every transformation the trim command can apply.

Host-side record-at-a-time implementations with behavioral parity to the
reference (``atropos/commands/trim/modifiers.py``). The hot modifiers
(AdapterCutter, QualityTrimmer, InsertAdapterCutter) have batched device
counterparts in ``atropos_tpu.engine``; these scalar versions define their
semantics and serve rare paths (colorspace, masking, names).
"""
from collections import OrderedDict
import copy
import re

from atropos_tpu import AtroposError
from atropos_tpu.align import (
    Aligner,
    InsertAligner,
    SEMIGLOBAL,
    START_WITHIN_SEQ1,
    STOP_WITHIN_SEQ2,
)
from atropos_tpu.util import BASE_COMPLEMENTS, mean, quals2ints, reverse_complement
from atropos_tpu.commands.trim.qualtrim import nextseq_trim_index, quality_trim_index


class Modifier:
    """Base class for single-read modifiers."""

    @property
    def name(self):
        return self.__class__.__name__

    @property
    def description(self):
        return getattr(self, "display_str", self.name)

    def summarize(self):
        return {}


class ReadPairModifier(Modifier):
    """Base class of modifiers that edit a pair of reads simultaneously."""

    def __call__(self, read1, read2):
        raise NotImplementedError()


class Trimmer(Modifier):
    """Base class of modifiers that trim bases from reads."""

    def __init__(self):
        self.trimmed_bases = 0

    def __call__(self, read):
        raise NotImplementedError()

    def subseq(self, read, begin=0, end=None):
        if begin or (end is not None):
            front_bases, back_bases, new_read = read.subseq(begin, end)
            self.trimmed_bases += front_bases + back_bases
            return new_read
        return read

    def clip(self, read, front=0, back=0):
        if (front or back) and len(read) > 0:
            front_bases, back_bases, new_read = read.clip(front, back)
            self.trimmed_bases += front_bases + back_bases
            return new_read
        return read

    def summarize(self):
        return dict(bp_trimmed=self.trimmed_bases)


_UNSET = object()


class AdapterCutter(Modifier):
    """Repeatedly find and remove the best-matching adapter (up to ``times``
    rounds); best = most matching bases across all adapters.

    The first-round match may be precomputed by the batched device engine
    and injected via ``first_match`` (bit-identical to ``_best_match``);
    later rounds (rare) fall back to scalar matching.
    """

    def __init__(self, adapters=None, times=1, action="trim"):
        super().__init__()
        self.adapters = adapters or []
        self.times = times
        self.action = action
        self.with_adapters = 0

    def _best_match(self, read):
        best = None
        for adapter in self.adapters:
            match = adapter.match_to(read)
            if match is None:
                continue
            if best is None or match.matches > best.matches:
                best = match
        return best

    def __call__(self, read, first_match=_UNSET):
        if len(read) == 0:
            return read

        matches = []
        trimmed_read = read
        for round_idx in range(self.times):
            if round_idx == 0 and first_match is not _UNSET:
                match = first_match
            else:
                match = self._best_match(trimmed_read)
            if match is None:
                break
            matches.append(match)
            trimmed_read = match.adapter.trimmed(match)

        if not matches:
            trimmed_read.match = None
            trimmed_read.match_info = None
            return trimmed_read

        assert len(trimmed_read) < len(read), "Trimmed read isn't shorter than original"

        if self.action == "trim":
            pass
        elif self.action == "mask":
            # restore masked-out adapter bases as Ns with original qualities
            masked_sequence = trimmed_read.sequence
            for match in sorted(matches, reverse=True, key=lambda m: m.astart):
                ns = "N" * (
                    len(match.read.sequence)
                    - len(match.adapter.trimmed(match).sequence)
                )
                if match.front:
                    masked_sequence = ns + masked_sequence
                else:
                    masked_sequence += ns
            trimmed_read.sequence = masked_sequence
            trimmed_read.qualities = matches[0].read.qualities
            assert len(trimmed_read.sequence) == len(read)
        elif self.action is None:
            trimmed_read = read

        trimmed_read.match = matches[-1]
        trimmed_read.match_info = [match.get_info_record() for match in matches]

        self.with_adapters += 1
        return trimmed_read

    def summarize(self):
        adapters_summary = OrderedDict()
        for adapter in self.adapters:
            adapters_summary[adapter.name] = adapter.summarize()
        return dict(
            records_with_adapters=self.with_adapters, adapters=adapters_summary
        )


class ErrorCorrectorMixin:
    """Correct mismatches in the overlapping portion of a read pair using
    base-quality voting ('liberal'/'conservative') or masking ('N')."""

    def __init__(self, mismatch_action=None, min_qual_difference=1):
        self.mismatch_action = mismatch_action
        self.r1r2_min_qual_difference = min_qual_difference
        self.r2r1_min_qual_difference = -1 * min_qual_difference
        self.corrected_pairs = 0
        self.corrected_bp = [0, 0]

    def correct_errors(self, read1, read2, insert_match, truncate_seqs=False):
        if read1.corrected > 0 or read2.corrected > 0:
            return

        r1_seq = list(read1.sequence)
        r2_seq = list(read2.sequence)
        len1 = len(r1_seq)
        len2 = len(r2_seq)

        has_quals = read1.qualities and read2.qualities
        if has_quals:
            r1_qual = list(read1.qualities)
            r2_qual = list(read2.qualities)
        elif self.mismatch_action in ("liberal", "conservative"):
            raise ValueError(
                "Cannot perform quality-based error correction on reads "
                "lacking quality information"
            )

        if truncate_seqs:
            if len1 > len2:
                r1_seq = r1_seq[:len2]
                if has_quals:
                    r1_qual = r1_qual[:len2]
            elif len2 > len1:
                r2_seq = r2_seq[:len1]
                if has_quals:
                    r2_qual = r2_qual[:len1]
                len2 = len1

        r1_start = insert_match[2]
        r1_end = insert_match[3]
        r1_changed = 0
        r2_start = len2 - insert_match[1]
        r2_end = len2 - insert_match[0]
        r2_changed = 0
        quals_equal = []

        for i, j in zip(range(r1_start, r1_end), range(r2_end - 1, r2_start - 1, -1)):
            base1 = r1_seq[i]
            base2 = BASE_COMPLEMENTS[r2_seq[j]]
            if base1 == base2:
                continue
            if self.mismatch_action == "N":
                r1_seq[i] = "N"
                r2_seq[j] = "N"
                r1_changed += 1
                r2_changed += 1
            elif base1 == "N":
                r1_seq[i] = base2
                if has_quals:
                    r1_qual[i] = r2_qual[j]
                r1_changed += 1
            elif base2 == "N":
                r2_seq[j] = BASE_COMPLEMENTS[base1]
                if has_quals:
                    r2_qual[j] = r1_qual[i]
                r2_changed += 1
            elif has_quals:
                diff = ord(r1_qual[i]) - ord(r2_qual[j])
                if diff >= self.r1r2_min_qual_difference:
                    r2_seq[j] = BASE_COMPLEMENTS[base1]
                    r2_qual[j] = r1_qual[i]
                    r2_changed += 1
                elif diff <= self.r2r1_min_qual_difference:
                    r1_seq[i] = base2
                    r1_qual[i] = r2_qual[j]
                    r1_changed += 1
                elif self.mismatch_action == "liberal":
                    quals_equal.append((i, j, base1, base2))

        if quals_equal:
            mean_qual1 = mean([ord(b) for b in r1_qual[r1_start:r1_end]])
            mean_qual2 = mean([ord(b) for b in r2_qual[r2_start:r2_end]])
            diff = mean_qual1 - mean_qual2
            if diff > 1:
                for i, j, base1, base2 in quals_equal:
                    r2_seq[j] = BASE_COMPLEMENTS[base1]
                    r2_qual[j] = r1_qual[i]
                    r2_changed += 1
            elif diff < -1:
                for i, j, base1, base2 in quals_equal:
                    r1_seq[i] = base2
                    r1_qual[i] = r2_qual[j]
                    r1_changed += 1

        if r1_changed or r2_changed:
            self.corrected_pairs += 1

            def update_read(read, seq, qual, seq_len, read_num, num_changed):
                self.corrected_bp[read_num] += num_changed
                read.corrected = num_changed
                new_seq = "".join(seq)
                partial = truncate_seqs and len(read.sequence) > seq_len
                if partial:
                    read.sequence = new_seq + read.sequence[seq_len:]
                else:
                    read.sequence = new_seq
                if has_quals:
                    new_qual = "".join(qual)
                    if partial:
                        read.qualities = new_qual + read.qualities[seq_len:]
                    else:
                        read.qualities = new_qual

            if r1_changed:
                update_read(
                    read1, r1_seq, r1_qual if has_quals else None, len1, 0, r1_changed
                )
            if r2_changed:
                update_read(
                    read2, r2_seq, r2_qual if has_quals else None, len2, 1, r2_changed
                )

    def summarize(self):
        return dict(
            records_corrected=self.corrected_pairs, bp_corrected=self.corrected_bp
        )


class InsertAdapterCutter(ReadPairModifier, ErrorCorrectorMixin):
    """Paired-end cutter: insert-overlap matching first, falling back to
    independent adapter matches; optional symmetric-match duplication and
    error correction."""

    def __init__(
        self,
        adapter1,
        adapter2,
        action="trim",
        mismatch_action=None,
        symmetric=True,
        min_insert_overlap=1,
        **aligner_args,
    ):
        ErrorCorrectorMixin.__init__(self, mismatch_action)
        self.adapter1 = adapter1
        self.adapter2 = adapter2
        self.aligner = InsertAligner(
            adapter1.sequence,
            adapter2.sequence,
            min_insert_overlap=min_insert_overlap,
            **aligner_args,
        )
        self.min_insert_len = min_insert_overlap
        self.action = action
        self.symmetric = symmetric
        self.with_adapters = [0, 0]

    def __call__(self, read1, read2, insert_candidates=False):
        read_lengths = [len(r) for r in (read1, read2)]
        if any(l < self.min_insert_len for l in read_lengths):
            return (read1, read2)

        match = self.aligner.match_insert(
            read1.sequence, read2.sequence,
            precomputed_matches=insert_candidates,
        )
        read1.insert_overlap = read2.insert_overlap = match is not None
        insert_match = None
        correct_errors = False

        if match:
            insert_match, adapter_match1, adapter_match2 = match
            correct_errors = self.mismatch_action is not None and insert_match[5] > 0
        else:
            adapter_match1 = self.adapter1.match_to(read1)
            adapter_match2 = self.adapter2.match_to(read2)
            if (
                self.mismatch_action
                and adapter_match1
                and adapter_match2
                and adapter_match1.rstart == adapter_match2.rstart
            ):
                insert_match = (
                    read_lengths[1] - adapter_match1.rstart,
                    read_lengths[1],
                    0,
                    adapter_match1.rstart,
                )
                correct_errors = True

        if self.symmetric and sum(bool(m) for m in (adapter_match1, adapter_match2)) == 1:

            def create_symmetric_match(match, read, read_len):
                if match.rstart > read_len:
                    return None
                match = match.copy()
                if match.rstop < read_len:
                    match.astop -= read_len - match.rstop
                    match.rstop = read_len
                return match

            if adapter_match1:
                adapter_match2 = create_symmetric_match(
                    adapter_match1, read2, read_lengths[1]
                )
            else:
                adapter_match1 = create_symmetric_match(
                    adapter_match2, read1, read_lengths[0]
                )

            if (
                self.mismatch_action
                and not insert_match
                and adapter_match1
                and adapter_match2
            ):
                insert_match = (
                    read_lengths[1] - adapter_match1.rstart,
                    read_lengths[1],
                    0,
                    adapter_match1.rstart,
                )
                correct_errors = True

        if correct_errors:
            self.correct_errors(read1, read2, insert_match, truncate_seqs=True)

        return (
            self.trim(read1, self.adapter1, adapter_match1, 0),
            self.trim(read2, self.adapter2, adapter_match2, 1),
        )

    def trim(self, read, adapter, match, read_idx):
        if not match:
            read.match = None
            read.match_info = None
            return read

        match.adapter = adapter
        match.read = read
        match.front = False

        if self.action is None or match.rstart >= len(read):
            trimmed_read = read
        else:
            trimmed_read = adapter.trimmed(match)
            if self.action == "mask":
                masked_sequence = trimmed_read.sequence
                masked_sequence += "N" * (len(read) - len(trimmed_read))
                trimmed_read.sequence = masked_sequence
                trimmed_read.qualities = read.qualities
            elif self.action == "lower":
                pass

        trimmed_read.match = match
        trimmed_read.match_info = [match.get_info_record()]

        self.with_adapters[read_idx] += 1
        return trimmed_read

    def summarize(self):
        adapters_summary = tuple(
            {adapter.name: adapter.summarize()}
            for adapter in (self.adapter1, self.adapter2)
        )
        summary = dict(
            records_with_adapters=self.with_adapters, adapters=adapters_summary
        )
        if self.mismatch_action:
            summary.update(ErrorCorrectorMixin.summarize(self))
        return summary


class OverwriteRead(ReadPairModifier):
    """Replace a low-quality mate with the reverse complement of its
    high-quality partner (assessed over the first ``window_size`` bases)."""

    def __init__(
        self,
        worse_read_min_quality,
        better_read_min_quality,
        window_size,
        base=33,
        summary_fn=mean,
    ):
        self.worse_read_min_quality = worse_read_min_quality
        self.better_read_min_quality = better_read_min_quality
        self.window_size = window_size
        self.base = base
        self.summary_fn = summary_fn

    def __call__(self, read1, read2):
        if len(read1) < self.window_size or len(read2) < self.window_size:
            return (read1, read2)
        if not (read1.qualities and read2.qualities):
            raise ValueError(
                "OverwriteRead modifier does not work with reads lacking "
                "base qualities."
            )
        qual1 = list(quals2ints(read1.qualities[: self.window_size], self.base))
        summ1 = self.summary_fn(qual1)

        qual2 = list(quals2ints(read2.qualities[: self.window_size], self.base))
        summ2 = self.summary_fn(qual2)

        if summ1 < self.worse_read_min_quality and summ2 >= self.better_read_min_quality:
            read2.corrected = 1
            read1 = read2.reverse_complement()
        elif summ2 < self.worse_read_min_quality and summ1 >= self.better_read_min_quality:
            read1.corrected = 1
            read2 = read1.reverse_complement()

        return (read1, read2)


class UnconditionalCutter(Trimmer):
    """Remove a fixed number of bases from the front (positive lengths) and
    back (negative lengths) of each read."""

    display_str = "Cut unconditionally"

    def __init__(self, lengths=None):
        super().__init__()
        self.front_length = self.back_length = 0
        if lengths:
            self.front_length = sum(front for front in lengths if front > 0)
            self.back_length = sum(back for back in lengths if back < 0)

    def __call__(self, read):
        return self.clip(read, self.front_length, self.back_length)


class MinCutter(Trimmer):
    """Ensure a minimum number of bases has been cut from each end,
    counting (configurably) bases already removed by other trimming."""

    display_str = "Cut conditionally"

    def __init__(self, lengths=None, count_trimmed=True, only_trimmed=False):
        super().__init__()
        self.front_length = self.back_length = 0
        if lengths:
            self.front_length = sum(front for front in lengths if front > 0)
            self.back_length = sum(back for back in lengths if back < 0)
        self.count_trimmed = count_trimmed
        self.only_trimmed = only_trimmed

    def __call__(self, read):
        trim_front = trim_back = True
        if self.only_trimmed:
            if read.match:
                is_front = [match.is_front for match in read.match_info]
                if not any(is_front):
                    trim_front = False
                elif all(is_front):
                    trim_back = False
            else:
                return read

        def to_trim(offset, is_front):
            if self.count_trimmed:
                trimmed = read.clipped[offset] + read.clipped[offset + 2]
                if read.match:
                    trimmed += sum(
                        i.rsize_total
                        for i in read.match_info
                        if is_front == i.is_front
                    )
            elif read.match:
                trimmed = read.clipped[offset + 2]
            else:
                trimmed = read.clipped[offset]

            if is_front:
                return max(self.front_length - trimmed, 0)
            return min(trimmed + self.back_length, 0)

        return self.clip(
            read,
            to_trim(0, True) if trim_front else 0,
            to_trim(1, False) if trim_back else 0,
        )


class LengthTagModifier(Modifier):
    """Rewrite 'length=...' tags in read names to the current length."""

    def __init__(self, length_tag="length="):
        self.regex = re.compile(r"\b" + length_tag + r"[0-9]*\b")
        self.length_tag = length_tag

    def __call__(self, read):
        read = read[:]
        if read.name.find(self.length_tag) >= 0:
            read.name = self.regex.sub(
                self.length_tag + str(len(read.sequence)), read.name
            )
        return read


class SuffixRemover(Modifier):
    """Remove given suffixes from read names."""

    def __init__(self, suffixes=None):
        self.suffixes = suffixes or []

    def __call__(self, read):
        name = read.name
        for suffix in self.suffixes:
            if name.endswith(suffix):
                name = name[: -len(suffix)]
        read = read[:]
        read.name = name
        return read


class PrefixSuffixAdder(Modifier):
    """Add a prefix/suffix to read names ('{name}' = matched adapter)."""

    def __init__(self, prefix="", suffix=""):
        self.prefix = prefix
        self.suffix = suffix

    def __call__(self, read):
        read = read[:]
        adapter_name = "no_adapter"
        if read.match is not None:
            adapter_name = read.match.adapter.name
        read.name = (
            self.prefix.replace("{name}", adapter_name)
            + read.name
            + self.suffix.replace("{name}", adapter_name)
        )
        return read


class DoubleEncoder(Modifier):
    """Double-encode colorspace reads (0123. -> ACGTN)."""

    def __init__(self):
        self.double_encode_trans = str.maketrans("0123.", "ACGTN")

    def __call__(self, read):
        read = read[:]
        read.sequence = read.sequence.translate(self.double_encode_trans)
        return read


class ZeroCapper(Modifier):
    """Clamp negative quality values to zero."""

    def __init__(self, quality_base=33):
        qbase = quality_base
        self.zero_cap_trans = str.maketrans(
            "".join(map(chr, range(qbase))), chr(qbase) * qbase
        )

    def __call__(self, read):
        read = read[:]
        read.qualities = read.qualities.translate(self.zero_cap_trans)
        return read


class PrimerTrimmer(Trimmer):
    """Trim the primer base from colorspace reads."""

    display_str = "Primer-trimmed"

    def __call__(self, read):
        read = self.clip(read, 1)
        read.primer = ""
        return read


class NextseqQualityTrimmer(Trimmer):
    display_str = "Quality trimmed (NextSeq)"

    def __init__(self, cutoff=0, base=33):
        super().__init__()
        self.cutoff = cutoff
        self.base = base

    def __call__(self, read):
        if len(read) == 0:
            return read
        stop = nextseq_trim_index(read, self.cutoff, self.base)
        return self.subseq(read, end=stop)


class QualityTrimmer(Trimmer):
    display_str = "Quality-trimmed"

    def __init__(self, cutoff_front=0, cutoff_back=0, base=33):
        super().__init__()
        self.cutoff_front = cutoff_front
        self.cutoff_back = cutoff_back
        self.base = base

    def __call__(self, read):
        if len(read) == 0:
            return read
        start, stop = quality_trim_index(
            read.qualities, self.cutoff_front, self.cutoff_back, self.base
        )
        return self.subseq(read, start, stop)


class NEndTrimmer(Trimmer):
    """Trim N runs from both ends of reads."""

    display_str = "End Ns trimmed"

    def __init__(self):
        super().__init__()
        self.start_trim = re.compile(r"^N+")
        self.end_trim = re.compile(r"N+$")

    def __call__(self, read):
        if len(read) == 0:
            return read
        sequence = read.sequence
        start_cut = self.start_trim.match(sequence)
        end_cut = self.end_trim.search(sequence)
        start_cut = start_cut.end() if start_cut else 0
        end_cut = end_cut.start() if end_cut else len(read)
        return self.subseq(read, start_cut, end_cut)


class RRBSTrimmer(MinCutter):
    """Adapter-trimmed RRBS reads lose 2 extra bp on the 3' end."""

    display_str = "RRBS-trimmed"

    def __init__(self, trim_5p=0, trim_3p=2):
        super().__init__(
            (trim_5p, -1 * trim_3p), count_trimmed=False, only_trimmed=True
        )


class NonDirectionalBisulfiteTrimmer(Modifier):
    """Non-directional RRBS/WGBS: reads starting C[AG]A lose 2 bp at the 5'
    end; otherwise RRBS rules apply if requested."""

    display_str = "Bisulfite-trimmed (Non-directional)"
    _regex = re.compile(r"^C[AG]A")

    def __init__(self, trim_5p=2, trim_3p=2, rrbs=False):
        self._non_directional_cutter = MinCutter(
            [trim_5p], count_trimmed=False, only_trimmed=False
        )
        self.rrbs = rrbs
        if rrbs:
            self._rrbs_cutter = RRBSTrimmer(trim_3p)

    def __call__(self, read):
        if len(read) == 0:
            return read
        cutter = None
        if self._regex.match(read.sequence):
            cutter = self._non_directional_cutter
        elif self.rrbs:
            cutter = self._rrbs_cutter
        return cutter(read) if cutter else read

    def summarize(self):
        bp_trimmed = self._non_directional_cutter.trimmed_bases
        if self.rrbs:
            bp_trimmed += self._rrbs_cutter.trimmed_bases
        return dict(bp_trimmed=bp_trimmed)


class TruSeqBisulfiteTrimmer(MinCutter):
    """EpiGnome reads are trimmed at least 6 bp on the 5' end."""

    display_str = "Bisulfite-trimmed (EpiGnome/TruSeq)"

    def __init__(self):
        super().__init__((6,), count_trimmed=True, only_trimmed=False)


class SwiftBisulfiteTrimmer(ReadPairModifier):
    """Swift Accel-NGS WGBS: cut 10 bp from read1 3' end and read2 5' end."""

    display_str = "Bisulfite-trimmed (Swift)"

    def __init__(self, trim_5p1=0, trim_3p1=10, trim_5p2=10, trim_3p2=0):
        self._read1_cutter = MinCutter(
            (trim_5p1, -1 * trim_3p1), count_trimmed=False, only_trimmed=False
        )
        self._read2_cutter = MinCutter(
            (trim_5p2, -1 * trim_3p2), count_trimmed=False, only_trimmed=False
        )

    def __call__(self, read1, read2):
        return (self._read1_cutter(read1), self._read2_cutter(read2))

    def summarize(self):
        return dict(
            bp_trimmed=(
                self._read1_cutter.trimmed_bases,
                self._read2_cutter.trimmed_bases,
            )
        )


class MergeOverlapping(ReadPairModifier, ErrorCorrectorMixin):
    """Merge overlapping read pairs into read1 (read2 becomes None)."""

    def __init__(self, min_overlap=0.9, error_rate=0.1, mismatch_action=None):
        ErrorCorrectorMixin.__init__(self, mismatch_action)
        self.min_overlap = int(min_overlap) if min_overlap > 1 else min_overlap
        self.error_rate = error_rate

    def __call__(self, read1, read2):
        len1 = len(read1.sequence)
        len2 = len(read2.sequence)
        min_overlap = self.min_overlap
        if min_overlap <= 1:
            min_overlap = max(2, round(self.min_overlap * min(len1, len2)))

        if len1 < min_overlap or len2 < min_overlap:
            return (read1, read2)

        insert_matched = read1.insert_overlap and read2.insert_overlap

        if insert_matched:
            aflags = START_WITHIN_SEQ1 | STOP_WITHIN_SEQ2
        else:
            aflags = SEMIGLOBAL
        read2_rc = reverse_complement(read2.sequence)
        aligner = Aligner(read2_rc, self.error_rate, aflags)
        alignment = aligner.locate(read1.sequence)

        if alignment:
            r2_start, r2_stop, r1_start, r1_stop, matches, errors = alignment
            if matches >= min_overlap:
                if self.mismatch_action and errors > 0 and not insert_matched:
                    self.correct_errors(read1, read2, alignment)

                if r2_start == 0 and r2_stop == len2:
                    # r2 fully contained in r1
                    pass
                elif r1_start == 0 and r1_stop == len1:
                    # r1 fully contained in r2
                    read1.sequence = read2_rc
                    read1.qualities = "".join(reversed(read2.qualities))
                elif r1_start > 0:
                    read1.sequence += read2_rc[r2_stop:]
                    if read1.qualities and read2.qualities:
                        read1.qualities += "".join(reversed(read2.qualities))[r2_stop:]
                elif r2_start > 0:
                    read1.sequence = read2_rc + read1.sequence[r1_stop:]
                    if read1.qualities and read2.qualities:
                        read1.qualities = (
                            "".join(reversed(read2.qualities))
                            + read1.qualities[r1_stop:]
                        )
                else:
                    raise AtroposError(
                        "Invalid alignment while trying to merge read "
                        "{}: {}".format(
                            read1.name, ",".join(str(i) for i in alignment)
                        )
                    )

                read1.merged = True
                read2 = None

        return (read1, read2)


class Modifiers:
    """Ordered collection of modifiers applied to each read/pair."""

    def __init__(self):
        self.modifiers = []
        self.modifier_indexes = {}

    def add_modifier(self, mod_class, read=1 | 2, **kwargs):
        raise NotImplementedError()

    def add_modifier_pair(self, mod_class, read1_args=None, read2_args=None):
        raise NotImplementedError()

    def _add_modifiers(self, mod_class, mods):
        idx = len(self.modifiers)
        self.modifiers.append(mods)
        if mod_class in self.modifier_indexes:
            self.modifier_indexes[mod_class].append(idx)
        else:
            self.modifier_indexes[mod_class] = [idx]
        return idx

    def has_modifier(self, mod_class):
        return mod_class in self.modifier_indexes

    def get_modifiers(self, mod_class=None, read=None):
        if mod_class is None:
            mods = copy.copy(self.modifiers)
        elif mod_class in self.modifier_indexes:
            mods = [self.modifiers[i] for i in self.modifier_indexes[mod_class]]
        else:
            mods = []

        if not (mods and read):
            return mods

        read_mods = []
        for mod in mods:
            if isinstance(mod, ReadPairModifier):
                read_mods.append(mod)
            elif mod[read - 1] is not None:
                read_mods.append(mod[read - 1])
        return read_mods

    def get_adapters(self):
        adapters = [[], []]
        if self.has_modifier(AdapterCutter):
            mod1, mod2 = self.get_modifiers(AdapterCutter)[0]
            if mod1:
                adapters[0] = mod1.adapters
            if mod2:
                adapters[1] = mod2.adapters
        elif self.has_modifier(InsertAdapterCutter):
            mod = self.get_modifiers(InsertAdapterCutter)[0]
            adapters[0] = [mod.adapter1]
            adapters[1] = [mod.adapter2]
        return adapters

    def modify(self, read1, read2=None):
        raise NotImplementedError()

    def summarize(self):
        raise NotImplementedError()


class SingleEndModifiers(Modifiers):
    def add_modifier(self, mod_class, read=1, **kwargs):
        if read != 1:
            raise ValueError("'read' must be 1 for single-end data")
        return self._add_modifiers(mod_class, [mod_class(**kwargs), None])

    def add_modifier_pair(self, mod_class, read1_args=None, read2_args=None):
        if read1_args is not None:
            return self.add_modifier(mod_class, **read1_args)

    def modify(self, read1, read2=None):
        for mods in self.modifiers:
            read1 = mods[0](read1)
        return (read1,)

    def summarize(self):
        summary = {}
        for mods in self.modifiers:
            mod = mods[0]
            summary[mod.name] = dict(
                (key, (value,)) for key, value in mod.summarize().items()
            )
            summary[mod.name]["desc"] = mod.description
        return summary


class PairedEndModifiers(Modifiers):
    def __init__(self, paired):
        super().__init__()
        self.paired = paired

    def add_modifier(self, mod_class, read=1 | 2, **kwargs):
        if issubclass(mod_class, ReadPairModifier):
            if self.paired != "both" and read == 1 | 2:
                raise ValueError(
                    "Must have paired-end reads to use modifer {}".format(mod_class)
                )
            mods = mod_class(**kwargs)
        else:
            mods = [None, None]
            if read & 1 > 0:
                mods[0] = mod_class(**kwargs)
            if read & 2 > 0 and self.paired == "both":
                mods[1] = mod_class(**kwargs)
            if not any(mods):
                return None
        return self._add_modifiers(mod_class, mods)

    def add_modifier_pair(self, mod_class, read1_args=None, read2_args=None):
        mods = [None, None]
        if read1_args is not None:
            mods[0] = mod_class(**read1_args)
        if read2_args is not None and self.paired == "both":
            mods[1] = mod_class(**read2_args)
        if any(mods):
            return self._add_modifiers(mod_class, mods)

    def modify(self, read1, read2=None):
        for mods in self.modifiers:
            if isinstance(mods, ReadPairModifier):
                read1, read2 = mods(read1, read2)
            else:
                if mods[0] is not None:
                    read1 = mods[0](read1)
                if mods[1] is not None:
                    read2 = mods[1](read2)
        return (read1, read2)

    def summarize(self):
        summary = {}
        for mods in self.modifiers:
            if isinstance(mods, ReadPairModifier):
                summary[mods.name] = mods.summarize()
                summary[mods.name]["desc"] = mods.description
            elif any(mods):
                name = desc = keys = None
                summ1 = summ2 = {}
                if mods[0]:
                    name = mods[0].name
                    desc = mods[0].description
                    summ1 = mods[0].summarize()
                    if summ1:
                        keys = summ1.keys()
                if mods[1]:
                    summ2 = mods[1].summarize()
                    if summ2:
                        if name:
                            assert name == mods[1].name
                            assert desc == mods[1].description
                            assert set(keys) == set(summ2.keys())
                        else:
                            name = mods[1].name
                            desc = mods[1].description
                            keys = summ2.keys()
                if keys:
                    summary[name] = dict(
                        (key, (summ1.get(key, None), summ2.get(key, None)))
                        for key in keys
                    )
                    summary[name]["desc"] = desc
        return summary

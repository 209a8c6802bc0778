"""Assembly of the trim stack from parsed options.

Translates the CLI option namespace into the four pipeline pieces —
modifier chain, filter chain, formatter table, writers — honoring the
user's ``--op-order`` for the reorderable stages. Option semantics follow
the reference build switch (``atropos/commands/trim/__init__.py:338-648``);
the structure here is table-driven rather than a monolithic method.
"""
import sys

from atropos_tpu.adapters import AdapterParser, BACK
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
from atropos_tpu.io import STDOUT
from atropos_tpu.util import RandomMatchProbability


class TrimStackBuilder:
    """Builds (modifiers, filters, formatters, writers) from options."""

    def __init__(self, runner):
        self.runner = runner
        self.options = runner.options
        self.match_probability = RandomMatchProbability()
        self.adapters1 = []
        self.adapters2 = []

    def build(self):
        self.parse_adapters()
        self.validate()
        modifiers = self.build_modifiers()
        filters, formatters, writers = self.build_output_stack()
        return modifiers, filters, formatters, writers

    # -- adapters -------------------------------------------------------------

    def parse_adapters(self):
        options = self.options
        specs1 = (options.adapters, options.anywhere, options.front)
        specs2 = (options.adapters2, options.anywhere2, options.front2)
        if not (any(specs1) or any(specs2)):
            return

        cache = self.runner.load_known_adapters()
        parser_args = dict(
            colorspace=options.colorspace,
            max_error_rate=options.error_rate,
            min_overlap=options.overlap,
            read_wildcards=options.match_read_wildcards,
            adapter_wildcards=options.match_adapter_wildcards,
            indels=options.indels,
            indel_cost=options.indel_cost,
            cache=cache,
            gc_content=options.gc_content,
            match_probability=self.match_probability,
            alphabet=options.alphabet,
        )
        if options.adapter_max_rmp:
            parser_args["max_rmp"] = options.adapter_max_rmp
        parser = AdapterParser(**parser_args)
        if any(specs1):
            self.adapters1 = parser.parse_multi(*specs1)
        if any(specs2):
            self.adapters2 = parser.parse_multi(*specs2)
        if options.cache_adapters:
            cache.save()

    def validate(self):
        options = self.options
        if not (self.adapters1 or self.adapters2) and self._nothing_else_to_do():
            raise ValueError("You need to provide at least one adapter sequence.")
        if options.aligner == "insert" and any(
            not a or len(a) != 1 or a[0].where != BACK
            for a in (self.adapters1, self.adapters2)
        ):
            raise ValueError(
                "Insert aligner requires a single 3' adapter for each read"
            )
        if options.debug:
            for adapter in self.adapters1 + self.adapters2:
                adapter.enable_debug()

    def _nothing_else_to_do(self):
        """True when no option implies any modification or filtering."""
        options = self.options
        return (
            not options.quality_cutoff
            and options.nextseq_trim is None
            and options.cut == []
            and options.cut2 == []
            and options.cut_min == []
            and options.cut_min2 == []
            and (options.minimum_length is None or options.minimum_length <= 0)
            and options.maximum_length == sys.maxsize
            and not options.trim_n
            and not self.runner.has_qualfile
            and options.max_n is None
            and (not options.paired or options.overwrite_low_quality is None)
        )

    # -- modifiers --------------------------------------------------------------

    def build_modifiers(self):
        options = self.options
        modifiers = (
            PairedEndModifiers(options.paired)
            if options.paired
            else SingleEndModifiers()
        )
        for opcode in options.op_order:
            self._OP_STAGES[opcode](self, modifiers)
        for stage in self._FIXED_STAGES:
            stage(self, modifiers)
        return modifiers

    def _op_overwrite(self, modifiers):
        if not self.options.overwrite_low_quality:
            return
        lowq, highq, window = self.options.overwrite_low_quality
        modifiers.add_modifier(
            OverwriteRead,
            worse_read_min_quality=lowq,
            better_read_min_quality=highq,
            window_size=window,
            base=self.options.quality_base,
        )

    def _op_adapters(self, modifiers):
        options = self.options
        if not (self.adapters1 or self.adapters2):
            return
        if options.aligner == "insert":
            modifiers.add_modifier(
                InsertAdapterCutter,
                adapter1=self.adapters1[0],
                adapter2=self.adapters2[0],
                action=options.action,
                mismatch_action=options.correct_mismatches,
                max_insert_mismatch_frac=options.insert_match_error_rate,
                max_adapter_mismatch_frac=options.insert_match_adapter_error_rate,
                match_probability=self.match_probability,
                insert_max_rmp=options.insert_max_rmp,
                read_wildcards=options.match_read_wildcards,
                adapter_wildcards=options.match_adapter_wildcards,
            )
            return

        def cutter_args(adapters):
            if not adapters:
                return None
            return dict(
                adapters=adapters, times=options.times, action=options.action
            )

        modifiers.add_modifier_pair(
            AdapterCutter,
            cutter_args(self.adapters1),
            cutter_args(self.adapters2),
        )

    def _op_cut(self, modifiers):
        if self.options.cut or self.options.cut2:
            modifiers.add_modifier_pair(
                UnconditionalCutter,
                dict(lengths=self.options.cut),
                dict(lengths=self.options.cut2),
            )

    def _op_nextseq(self, modifiers):
        if self.options.nextseq_trim is not None:
            modifiers.add_modifier(
                NextseqQualityTrimmer,
                cutoff=self.options.nextseq_trim,
                base=self.options.quality_base,
            )

    def _op_quality(self, modifiers):
        if self.options.quality_cutoff:
            modifiers.add_modifier(
                QualityTrimmer,
                cutoff_front=self.options.quality_cutoff[0],
                cutoff_back=self.options.quality_cutoff[1],
                base=self.options.quality_base,
            )

    _OP_STAGES = {
        "W": _op_overwrite,
        "A": _op_adapters,
        "C": _op_cut,
        "G": _op_nextseq,
        "Q": _op_quality,
    }

    # stages with a fixed position after the reorderable block

    def _stage_bisulfite(self, modifiers):
        preset = self.options.bisulfite
        if not preset:
            return
        if isinstance(preset, str):
            if "non-directional" in preset:
                modifiers.add_modifier(
                    NonDirectionalBisulfiteTrimmer,
                    rrbs=preset == "non-directional-rrbs",
                )
            elif preset == "rrbs":
                modifiers.add_modifier(RRBSTrimmer)
            elif preset == "swift":
                modifiers.add_modifier(SwiftBisulfiteTrimmer)
            # 'epignome'/'truseq': trimming leads to worse results — no-op
            return
        if preset[0]:
            modifiers.add_modifier(MinCutter, read=1, **preset[0])
        if len(preset) > 1 and preset[1]:
            modifiers.add_modifier(MinCutter, read=2, **preset[1])

    def _stage_trim_n(self, modifiers):
        if self.options.trim_n:
            modifiers.add_modifier(NEndTrimmer)

    def _stage_cut_min(self, modifiers):
        if self.options.cut_min or self.options.cut_min2:
            modifiers.add_modifier_pair(
                MinCutter,
                dict(lengths=self.options.cut_min),
                dict(lengths=self.options.cut_min2),
            )

    def _stage_names(self, modifiers):
        options = self.options
        if options.length_tag:
            modifiers.add_modifier(
                LengthTagModifier, length_tag=options.length_tag
            )
        if options.strip_suffix:
            modifiers.add_modifier(SuffixRemover, suffixes=options.strip_suffix)
        if options.prefix or options.suffix:
            modifiers.add_modifier(
                PrefixSuffixAdder, prefix=options.prefix, suffix=options.suffix
            )

    def _stage_colorspace(self, modifiers):
        options = self.options
        if options.double_encode:
            modifiers.add_modifier(DoubleEncoder)
        if options.zero_cap and self.runner.delivers_qualities:
            modifiers.add_modifier(ZeroCapper, quality_base=options.quality_base)
        if options.trim_primer:
            modifiers.add_modifier(PrimerTrimmer)

    def _stage_merge(self, modifiers):
        options = self.options
        if options.merge_overlapping:
            modifiers.add_modifier(
                MergeOverlapping,
                min_overlap=options.merge_min_overlap,
                error_rate=options.merge_error_rate,
                mismatch_action=options.correct_mismatches,
            )

    _FIXED_STAGES = (
        _stage_bisulfite,
        _stage_trim_n,
        _stage_cut_min,
        _stage_names,
        _stage_colorspace,
        _stage_merge,
    )

    # -- filters / formatters / writers ---------------------------------------------

    def build_output_stack(self):
        options = self.options
        min_affected = 2 if options.pair_filter == "both" else 1
        filters = Filters(FilterFactory(options.paired, min_affected))

        if options.interleaved_output:
            output1, output2 = options.interleaved_output, None
            interleaved = True
        else:
            output1, output2 = options.output, options.paired_output
            interleaved = False

        formatters = Formatters(
            output1,
            dict(
                qualities=self.runner.delivers_qualities,
                colorspace=options.colorspace,
                interleaved=interleaved,
            ),
        )
        force_create = []

        # filters register in a fixed priority order; a formatter is
        # attached wherever the user asked to keep that category
        if options.merge_overlapping:
            filters.add_filter(MergedReadFilter)
            if options.merged_output:
                formatters.add_seq_formatter(
                    MergedReadFilter, options.merged_output
                )
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
                untrimmed = (
                    options.untrimmed_output or output1.format(name="unknown")
                )
                formatters.add_seq_formatter(UntrimmedFilter, untrimmed)
                formatters.add_seq_formatter(NoFilter, untrimmed)
            elif options.untrimmed_output:
                formatters.add_seq_formatter(
                    UntrimmedFilter,
                    options.untrimmed_output,
                    options.untrimmed_paired_output,
                )

        for option_value, formatter_class in (
            (options.rest_file, RestFormatter),
            (options.info_file, InfoFormatter),
            (options.wildcard_file, WildcardFormatter),
        ):
            if option_value:
                formatters.add_info_formatter(formatter_class(option_value))

        return filters, formatters, Writers(force_create)

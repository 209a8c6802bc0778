"""Cutadapt/Atropos-style legacy text report.

This is a readable summary for humans; the structured json/yaml reports are
the machine interface (and what MultiQC consumes). The full table layout of
the reference's ``legacy_report.py`` is being built out incrementally; the
current version reports the run header, totals, per-modifier/filter
sections, and per-adapter length histograms.
"""
from atropos_tpu.io import open_output


class Printer:
    """Prints to a file with optional indenting."""

    def __init__(self, outfile, indent=None, **kwargs):
        self.outfile = outfile
        self.indent = indent
        self.print_args = kwargs

    def __call__(self, *args, indent=None, **kwargs):
        if isinstance(indent, int):
            indent = self.indent * indent
        else:
            indent = indent or self.indent
        if indent:
            self._print(indent, end="")
        self._print(*args, **kwargs)

    def _print(self, *args, **kwargs):
        if self.print_args:
            print_args = self.print_args.copy()
            print_args.update(kwargs)
        else:
            print_args = kwargs
        print(*args, file=self.outfile, **print_args)

    def newline(self):
        print(file=self.outfile)


class TitlePrinter(Printer):
    """Printer that over/underlines titles per heading level."""

    def __init__(
        self,
        outfile,
        levels=(("=", "="), ("-", "-"), ("-", None), ("~", None)),
        **kwargs,
    ):
        super().__init__(outfile, **kwargs)
        self.levels = levels

    def __call__(self, *title, level=None, newline=True, **kwargs):
        title = " ".join(title)
        if level is not None:
            if level >= len(self.levels):
                raise ValueError("Invalid level: {}".format(level))
            underline, overline = self.levels[level]
            if overline is True:
                overline = underline
            width = len(title)
            if overline:
                self._print(overline * width, **kwargs)
            self._print(title, **kwargs)
            if underline:
                self._print(underline * width, **kwargs)
        else:
            self._print(title, **kwargs)
        if newline:
            self.newline()


def _print_overview(summary, out):
    print("=" * 10, file=out)
    print(
        "Atropos-TPU {} trim report".format(summary.get("version", "")), file=out
    )
    print("=" * 10, file=out)
    print("Sample ID: {}".format(summary.get("sample_id")), file=out)
    print("Input format: {}".format(summary["derived"]["input_format"]), file=out)
    print(
        "Input files: {}".format(
            ", ".join(str(f) for f in summary["input"]["input_names"] if f)
        ),
        file=out,
    )
    timing = summary.get("timing", {})
    if timing:
        print(
            "Wallclock time: {:.2f} s".format(timing.get("wallclock", 0)), file=out
        )
        print("CPU time: {:.2f} s".format(timing.get("cpu", 0)), file=out)
    print("", file=out)


def _print_totals(summary, out):
    total_records = summary.get("total_record_count", 0)
    print("Total records processed: {:,}".format(total_records), file=out)
    bp_counts = summary.get("total_bp_counts", ())
    for read, bps in enumerate(bp_counts, 1):
        print("Total bp processed (read {}): {:,}".format(read, bps), file=out)
    trim = summary.get("trim")
    if trim:
        fmtr = trim.get("formatters", {})
        if "records_written" in fmtr:
            print(
                "Records written: {:,}".format(fmtr["records_written"]), file=out
            )
        if "bp_written" in fmtr:
            for read, bps in enumerate(fmtr["bp_written"], 1):
                print(
                    "Bp written (read {}): {:,}".format(read, bps), file=out
                )
    print("", file=out)


def _print_adapter(name, adapter, out):
    print("=== Adapter {} ===".format(name), file=out)
    seq = adapter.get("sequence")
    where = adapter.get("where", {})
    print(
        "Sequence: {}; Type: {}; Trimmed: {} times.".format(
            seq, where.get("desc", ""), adapter.get("total", 0)
        ),
        file=out,
    )
    for end in ("front", "back"):
        lengths = adapter.get("lengths_{}".format(end))
        if lengths:
            print("", file=out)
            print("Lengths ({}' end)".format("5" if end == "front" else "3"), file=out)
            print("length\tcount", file=out)
            for length, count in sorted(lengths.items()):
                print("{}\t{}".format(length, count), file=out)
    print("", file=out)


def _print_trim_sections(summary, out):
    trim = summary.get("trim")
    if not trim:
        return
    modifiers = trim.get("modifiers", {})
    for mod_name, mod_summary in modifiers.items():
        if not isinstance(mod_summary, dict):
            continue
        adapters = mod_summary.get("adapters")
        if adapters is None:
            continue
        if isinstance(adapters, (list, tuple)):
            for read, read_adapters in enumerate(adapters, 1):
                if not read_adapters:
                    continue
                for name, adapter in read_adapters.items():
                    if adapter:
                        _print_adapter(
                            "{} (read {})".format(name, read), adapter, out
                        )
        else:
            if isinstance(next(iter(adapters.values()), None), dict) and all(
                isinstance(v, dict) for v in adapters.values()
            ):
                for name, adapter in adapters.items():
                    # single-end summaries wrap values in 1-tuples
                    if isinstance(adapter, tuple):
                        adapter = adapter[0]
                    _print_adapter(name, adapter, out)
    filters = trim.get("filters", {})
    if filters:
        print("=== Filters ===", file=out)
        for name, stats in filters.items():
            print(
                "{}: {:,} records filtered".format(
                    name, _first(stats.get("records_filtered", 0))
                ),
                file=out,
            )
        print("", file=out)


def _first(value):
    if isinstance(value, (list, tuple)):
        return value[0]
    return value


def generate_trim_report(summary, outfile):
    """Write the legacy-style text report for a trim run."""
    with open_output(outfile, "w", context_wrapper=True) as out:
        _print_overview(summary, out)
        _print_totals(summary, out)
        _print_trim_sections(summary, out)


def generate_report(summary, outfile):
    """Generic entry point used by non-trim commands."""
    with open_output(outfile, "w", context_wrapper=True) as out:
        _print_overview(summary, out)
        _print_totals(summary, out)


def _print_stats_tables(label, stats, out):
    tprint = TitlePrinter(out)
    tprint("Read statistics: {}".format(label), level=1)
    for read_key in ("read1", "read2"):
        if read_key not in stats:
            continue
        read_stats = stats[read_key]
        print("{}: {:,} reads".format(read_key, read_stats["counts"]), file=out)
        lengths = read_stats.get("lengths", {})
        if lengths and "summary" in lengths:
            print(
                "  length: mean={:.2f} median={} stdev={:.2f}".format(
                    lengths["summary"]["mean"],
                    lengths["summary"]["median"],
                    lengths["summary"]["stdev"],
                ),
                file=out,
            )
        gc = read_stats.get("gc", {})
        if gc and "summary" in gc:
            print("  GC%: mean={:.2f}".format(gc["summary"]["mean"]), file=out)
        quals = read_stats.get("qualities")
        if quals:
            print(
                "  mean read quality histogram: {}".format(dict(quals)),
                file=out,
            )
    print(file=out)


def generate_stats_report(out, summary):
    """Text report for the qc command (and --stats trim runs)."""
    _print_overview(summary, out)
    _print_totals(summary, out)
    for section in ("pre", "post"):
        if section not in summary:
            continue
        data = summary[section]
        for source, stats in data.items():
            if isinstance(stats, dict) and (
                "read1" in stats or "read2" in stats
            ):
                _print_stats_tables(
                    "{} (source {})".format(section, source), stats, out
                )
            elif isinstance(stats, dict):
                # post-trim stats are keyed by destination filter
                for sub_source, sub_stats in stats.items():
                    _print_stats_tables(
                        "{} ({}, source {})".format(section, source, sub_source),
                        sub_stats,
                        out,
                    )

"""Formatting and writing of processed reads.

Routes (destination-filter, read) pairs to output file strings, including
demultiplexing via a ``{name}`` output template and the delimited info /
rest / wildcard side files. Byte-compatible with the reference
(``atropos/commands/trim/writers.py``).
"""
import sys

from atropos_tpu.io import STDOUT, open_output, xopen
from atropos_tpu.io.compression import splitext_compressed
from atropos_tpu.io.seqio import create_seq_formatter
from atropos_tpu.commands.trim.filters import NoFilter


class Writers:
    """Holds open file handles for all outputs; supports a worker-index
    suffix for parallel-write mode (each shard writes its own files)."""

    def __init__(self, force_create=None):
        self.writers = {}
        self.force_create = force_create if force_create is not None else []
        self.suffix = None

    def get_writer(self, file_desc, compressed=False):
        if compressed:
            path, mode = file_desc
        else:
            path = file_desc

        if path not in self.writers:
            if self.suffix:
                real_path = add_suffix_to_path(path, self.suffix)
            else:
                real_path = path
            if compressed:
                self.writers[path] = open_output(real_path, mode)
            else:
                self.writers[path] = xopen(real_path, "w")

        return self.writers[path]

    def write_result(self, result, compressed=False):
        for file_desc, data in result.items():
            self.write(file_desc, data, compressed)

    def write(self, file_desc, data, compressed=False):
        self.get_writer(file_desc, compressed).write(data)

    def close(self):
        for path in self.force_create:
            if path not in self.writers and path != STDOUT:
                with xopen(path, "w"):
                    pass
        for writer in self.writers.values():
            if writer not in (sys.stdout, sys.stderr):
                writer.close()


class Formatters:
    """Maps destination filter types to sequence formatters, plus info-file
    formatters applied to every read."""

    def __init__(self, output, seq_formatter_args):
        self.output = output
        self.multiplexed = output is not None and "{name}" in output
        self.seq_formatter_args = seq_formatter_args
        self.seq_formatters = {}
        self.mux_formatters = {}
        self.info_formatters = []
        self.discarded = 0

    def add_seq_formatter(self, filter_type, file1, file2=None):
        self.seq_formatters[filter_type] = create_seq_formatter(
            file1, file2, **self.seq_formatter_args
        )

    def add_info_formatter(self, formatter):
        self.info_formatters.append(formatter)

    def get_mux_formatter(self, name):
        assert self.multiplexed
        if name not in self.mux_formatters:
            path = self.output.format(name=name)
            self.mux_formatters[name] = create_seq_formatter(
                path, **self.seq_formatter_args
            )
        return self.mux_formatters[name]

    def get_seq_formatters(self):
        return set(
            f for f in self.seq_formatters.values() if f.written > 0
        ) | set(f for f in self.mux_formatters.values() if f.written > 0)

    def format(self, result, dest, read1, read2=None):
        if self.multiplexed and (dest == NoFilter) and read1.match:
            name = read1.match.adapter.name
            formatter = self.get_mux_formatter(name)
            formatter.format(result, read1, read2)
        elif dest in self.seq_formatters:
            self.seq_formatters[dest].format(result, read1, read2)
        else:
            self.discarded += 1

        for fmtr in self.info_formatters:
            fmtr.format(result, read1)
            if read2:
                fmtr.format(result, read2)

    def summarize(self):
        seq_formatters = self.get_seq_formatters()
        return dict(
            records_written=sum(f.written for f in seq_formatters),
            bp_written=[
                sum(f.read1_bp for f in seq_formatters),
                sum(f.read2_bp for f in seq_formatters),
            ],
        )


class DelimFormatter:
    def __init__(self, path, delim=" "):
        self.path = path
        self.delim = delim

    def format(self, result, read):
        raise NotImplementedError()

    def _format(self, result, fields):
        result[self.path].append(
            "".join((self.delim.join(str(f) for f in fields), "\n"))
        )


class RestFormatter(DelimFormatter):
    def format(self, result, read):
        if read.match:
            rest = read.match.rest()
            if len(rest) > 0:
                self._format(result, (rest, read.name))


class InfoFormatter(DelimFormatter):
    def __init__(self, path):
        super().__init__(path, delim="\t")

    def format(self, result, read):
        if read.match:
            for match_info in read.match_info:
                self._format(result, match_info[0:11])
        else:
            seq = read.sequence
            qualities = read.qualities if read.qualities is not None else ""
            self._format(result, (read.name, -1, seq, qualities))


class WildcardFormatter(DelimFormatter):
    def format(self, result, read):
        if read.match:
            self._format(result, (read.match.wildcards(), read.name))


def add_suffix_to_path(path, suffix):
    """Insert ``suffix`` between the file stem and its extension(s)."""
    name, ext1, ext2 = splitext_compressed(path)
    return "{}{}{}{}".format(name, suffix, ext1, ext2 or "")

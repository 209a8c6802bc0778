"""FastQC-style read statistics accumulators.

Host-side dict-based accumulators matching the reference's summary schema
(``atropos/commands/stats.py``). The device engine produces the same
numbers from fixed-shape count tensors ([Lmax, 5] base composition,
[Lmax, Q] quality composition) merged across shards with ``psum``; these
classes are the schema boundary used for reports and for rare host paths.
"""
import re

from atropos_tpu.util import (
    CountingDict,
    Histogram,
    Mergeable,
    NestedDict,
    Summarizable,
    ordered_dict,
    qual2int,
)

DEFAULT_TILE_KEY_REGEXP = r"^(?:[^\:]+\:){4}([^\:]+)"
"""Regexp for the default Illumina read name format."""


class PositionDicts(Mergeable, Summarizable):
    """A growable sequence of dicts, one per read position."""

    def __init__(self, is_qualities=False, quality_base=33):
        self.dicts = []
        self.is_qualities = is_qualities
        self.quality_base = quality_base

    def __getitem__(self, idx):
        if idx >= len(self.dicts):
            self.extend(idx + 1)
        return self.dicts[idx]

    def __iter__(self):
        return iter(self.dicts)

    def extend(self, size):
        diff = size - len(self.dicts)
        if diff > 0:
            for _ in range(diff):
                self.dicts.append(self.dict_class())

    def merge(self, other):
        if not isinstance(other, PositionDicts):
            raise ValueError("Cannot merge object of type {}".format(type(other)))
        other_len = len(other.dicts)
        min_len = min(len(self.dicts), other_len)
        for i in range(min_len):
            self.dicts[i].merge(other.dicts[i])
        if other_len > min_len:
            self.dicts.extend(other.dicts[min_len:other_len])

    def summarize(self):
        raise NotImplementedError()


class BaseCountingDicts(PositionDicts):
    """Per-position CountingDicts (base or quality composition)."""

    dict_class = CountingDict

    def summarize(self):
        keys = set()
        for dict_item in self.dicts:
            keys.update(dict_item.keys())
        if self.is_qualities:
            keys = tuple(sorted(keys))
            columns = tuple(qual2int(k, self.quality_base) for k in keys)
        else:
            acgt = ("A", "C", "G", "T")
            n_val = ("N",)
            columns = keys = acgt + tuple(keys - set(acgt + n_val)) + n_val
        return dict(
            columns=columns,
            rows=ordered_dict(
                (idx, tuple(dict_item.get(key, 0) for key in keys))
                for idx, dict_item in enumerate(self.dicts, 1)
            ),
        )


class BaseNestedDicts(PositionDicts):
    """Per-position NestedDicts (e.g. per-tile quality composition)."""

    dict_class = NestedDict

    def summarize(self):
        keys1 = set()
        keys2 = set()
        for dict1 in self.dicts:
            keys1.update(dict1.keys())
            for dict2 in dict1.values():
                keys2.update(dict2.keys())
        keys1 = tuple(sorted(keys1))
        keys2 = tuple(sorted(keys2))
        if self.is_qualities:
            columns = tuple(qual2int(k, self.quality_base) for k in keys2)
        else:
            columns = keys2
        return dict(
            columns=columns,
            columns2=keys1,
            rows=ordered_dict(
                (
                    idx,
                    ordered_dict(
                        (key1, tuple(dict_item[key1].get(key2, 0) for key2 in keys2))
                        for key1 in keys1
                    ),
                )
                for idx, dict_item in enumerate(self.dicts, 1)
            ),
        )


class ReadStatistics:
    """Accumulates per-read and per-position statistics."""

    def __init__(self, qualities=None, quality_base=33, tiles=None):
        self.max_read_len = 0
        self.count = 0
        self.sequence_lengths = Histogram()
        self.sequence_gc = Histogram()
        self.bases = BaseCountingDicts()

        self.qualities = qualities
        self.quality_base = quality_base
        self.tile_key_regexp = None
        self.sequence_qualities = None
        self.base_qualities = None
        self.tile_base_qualities = None

        if qualities:
            tile_key_regexp = DEFAULT_TILE_KEY_REGEXP if tiles is True else tiles
            if isinstance(tile_key_regexp, str):
                tile_key_regexp = re.compile(tile_key_regexp)
            self.tile_key_regexp = tile_key_regexp
            self._init_qualities()

        self._cache = {}

    def _init_qualities(self):
        self.sequence_qualities = Histogram()
        self.base_qualities = BaseCountingDicts(
            is_qualities=True, quality_base=self.quality_base
        )
        if self.tile_key_regexp:
            self.tile_base_qualities = BaseNestedDicts(
                is_qualities=True, quality_base=self.quality_base
            )
            self.tile_sequence_qualities = NestedDict()

    def _gc_pct(self):
        return sum(base["C"] + base["G"] for base in self.bases) / self.total_bases

    def _total_bases(self):
        return sum(
            count for base in self.bases for _, count in base.items()
        )

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        cache = self.__dict__.setdefault("_cache", {})
        if name not in cache:
            func_name = "_" + name
            if not hasattr(self, func_name):
                raise ValueError("No function named {}".format(func_name))
            cache[name] = getattr(self, func_name)()
        return cache[name]

    @property
    def track_tiles(self):
        return self.qualities and self.tile_key_regexp is not None

    def collect_record(self, record):
        if self.qualities is None and record.qualities:
            self.qualities = True
            self._init_qualities()

        seq = record.sequence
        seqlen = len(seq)

        self.count += 1
        self.sequence_lengths[seqlen] += 1

        if seqlen > 0:
            gc_pct = round((seq.count("C") + seq.count("G")) * 100 / seqlen)
            self.sequence_gc[gc_pct] += 1

            if seqlen > self.max_read_len:
                self._extend_bases(seqlen)
                self.max_read_len = seqlen

            quals = tile = None

            if self.qualities:
                quals = record.qualities
                # round (not floor as in FastQC) of the mean read quality
                meanqual = round(
                    sum(ord(q) - self.quality_base for q in quals) / seqlen
                )
                self.sequence_qualities[meanqual] += 1
                if self.track_tiles:
                    tile_match = self.tile_key_regexp.match(record.name)
                    if tile_match:
                        tile = tile_match.group(1)
                        self.tile_sequence_qualities[tile][meanqual] += 1
                    else:
                        raise ValueError(
                            "{} did not match {}".format(
                                self.tile_key_regexp, record.name
                            )
                        )

            if quals:
                for i, (base, qual) in enumerate(zip(seq, quals)):
                    self.add_base(i, base, qual, tile)
            else:
                for i, base in enumerate(seq):
                    self.add_base(i, base)

    def collect(self, read1, read2=None):
        raise NotImplementedError()

    def add_base(self, i, base, qual=None, tile=None):
        self.bases[i][base] += 1
        if qual:
            self.base_qualities[i][qual] += 1
            if tile:
                self.tile_base_qualities[i][tile][qual] += 1

    def _extend_bases(self, new_size):
        self.bases.extend(new_size)
        if self.qualities:
            self.base_qualities.extend(new_size)
            if self.track_tiles:
                self.tile_base_qualities.extend(new_size)

    def summarize(self):
        summary = dict(
            counts=self.count,
            lengths=self.sequence_lengths.summarize(),
            gc=self.sequence_gc.summarize(),
            bases=self.bases,
        )
        if self.sequence_qualities:
            summary["qualities"] = self.sequence_qualities
        if self.base_qualities:
            summary["base_qualities"] = self.base_qualities
        if self.track_tiles:
            summary["tile_base_qualities"] = self.tile_base_qualities
            summary["tile_sequence_qualities"] = self.tile_sequence_qualities
        return summary


class SingleEndReadStatistics(ReadStatistics):
    def collect(self, read1, read2=None):
        self.collect_record(read1)

    def summarize(self):
        return dict(read1=super().summarize())


class PairedEndReadStatistics:
    def __init__(self, **kwargs):
        self.read1 = ReadStatistics(**kwargs)
        self.read2 = ReadStatistics(**kwargs)

    def collect(self, read1, read2):
        self.read1.collect_record(read1)
        self.read2.collect_record(read2)

    def summarize(self):
        return dict(read1=self.read1.summarize(), read2=self.read2.summarize())

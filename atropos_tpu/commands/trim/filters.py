"""Read filters and their single/paired wrappers.

A filter returns True when a read should be discarded. ``Filters.filter``
returns the type of the first filter to fire, which is then used as the
routing key for output formatters. Behavior matches the reference
(``atropos/commands/trim/filters.py``).
"""
from collections import OrderedDict

DISCARD = True
KEEP = False


class FilterWrapper:
    def __init__(self, f):
        self.filtered = 0
        self.filter = f

    def __call__(self, read1, read2=None):
        if self._filter(read1, read2):
            self.filtered += 1
            return DISCARD
        return KEEP

    def _filter(self, read1, read2=None):
        raise NotImplementedError()

    @property
    def name(self):
        if hasattr(self.filter, "name"):
            return self.filter.name
        return self.filter.__class__.__name__

    def summarize(self):
        return dict(records_filtered=self.filtered)


class SingleWrapper(FilterWrapper):
    """For single-end data and 'legacy' paired mode: only read1 is
    inspected."""

    def _filter(self, read1, read2=None):
        return self.filter(read1)


class PairedWrapper(FilterWrapper):
    """'New-style' paired filtering: discard when at least ``min_affected``
    (1 or 2) of the reads match."""

    def __init__(self, f, min_affected=1):
        super().__init__(f)
        if min_affected not in (1, 2):
            raise ValueError("min_affected must be 1 or 2")
        self.min_affected = min_affected

    def _filter(self, read1, read2):
        failures = 0
        if self.filter(read1):
            failures += 1
        if (self.min_affected - failures == 1) and (
            read2 is None or self.filter(read2)
        ):
            failures += 1
        return failures >= self.min_affected


class FilterFactory:
    def __init__(self, paired, min_affected):
        self.paired = paired
        self.min_affected = min_affected

    def __call__(self, filter_type, *args, **kwargs):
        fltr = filter_type(*args, **kwargs)
        if self.paired == "both":
            return PairedWrapper(fltr, self.min_affected)
        return SingleWrapper(fltr)


class MergedReadFilter:
    def __call__(self, read):
        return read.merged


class TooShortReadFilter:
    name = "too_short"

    def __init__(self, minimum_length):
        self.minimum_length = minimum_length

    def __call__(self, read):
        return len(read) < self.minimum_length


class TooLongReadFilter:
    name = "too_long"

    def __init__(self, maximum_length):
        self.maximum_length = maximum_length

    def __call__(self, read):
        return len(read) > self.maximum_length


class NContentFilter:
    """Discard reads with too many Ns (count if >= 1, else proportion)."""

    name = "too_many_n"

    def __init__(self, count):
        assert count >= 0
        self.is_proportion = count < 1.0
        self.cutoff = count

    def __call__(self, read):
        n_count = read.sequence.lower().count("n")
        if self.is_proportion:
            if len(read) == 0:
                return False
            return n_count / len(read) > self.cutoff
        return n_count > self.cutoff


class UntrimmedFilter:
    def __call__(self, read):
        return read.match is None


class TrimmedFilter:
    def __call__(self, read):
        return read.match is not None


class NoFilter:
    name = "NoFilter"

    def __call__(self, read):
        return False


class Filters:
    """Ordered filters; first to fire is the destination."""

    def __init__(self, filter_factory):
        self.filters = OrderedDict()
        self.filter_factory = filter_factory

    def add_filter(self, filter_type, *args, **kwargs):
        self.filters[filter_type] = self.filter_factory(filter_type, *args, **kwargs)

    def filter(self, read1, read2=None):
        dest = NoFilter
        for filter_type, fltr in self.filters.items():
            if fltr(read1, read2):
                dest = filter_type
                break
        return dest

    def __contains__(self, filter_type):
        return filter_type in self.filters

    def __getitem__(self, filter_type):
        return self.filters[filter_type]

    def summarize(self):
        return dict((f.name, f.summarize()) for f in self.filters.values())

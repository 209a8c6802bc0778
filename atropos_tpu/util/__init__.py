"""Host-side utility primitives.

Semantics match the reference implementation (``atropos/util/__init__.py``)
where bit-exact behavior is observable in outputs: reverse complement, the
random-match probability (binomial tail with factorial cache,
``util/__init__.py:104-174``), the mergeable-summary algebra
(``util/__init__.py:176-464``), and weighted summary statistics
(``util/__init__.py:567-702``).
"""
from collections import OrderedDict
from collections.abc import Iterable, Sequence
from datetime import datetime
import errno
import functools
import logging
import math
import time
from numbers import Number

from atropos_tpu import AtroposError


class NotInAlphabetError(Exception):
    def __init__(self, character):
        super().__init__()
        self.character = character


class Alphabet:
    """Set of valid characters with a default used to resolve invalid ones."""

    def __init__(self, valid_characters, default_character):
        if not isinstance(valid_characters, set):
            valid_characters = set(valid_characters)
        if default_character is not None:
            valid_characters.add(default_character)
        self.valid_characters = valid_characters
        self.default_character = default_character

    def __contains__(self, character):
        return character in self.valid_characters

    def validate(self, character):
        if character not in self:
            raise NotInAlphabetError(character)

    def validate_string(self, string):
        for character in string:
            self.validate(character)

    def resolve(self, character):
        if character in self.valid_characters:
            return character
        return self.default_character

    def resolve_string(self, string):
        return "".join(self.resolve(c) for c in string)


ALPHABETS = dict(
    dna=Alphabet("ACGT", "N"),
    iso=None,
    colorspace=Alphabet("0123", None),
)


def _build_iso_nucleotide_table():
    nuc = {
        "A": "T",
        "C": "G",
        "R": "Y",
        "S": "S",
        "W": "W",
        "K": "M",
        "B": "V",
        "D": "H",
        "N": "N",
    }
    for base, comp in tuple(nuc.items()):
        nuc[comp] = base
        nuc[base.lower()] = comp.lower()
        nuc[comp.lower()] = base.lower()
    return nuc


build_iso_nucleotide_table = _build_iso_nucleotide_table

BASE_COMPLEMENTS = build_iso_nucleotide_table()

IUPAC_BASES = frozenset(("X",) + tuple(BASE_COMPLEMENTS.keys()))

GC_BASES = frozenset("CGRYSKMBDHVN")

MAGNITUDE = dict(G=1e9, M=1e6, K=1e3)

LOG2 = math.log(2)

_COMPLEMENT_TRANS = str.maketrans(
    "".join(BASE_COMPLEMENTS.keys()), "".join(BASE_COMPLEMENTS.values())
)


def complement(seq):
    """Complement of a nucleotide sequence (IUPAC-aware)."""
    return seq.translate(_COMPLEMENT_TRANS)


def reverse_complement(seq):
    """Reverse complement of a nucleotide sequence (IUPAC-aware)."""
    return seq.translate(_COMPLEMENT_TRANS)[::-1]


def sequence_complexity(seq):
    """Shannon-entropy-style complexity in [0, 2] over ACGT."""
    seq = seq.upper()
    seqlen = float(len(seq))
    term = 0
    for base in ("A", "C", "G", "T"):
        count = seq.count(base)
        if count > 0:
            frac = count / seqlen
            term += frac * math.log(frac) / LOG2
    return -term


def qual2int(qual, base=33):
    return ord(qual) - base


def quals2ints(quals, base=33):
    return (ord(q) - base for q in quals)


def qual2prob(qchar):
    return 10 ** (-qual2int(qchar) / 10)


class RandomMatchProbability:
    """Binomial-tail probability that >= ``matches`` of ``size`` random bases
    match, with a growing factorial cache.

    Numeric behavior matches the reference (``util/__init__.py:104-174``)
    including the exact summation order, so RMP-gated decisions (insert
    matching, ``--adapter-max-rmp``) are reproducible bit-for-bit.
    """

    def __init__(self, init_size=150):
        self.cache = {}
        self.factorials = [1] * init_size
        self.max_n = 1
        self.cur_array_size = init_size

    def __call__(self, matches, size, match_prob=0.25, mismatch_prob=0.75):
        key = (matches, size, match_prob)
        prob = self.cache.get(key, None)
        if prob:
            return prob

        if matches == size:
            prob = match_prob ** matches
        else:
            nfac = self.factorial(size)
            prob = 0.0
            for i in range(matches, size + 1):
                j = size - i
                try:
                    div = nfac / self.factorial(i) / self.factorial(j)
                except OverflowError:
                    div = nfac // self.factorial(i) // self.factorial(j)
                prob += (mismatch_prob ** j) * (match_prob ** i) * div

        self.cache[key] = prob
        return prob

    def factorial(self, num):
        if num > self.max_n:
            self._fill_upto(num)
        return self.factorials[num]

    def _fill_upto(self, num):
        if num >= self.cur_array_size:
            self.factorials += [1] * (num - self.cur_array_size + 1)
            self.cur_array_size = len(self.factorials)
        idx = self.max_n
        while idx < num:
            self.factorials[idx + 1] = (idx + 1) * self.factorials[idx]
            idx += 1
        self.max_n = idx


# ---------------------------------------------------------------------------
# Mergeable summary algebra.
#
# This is the control-plane data model: every pipeline component produces a
# summary tree whose nodes know how to merge across workers/shards. On device
# the same algebra is realized as psum over fixed-shape stat tensors
# (atropos_tpu.parallel); these host classes are the boundary representation
# used for reports.
# ---------------------------------------------------------------------------


class Mergeable:
    def merge(self, other):
        raise NotImplementedError()


class Summarizable:
    def summarize(self):
        raise NotImplementedError()


class Const(Mergeable):
    """Constant value; merging asserts equality."""

    def __init__(self, value):
        self.value = value

    def merge(self, other):
        if self != other:
            raise ValueError("{} != {}".format(self, other))
        return self

    def __eq__(self, other):
        if isinstance(other, Const):
            other = other.value
        return self.value == other

    def __repr__(self):
        return str(self.value)


class Timestamp:
    def __init__(self):
        self.dtime = datetime.now()
        self.process_time = time.process_time()

    def timestamp(self):
        return self.dtime.timestamp()

    def isoformat(self):
        return self.dtime.isoformat()

    def __sub__(self, other, minval=0.01):
        return dict(
            wallclock=max(minval, self.timestamp() - other.timestamp()),
            cpu=max(minval, self.process_time - other.process_time),
        )


class Timing(Summarizable):
    """Context manager recording wallclock+CPU time into the summary."""

    def __init__(self):
        self.start_time = None
        self.cur_time = None

    def __enter__(self):
        self.start_time = Timestamp()
        return self

    def __exit__(self, exception_type, exception_value, traceback):
        self.update()

    def update(self):
        self.cur_time = Timestamp()

    def summarize(self):
        if not self.cur_time:
            self.update()
        assert self.start_time is not None
        summary = dict(start=self.start_time.isoformat())
        summary.update(self.cur_time - self.start_time)
        return summary


class CountingDict(dict, Mergeable, Summarizable):
    """dict returning 0 for missing keys; merge = keywise add."""

    def __init__(self, keys=None, sort_by=0, summary_type="dict"):
        super().__init__()
        self.sort_by = sort_by
        self.summary_type = summary_type
        if keys:
            for key in keys:
                self.increment(key)

    def __getitem__(self, name):
        return self.get(name, 0)

    def increment(self, key, inc=1):
        self[key] += inc

    def merge(self, other):
        if not isinstance(other, CountingDict):
            raise ValueError("Cannot merge object of type {}".format(type(other)))
        for key, value in other.items():
            self[key] += value
        return self

    def get_sorted_items(self):
        return sorted(self.items(), key=lambda item: item[self.sort_by])

    def summarize(self):
        summary_func = ordered_dict if self.summary_type == "dict" else tuple
        return summary_func(self.get_sorted_items())


class Histogram(CountingDict):
    def summarize(self):
        hist = super().summarize()
        return dict(hist=hist, summary=self.get_summary_stats())

    def get_summary_stats(self):
        values = tuple(self.keys())
        counts = tuple(self.values())
        mu0 = weighted_mean(values, counts)
        return dict(
            mean=mu0,
            stdev=weighted_stdev(values, counts, mu0),
            median=weighted_median(values, counts),
            modes=weighted_modes(values, counts),
        )


class NestedDict(dict, Mergeable, Summarizable):
    """dict of CountingDicts, auto-created on access."""

    def __init__(self, shape="wide"):
        super().__init__()
        self.shape = shape

    def __getitem__(self, name):
        if name not in self:
            self[name] = CountingDict()
        return self.get(name)

    def merge(self, other):
        if not isinstance(other, NestedDict):
            raise ValueError("Cannot merge object of type {}".format(type(other)))
        for key, value in other.items():
            if key in self:
                self[key].merge(value)
            else:
                self[key] = value
        return self

    def summarize(self):
        keys1 = sorted(self.keys())
        if self.shape == "long":
            return tuple(
                (key1, key2, value)
                for key1 in keys1
                for key2, value in self[key1].items()
            )
        keys2 = set()
        for child in self.values():
            keys2.update(child.keys())
        keys2 = tuple(sorted(keys2))
        return dict(
            columns=keys2,
            rows=ordered_dict(
                (key1, tuple(self[key1].get(key2, 0) for key2 in keys2))
                for key1 in keys1
            ),
        )


class MergingDict(OrderedDict, Mergeable):
    def merge(self, other):
        merge_dicts(self, other)
        return self


def merge_dicts(dest, src):
    """Typed recursive merge (numbers add, Consts assert, dicts recurse)."""
    for key, v_src in src.items():
        if dest.get(key, None) is None:
            dest[key] = v_src
        elif v_src is not None:
            dest[key] = merge_values(dest[key], v_src)


def merge_values(v_dest, v_src):
    if isinstance(v_dest, Mergeable):
        v_dest = v_dest.merge(v_src)
    elif isinstance(v_dest, dict):
        assert isinstance(v_src, dict)
        merge_dicts(v_dest, v_src)
    elif isinstance(v_dest, str):
        assert v_dest == v_src
    elif isinstance(v_dest, Number):
        v_dest += v_src
    elif isinstance(v_dest, Iterable):
        i_dest = tuple(v_dest)
        i_src = tuple(v_src)
        if len(i_dest) == 0:
            v_dest = i_src
        elif len(i_src) > 0:
            v_dest = [merge_values(d, s) for d, s in zip(i_dest, i_src)]
    else:
        assert v_dest == v_src
    return v_dest


def ordered_dict(iterable):
    ordict = OrderedDict()
    for key, value in iterable:
        ordict[key] = value
    return ordict


def enumerate_range(collection, start, end):
    idx = start
    itr = iter(collection)
    while idx < end:
        yield (idx, next(itr))
        idx += 1


def mean(values):
    if len(values) == 0:
        raise ValueError("Cannot determine the mean of an empty sequence")
    return sum(values) / len(values)


def weighted_mean(values, counts):
    datalen = len(values)
    if datalen == 0:
        raise ValueError("Cannot determine the mean of an empty sequence")
    if datalen != len(counts):
        raise ValueError("'values' and 'counts' must be the same length")
    return sum(v * c for v, c in zip(values, counts)) / sum(counts)


def stdev(values, mu0=None):
    datalen = len(values)
    if datalen == 0:
        raise ValueError("Cannot determine the stdev of an empty sequence")
    if datalen == 1:
        return 0
    if mu0 is None:
        mu0 = mean(values)
    return math.sqrt(sum((val - mu0) ** 2 for val in values) / len(values))


def weighted_stdev(values, counts, mu0=None):
    datalen = len(values)
    if datalen == 0:
        raise ValueError("Cannot determine the stdev of an empty sequence")
    if datalen != len(counts):
        raise ValueError("'values' and 'counts' must be the same length")
    if datalen == 1:
        return 0
    if mu0 is None:
        mu0 = weighted_mean(values, counts)
    return math.sqrt(
        sum(((val - mu0) ** 2) * count for val, count in zip(values, counts))
        / sum(counts)
    )


def median(values):
    datalen = len(values)
    if datalen == 0:
        raise ValueError("Cannot determine the median of an empty sequence")
    values.sort()
    idx = datalen // 2
    if datalen % 2 == 1:
        return values[idx]
    return (values[idx - 1] + values[idx]) / 2


def weighted_median(values, counts):
    datalen = len(values)
    if datalen == 0:
        raise ValueError("Cannot determine the median of an empty sequence")
    if datalen != len(counts):
        raise ValueError("'values' and 'counts' must be the same length")
    counts_cumsum = functools.reduce(lambda c, x: c + [c[-1] + x], counts, [0])[1:]
    total = counts_cumsum[-1]
    if total == 0:
        return None
    mid1 = mid2 = (total // 2) + 1
    if total % 2 == 0:
        mid1 -= 1
    val1 = val2 = None
    for i, val in enumerate(counts_cumsum):
        if val1 is None and mid1 <= val:
            val1 = values[i]
        if mid2 <= val:
            val2 = values[i]
            break
    return float(val1 + val2) / 2


def modes(values):
    datalen = len(values)
    if datalen == 0:
        raise ValueError("Cannot determine the mode of an empty sequence")
    if datalen == 1:
        return values
    return _find_modes(CountingDict(values).items())


def weighted_modes(values, counts):
    datalen = len(values)
    if datalen == 0:
        raise ValueError("Cannot determine the mode of an empty sequence")
    if datalen != len(counts):
        raise ValueError("'values' and 'counts' must be the same length")
    if datalen == 1:
        return values
    return _find_modes(zip(values, counts))


def _find_modes(value_count_iter):
    sorted_counts = sorted(value_count_iter, key=lambda x: x[1], reverse=True)
    modal_values = [sorted_counts[0][0]]
    mode_count = sorted_counts[0][1]
    for value, count in sorted_counts[1:]:
        if count == mode_count:
            modal_values.append(value)
        else:
            break
    modal_values.sort()
    return modal_values


def truncate_string(string, max_len=100):
    if string is None:
        return None
    if len(string) > max_len:
        string = string[: max_len - 3] + "..."
    return string


def run_interruptible(func, *args, **kwargs):
    """Run ``func`` mapping KeyboardInterrupt->130, EPIPE->1, errors->1."""
    retcode = 0
    try:
        func(*args, **kwargs)
    except KeyboardInterrupt:
        logging.getLogger().error("Interrupted")
        retcode = 130
    except IOError as err:
        if err.errno == errno.EPIPE:
            retcode = 1
        else:
            raise
    except (AtroposError, EOFError):
        logging.getLogger().error("Atropos error", exc_info=True)
        retcode = 1
    except Exception:  # pylint: disable=broad-except
        logging.getLogger().error("Unknown error", exc_info=True)
        retcode = 1
    return retcode

"""Adapter parsing, matching, and caching.

Host-side adapter model with behavioral parity to the reference
(``atropos/adapters/__init__.py``): the spec grammar (anchoring ``^``/``$``,
linked ``A...B``, ``file:``, ``name=SEQ``, brace expansion), the match
policy (exact substring first, then no-indel prefix/suffix compare or the
DP aligner, validated against min-overlap / error-rate / max-RMP), and
per-adapter statistics.

In the batched engine the same Adapter objects act as *compile-time
parameters*: their translated sequences and flags are baked into the
device kernel invocation (see ``atropos_tpu.align.batched``), while this
module retains per-adapter statistics accumulation and the trimming
bookkeeping.
"""
import itertools
import logging
import os
import pickle
import re
from urllib.error import URLError
from urllib.request import urlopen

from atropos_tpu import align
from atropos_tpu.align import Match
from atropos_tpu.io.seqio import ColorspaceSequence, FastaReader
from atropos_tpu.util import (
    ALPHABETS,
    Const,
    CountingDict,
    GC_BASES,
    IUPAC_BASES,
    MergingDict,
    NestedDict,
    reverse_complement,
)
from atropos_tpu.util import colorspace as cs


class AdapterType:
    """Adapter type name/description plus its alignment flag combination."""

    def __init__(self, name, desc, *flags):
        self.name = name
        self.desc = desc
        self.flags = flags[0]
        for i in range(1, len(flags)):
            self.flags |= flags[i]

    def asdict(self):
        return dict(name=self.name, desc=self.desc, flags=Const(self.flags))


ADAPTER_TYPES = dict(
    back=AdapterType(
        "back",
        "regular 3'",
        align.START_WITHIN_SEQ2,
        align.STOP_WITHIN_SEQ2,
        align.STOP_WITHIN_SEQ1,
    ),
    front=AdapterType(
        "front",
        "regular 5'",
        align.START_WITHIN_SEQ2,
        align.STOP_WITHIN_SEQ2,
        align.START_WITHIN_SEQ1,
    ),
    prefix=AdapterType("prefix", "anchored 5'", align.STOP_WITHIN_SEQ2),
    suffix=AdapterType("suffix", "anchored 3'", align.START_WITHIN_SEQ2),
    anywhere=AdapterType("anywhere", "variable 5'/3'", align.SEMIGLOBAL),
    linked=AdapterType("linked", "linked", "linked"),
)


def where_int_to_dict(where):
    for adapter_type in ADAPTER_TYPES.values():
        if where == adapter_type.flags:
            return adapter_type.asdict()
    raise ValueError("Invalid WHERE value: {}".format(where))


BACK = ADAPTER_TYPES["back"].flags
FRONT = ADAPTER_TYPES["front"].flags
PREFIX = ADAPTER_TYPES["prefix"].flags
SUFFIX = ADAPTER_TYPES["suffix"].flags
ANYWHERE = ADAPTER_TYPES["anywhere"].flags
LINKED = ADAPTER_TYPES["linked"].flags

DEFAULT_ADAPTERS_URL = (
    "https://raw.githubusercontent.com/jdidion/atropos/master/atropos/"
    "adapters/sequencing_adapters.fa"
)
DEFAULT_ADAPTERS_PATH = os.path.join(
    os.path.dirname(__file__), "sequencing_adapters.fa"
)


class AdapterParser:
    """Factory parsing adapter spec strings into Adapter objects."""

    def __init__(self, colorspace=False, cache=None, **kwargs):
        self.colorspace = colorspace
        self.cache = cache
        self.constructor_args = kwargs
        self.adapter_class = ColorspaceAdapter if colorspace else Adapter

    def parse(self, spec, cmdline_type="back"):
        """Yield Adapter(s) for a spec ('file:FILE' yields several)."""
        if spec.startswith("file:"):
            with FastaReader(spec[5:]) as fasta:
                for record in fasta:
                    name = record.name.split(None, 1)[0]
                    yield self.parse_from_spec(record.sequence, cmdline_type, name)
        else:
            yield self.parse_from_spec(spec, cmdline_type)

    def parse_from_spec(self, spec, cmdline_type="back", name=None):
        if cmdline_type not in ADAPTER_TYPES:
            raise ValueError("cmdline_type cannot be {0!r}".format(cmdline_type))
        orig_spec = spec
        where = ADAPTER_TYPES[cmdline_type].flags

        if name is None and spec is None:
            raise ValueError("Either name or spec must be given")
        elif name is None:
            if self.cache and self.cache.has_name(spec):
                name = spec
                spec = self.cache.get_for_name(name)
        elif spec is None:
            if self.cache and self.cache.has_name(name):
                spec = self.cache.get_for_name(name)

        if spec is None:
            raise ValueError("Name not found: {}".format(name))
        elif name is None:
            name, spec = _extract_name_from_spec(spec)

        if self.cache and name is not None:
            self.cache.add(name, spec)

        front_anchored, back_anchored = False, False
        if spec.startswith("^"):
            spec = spec[1:]
            front_anchored = True
        if spec.endswith("$"):
            spec = spec[:-1]
            back_anchored = True

        sequence1, middle, sequence2 = spec.partition("...")

        if where == ANYWHERE:
            if front_anchored or back_anchored:
                raise ValueError("'anywhere' (-b) adapters may not be anchored")
            if middle == "...":
                raise ValueError("'anywhere' (-b) adapters may not be linked")
            return self.adapter_class(
                sequence=spec, where=where, name=name, **self.constructor_args
            )

        assert where == FRONT or where == BACK
        if middle == "...":
            if not sequence1:
                if where == BACK:  # -a ...ADAPTER
                    spec = sequence2
                else:  # -g ...ADAPTER
                    raise ValueError("Invalid adapter specification")
            elif not sequence2:
                if where == BACK:  # -a ADAPTER...
                    spec = sequence1
                    where = FRONT
                    front_anchored = True
                else:  # -g ADAPTER...
                    spec = sequence1
            else:
                # linked adapter
                if self.colorspace:
                    raise NotImplementedError(
                        "Using linked adapters in colorspace is not supported"
                    )
                if where == BACK:
                    front_anchored = True
                return LinkedAdapter(
                    sequence1,
                    sequence2,
                    name=name,
                    front_anchored=front_anchored,
                    back_anchored=back_anchored,
                    **self.constructor_args,
                )

        if front_anchored and back_anchored:
            raise ValueError(
                'Trying to use both "^" and "$" in adapter specification '
                "{!r}".format(orig_spec)
            )
        if front_anchored:
            if where == BACK:
                raise ValueError("Cannot anchor the 3' adapter at its 5' end")
            where = PREFIX
        elif back_anchored:
            if where == FRONT:
                raise ValueError("Cannot anchor 5' adapter at 3' end")
            where = SUFFIX

        return self.adapter_class(
            sequence=spec, where=where, name=name, **self.constructor_args
        )

    def parse_multi(self, back=None, anywhere=None, front=None):
        """Parse all of -a/-b/-g option values into Adapters."""
        adapters = []
        for specs, cmdline_type in (
            (back, "back"),
            (anywhere, "anywhere"),
            (front, "front"),
        ):
            if not specs:
                continue
            for spec in specs:
                adapters.extend(self.parse(spec, cmdline_type))
        return adapters


class Adapter:
    """One adapter plus its aligner and accumulated trim statistics.

    The match policy: try exact substring first (unless the adapter itself
    has wildcards), then no-indel anchored compare or the DP aligner; a
    candidate alignment must satisfy min_overlap, max_error_rate, and
    optionally a maximum random-match probability.
    """

    def __init__(
        self,
        sequence,
        where,
        max_error_rate=0.1,
        min_overlap=3,
        read_wildcards=False,
        adapter_wildcards=True,
        name=None,
        indels=True,
        indel_cost=1,
        match_probability=None,
        max_rmp=None,
        gc_content=0.5,
        alphabet=None,
    ):
        if len(sequence) == 0:
            raise ValueError("Empty adapter sequence")
        sequence = parse_braces(sequence.upper().replace("U", "T"))
        seq_set = set(sequence)
        if seq_set <= set("ACGT"):
            adapter_wildcards = False
        if adapter_wildcards and not seq_set <= IUPAC_BASES:
            raise ValueError(
                "Invalid character(s) in adapter sequence: {}".format(
                    ",".join(seq_set - IUPAC_BASES)
                )
            )
        if alphabet:
            if isinstance(alphabet, str):
                alphabet = ALPHABETS[alphabet]
            alphabet.validate_string(sequence)

        self.debug = False
        self.name = _generate_adapter_name() if name is None else name
        self.sequence = sequence
        self.where = where
        self.max_error_rate = max_error_rate
        self.min_overlap = min(min_overlap, len(self.sequence))
        self.match_probability = match_probability
        self.max_rmp = max_rmp
        self.gc_content = gc_content
        self.indels = indels
        self.adapter_wildcards = adapter_wildcards
        self.read_wildcards = read_wildcards
        trimmers = {
            FRONT: self._trimmed_front,
            PREFIX: self._trimmed_front,
            BACK: self._trimmed_back,
            SUFFIX: self._trimmed_back,
            ANYWHERE: self._trimmed_anywhere,
        }
        self.trimmed = trimmers[where]
        if where == ANYWHERE:
            self._front_flag = None  # guess from match position
        else:
            self._front_flag = where not in (BACK, SUFFIX)
        # statistics about length of removed sequences
        self.lengths_front = CountingDict()
        self.lengths_back = CountingDict()
        self.errors_front = NestedDict()
        self.errors_back = NestedDict()
        self.adjacent_bases = {"A": 0, "C": 0, "G": 0, "T": 0, "": 0}
        self.aligner = align.Aligner(
            self.sequence,
            self.max_error_rate,
            flags=self.where,
            wildcard_ref=self.adapter_wildcards,
            wildcard_query=self.read_wildcards,
        )
        self.aligner.min_overlap = self.min_overlap
        if self.indels:
            self.aligner.indel_cost = indel_cost
        else:
            # indels are suppressed by making them prohibitively expensive
            self.aligner.indel_cost = 100000

    def __repr__(self):
        return (
            '<Adapter(name="{name}", sequence="{sequence}", where={where}, '
            "max_error_rate={max_error_rate}, min_overlap={min_overlap}, "
            "read_wildcards={read_wildcards}, "
            "adapter_wildcards={adapter_wildcards}, "
            "indels={indels})>".format(**vars(self))
        )

    def enable_debug(self):
        self.debug = True
        self.aligner.enable_debug()

    def match_to(self, read):
        """Match this adapter against a read; returns a Match or None."""
        read_seq = read.sequence.upper()

        # exact-substring fast path
        pos = -1
        if not self.adapter_wildcards:
            if self.where == PREFIX:
                if read_seq.startswith(self.sequence):
                    pos = 0
            elif self.where == SUFFIX:
                if read_seq.endswith(self.sequence):
                    pos = len(read_seq) - len(self.sequence)
            else:
                pos = read_seq.find(self.sequence)

        if pos >= 0:
            seqlen = len(self.sequence)
            return Match(
                0, seqlen, pos, pos + seqlen, seqlen, 0, self._front_flag, self, read
            )

        # approximate matching
        if not self.indels and self.where in (PREFIX, SUFFIX):
            if self.where == PREFIX:
                alignment = align.compare_prefixes(
                    self.sequence,
                    read_seq,
                    wildcard_ref=self.adapter_wildcards,
                    wildcard_query=self.read_wildcards,
                )
            else:
                alignment = align.compare_suffixes(
                    self.sequence,
                    read_seq,
                    wildcard_ref=self.adapter_wildcards,
                    wildcard_query=self.read_wildcards,
                )
        else:
            alignment = self.aligner.locate(read_seq)
            if self.debug:
                print(self.aligner.dpmatrix)  # pragma: no cover

        if alignment:
            astart, astop, rstart, rstop, matches, errors = alignment
            size = astop - astart
            if (
                size >= self.min_overlap
                and errors / size <= self.max_error_rate
            ) and (
                self.max_rmp is None
                or self.match_probability(matches, size) <= self.max_rmp
            ):
                return Match(
                    astart, astop, rstart, rstop, matches, errors,
                    self._front_flag, self, read,
                )

        return None

    def _trimmed_anywhere(self, match):
        if match.front:
            return self._trimmed_front(match)
        return self._trimmed_back(match)

    def _trimmed_front(self, match):
        self.lengths_front[match.rstop] += 1
        self.errors_front[match.rstop][match.errors] += 1
        return match.read[match.rstop :]

    def _trimmed_back(self, match):
        self.lengths_back[len(match.read) - match.rstart] += 1
        self.errors_back[len(match.read) - match.rstart][match.errors] += 1
        adjacent_base = match.read.sequence[match.rstart - 1 : match.rstart]
        if adjacent_base not in "ACGT":
            adjacent_base = ""
        self.adjacent_bases[adjacent_base] += 1
        return match.read[: match.rstart]

    def __len__(self):
        return len(self.sequence)

    def random_match_probabilities(self):
        """Per-length probabilities of this adapter matching random bases."""
        if self._front_flag:
            seq = self.sequence[::-1]
        else:
            seq = self.sequence

        base_probs = (self.gc_content / 2.0, (1 - self.gc_content) / 2.0)
        probabilities = [1.0] + ([0] * len(seq))
        c_bases = frozenset(GC_BASES if self.adapter_wildcards else "GC")

        cur_p = 1.0
        for idx, base in enumerate(seq, 1):
            cur_p *= base_probs[0 if base in c_bases else 1]
            probabilities[idx] = cur_p
        return probabilities

    def summarize(self):
        total_front = sum(self.lengths_front.values())
        total_back = sum(self.lengths_back.values())

        stats = MergingDict(
            adapter_class=self.__class__.__name__,
            total_front=total_front,
            total_back=total_back,
            total=total_front + total_back,
            match_probabilities=Const(self.random_match_probabilities()),
        )

        where = self.where
        assert (
            where in (ANYWHERE, LINKED)
            or (where in (BACK, SUFFIX) and total_front == 0)
            or (where in (FRONT, PREFIX) and total_back == 0)
        )

        stats["where"] = where_int_to_dict(where)
        stats["sequence"] = Const(self.sequence)
        stats["max_error_rate"] = Const(self.max_error_rate)
        if where in (ANYWHERE, FRONT, PREFIX):
            stats["lengths_front"] = self.lengths_front
            stats["errors_front"] = self.errors_front
        if where in (ANYWHERE, BACK, SUFFIX):
            stats["lengths_back"] = self.lengths_back
            stats["errors_back"] = self.errors_back
        if where in (BACK, SUFFIX):
            stats["adjacent_bases"] = self.adjacent_bases

        return stats


class ColorspaceAdapter(Adapter):
    """Adapter matching in SOLiD colorspace."""

    def __init__(self, *args, **kwargs):
        if kwargs.get("adapter_wildcards", False):
            raise ValueError("Wildcards not supported for colorspace adapters")
        kwargs["adapter_wildcards"] = False
        super().__init__(*args, **kwargs)
        has_nucleotide_seq = False
        if set(self.sequence) <= set("ACGT"):
            self.nucleotide_sequence = self.sequence
            has_nucleotide_seq = True
            self.sequence = cs.encode(self.sequence)[1:]
        if self.where in (PREFIX, FRONT) and not has_nucleotide_seq:
            raise ValueError(
                "A 5' colorspace adapter needs to be given in nucleotide space"
            )
        self.aligner.reference = self.sequence

    def match_to(self, read):
        if self.where != PREFIX:
            return super().match_to(read)
        # artificial adapter including the primer-to-adapter transition color
        asequence = (
            cs.ENCODE[read.primer + self.nucleotide_sequence[0:1]] + self.sequence
        )

        pos = 0 if read.sequence.startswith(asequence) else -1
        if pos >= 0:
            match = Match(
                0, len(asequence), pos, pos + len(asequence), len(asequence), 0,
                self._front_flag, self, read,
            )
        else:
            self.aligner.reference = asequence
            alignment = self.aligner.locate(read.sequence)
            if self.debug:
                print(self.aligner.dpmatrix)  # pragma: no cover
            if alignment is not None:
                match = Match(*(alignment + (self._front_flag, self, read)))
            else:
                match = None

        if match is None:
            return None
        assert match.length > 0 and match.errors / match.length <= self.max_error_rate
        assert match.length >= self.min_overlap
        return match

    def _trimmed_front(self, match):
        read = match.read
        self.lengths_front[match.rstop] += 1
        self.errors_front[match.rstop][match.errors] += 1
        # re-encode the first color following the adapter match
        color_after_adapter = read.sequence[match.rstop : match.rstop + 1]
        if not color_after_adapter:
            return read[match.rstop :]
        base_after_adapter = cs.DECODE[
            self.nucleotide_sequence[-1:] + color_after_adapter
        ]
        new_first_color = cs.ENCODE[read.primer + base_after_adapter]
        new_read = read[:]
        new_read.sequence = new_first_color + read.sequence[(match.rstop + 1) :]
        new_read.qualities = None
        if read.qualities:
            new_read.qualities = read.qualities[match.rstop :]
        return new_read

    def _trimmed_back(self, match):
        # trim one more color if long enough
        adjusted_rstart = max(match.rstart - 1, 0)
        self.lengths_back[len(match.read) - adjusted_rstart] += 1
        self.errors_back[len(match.read) - adjusted_rstart][match.errors] += 1
        return match.read[:adjusted_rstart]

    def __repr__(self):
        return "<ColorspaceAdapter(sequence={0!r}, where={1})>".format(
            self.sequence, self.where
        )


class LinkedMatch:
    """Match result of a LinkedAdapter (front match required)."""

    def __init__(self, front_match, back_match, adapter):
        self.front_match = front_match
        self.back_match = back_match
        self.adapter = adapter
        assert front_match is not None

    def get_info_record(self):
        if self.back_match:
            return self.back_match.get_info_record()
        return self.front_match.get_info_record()


class LinkedAdapter:
    """5'-anchored front adapter + 3' back adapter; the back adapter is only
    searched if the front matched."""

    def __init__(
        self,
        front_sequence,
        back_sequence,
        front_anchored=True,
        back_anchored=False,
        name=None,
        **kwargs,
    ):
        assert front_anchored and not back_anchored
        where1 = PREFIX if front_anchored else FRONT
        where2 = SUFFIX if back_anchored else BACK
        self.front_anchored = front_anchored
        self.back_anchored = back_anchored

        self.where = LINKED
        self.name = _generate_adapter_name() if name is None else name
        self.front_adapter = Adapter(front_sequence, where=where1, name=None, **kwargs)
        self.back_adapter = Adapter(back_sequence, where=where2, name=None, **kwargs)

    def enable_debug(self):
        self.front_adapter.enable_debug()
        self.back_adapter.enable_debug()

    def match_to(self, read):
        front_match = self.front_adapter.match_to(read)
        if front_match is None:
            return None
        read = read[front_match.rstop :]
        back_match = self.back_adapter.match_to(read)
        return LinkedMatch(front_match, back_match, self)

    def trimmed(self, match):
        front_trimmed = self.front_adapter.trimmed(match.front_match)
        if match.back_match:
            return self.back_adapter.trimmed(match.back_match)
        return front_trimmed

    def summarize(self):
        total_front = sum(self.front_adapter.lengths_front.values())
        total_back = sum(self.back_adapter.lengths_back.values())

        stats = MergingDict(
            total_front=total_front,
            total_back=total_back,
            total=total_front + total_back,
        )

        where = self.where
        assert (
            where in (ANYWHERE, LINKED)
            or (where in (BACK, SUFFIX) and total_front == 0)
            or (where in (FRONT, PREFIX) and total_back == 0)
        )

        stats["where"] = where_int_to_dict(where)
        stats["front_sequence"] = Const(self.front_adapter.sequence)
        stats["front_match_probabilities"] = Const(
            self.front_adapter.random_match_probabilities()
        )
        stats["back_sequence"] = Const(self.back_adapter.sequence)
        stats["back_match_probabilities"] = Const(
            self.back_adapter.random_match_probabilities()
        )
        stats["front_max_error_rate"] = Const(self.front_adapter.max_error_rate)
        stats["back_max_error_rate"] = Const(self.back_adapter.max_error_rate)
        stats["front_lengths_front"] = self.front_adapter.lengths_front
        stats["front_lengths_back"] = self.front_adapter.lengths_back
        stats["back_lengths_front"] = self.back_adapter.lengths_front
        stats["back_lengths_back"] = self.back_adapter.lengths_back
        stats["front_errors_front"] = self.front_adapter.errors_front
        stats["front_errors_back"] = self.front_adapter.errors_back
        stats["back_errors_front"] = self.back_adapter.errors_front
        stats["back_errors_back"] = self.back_adapter.errors_back

        return stats


class AdapterCache:
    """Pickle-backed cache of known adapter name<->sequence mappings."""

    def __init__(self, path=".adapters", auto_reverse_complement=False):
        self.path = path
        self.auto_reverse_complement = auto_reverse_complement
        if path and os.path.exists(path):
            with open(path, "rb") as cache:
                try:
                    self.seq_to_name, self.name_to_seq = pickle.load(cache)
                    return
                except Exception:
                    # tolerate corrupt cache files
                    pass
        self.seq_to_name = {}
        self.name_to_seq = {}

    @property
    def empty(self):
        return len(self.seq_to_name) == 0

    def save(self):
        if self.path is not None:
            with open(self.path, "wb") as cache:
                pickle.dump((self.seq_to_name, self.name_to_seq), cache)

    def add(self, name, seq):
        self._add(name, seq)
        if self.auto_reverse_complement:
            self._add("{}_rc".format(name), reverse_complement(seq))

    def _add(self, name, seq):
        if seq not in self.seq_to_name:
            self.seq_to_name[seq] = set()
        self.seq_to_name[seq].add(name)
        self.name_to_seq[name] = seq

    def load_from_file(self, path=DEFAULT_ADAPTERS_PATH):
        with open(path, "rt") as infile:
            return self.load_from_fasta(infile)

    def load_from_url(self, url=DEFAULT_ADAPTERS_URL):
        logging.getLogger().info("Loading list of known contaminants from %s", url)
        try:
            fasta = urlopen(url).read().decode().split("\n")
            return self.load_from_fasta(fasta)
        except URLError:
            if url.startswith("file:"):
                url = url[5:]
            return self.load_from_file(url)

    def load_from_fasta(self, fasta):
        close = False
        if isinstance(fasta, str):
            fasta = open(fasta, "rt")
            close = True
        num_records = None
        with FastaReader(fasta) as reader:
            for num_records, record in enumerate(reader, 1):
                name = record.name.split(None, 1)[0]
                seq = record.sequence
                self.add(name, seq)
        if close:
            fasta.close()
        return num_records

    def load_default(self):
        """Load the bundled adapter database (no network in this build)."""
        try:
            return self.load_from_file()
        except IOError:
            logging.getLogger().warning(
                "Error loading adapters from file %s", DEFAULT_ADAPTERS_PATH
            )

    @property
    def names(self):
        return list(self.name_to_seq.keys())

    @property
    def sequences(self):
        return list(self.seq_to_name.keys())

    def iter_names(self):
        return self.name_to_seq.items()

    def iter_sequences(self):
        return self.seq_to_name.items()

    def has_name(self, name):
        return name in self.name_to_seq

    def get_for_name(self, name):
        return self.name_to_seq[name]

    def has_seq(self, seq):
        return seq in self.seq_to_name

    def get_for_seq(self, seq):
        return list(self.seq_to_name[seq])

    def summarize(self):
        return dict(
            path=self.path,
            auto_reverse_complement=self.auto_reverse_complement,
            num_adapter_names=len(self.name_to_seq),
            num_adapter_seqs=len(self.seq_to_name),
        )


def parse_braces(sequence):
    """Expand ``x{n}`` into n copies of x; raise ValueError on bad syntax."""
    result = ""
    prev = None
    for char in re.split(r"(\{|\})", sequence):
        if char == "":
            continue
        if prev is None:
            if char == "{":
                raise ValueError('"{" must be used after a character')
            if char == "}":
                raise ValueError('"}" cannot be used here')
            prev = char
            result += char
        elif prev == "{":
            prev = int(char)
            if not 0 <= prev <= 10000:
                raise ValueError("Value {} invalid".format(prev))
        elif isinstance(prev, int):
            if char != "}":
                raise ValueError('"}" expected')
            result = result[:-1] + result[-1] * prev
            prev = None
        else:
            if char != "{":
                raise ValueError('Expected "{"')
            prev = "{"
    if isinstance(prev, int) or prev == "{":
        raise ValueError("Unterminated expression")
    return result


def _extract_name_from_spec(spec):
    fields = spec.split("=", 1)
    if len(fields) > 1:
        name, spec = fields
        name = name.strip()
    else:
        name = None
    spec = spec.strip()
    return name, spec


ADAPTER_ID_GENERATOR = itertools.count(1)


def _generate_adapter_name():
    return str(next(ADAPTER_ID_GENERATOR))

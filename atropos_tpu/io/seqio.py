"""Sequence I/O: reading/writing FASTA, FASTQ, and SAM/BAM.

Host-side record model and streaming readers. The record model keeps the
reference's provenance semantics (``atropos/io/_seqio.pyx``): ``clipped``
tracks bases cut before/after adapter matching at each end, which feeds
MinCutter and the info-file output; output formatting is byte-compatible
with the reference formatters (``atropos/io/seqio.py:642-764``).

The device path converts streams of these records into struct-of-array
batches (:mod:`atropos_tpu.io.batch`); names and rare metadata stay
host-side, sequence/quality bytes go to the TPU.
"""
import sys

from atropos_tpu import AtroposError
from atropos_tpu.io import STDOUT, xopen
from atropos_tpu.io.compression import splitext_compressed
from atropos_tpu.util import ALPHABETS, Summarizable, reverse_complement, truncate_string

SINGLE = 0
READ1 = 1
READ2 = 2
PAIRED = 1 | 2


class FormatError(AtroposError):
    """Raised when an input file (FASTA or FASTQ) is malformatted."""


class UnknownFileType(AtroposError):
    """Raised when open could not autodetect the file type."""


class Sequence:
    """A sequencing read: name, sequence, qualities (phred+33 ASCII), plus
    trim provenance (``clipped``: [front-pre, back-pre, front-post,
    back-post] bases cut before/after adapter matching), the adapter
    ``match``/``match_info``, and pair-level flags."""

    __slots__ = (
        "name",
        "sequence",
        "qualities",
        "name2",
        "original_length",
        "match",
        "match_info",
        "clipped",
        "insert_overlap",
        "merged",
        "corrected",
    )

    def __init__(
        self,
        name,
        sequence,
        qualities=None,
        name2="",
        original_length=None,
        match=None,
        match_info=None,
        clipped=None,
        insert_overlap=False,
        merged=False,
        corrected=0,
        alphabet=None,
    ):
        if qualities is not None and len(sequence) != len(qualities):
            rname = truncate_string(name)
            raise FormatError(
                "In read named {0!r}: length of quality sequence ({1}) and "
                "length  of read ({2}) do not match".format(
                    rname, len(qualities), len(sequence)
                )
            )
        if alphabet:
            sequence = alphabet.resolve_string(sequence)
        self.name = name
        self.sequence = sequence
        self.qualities = qualities
        self.name2 = name2
        self.original_length = original_length or len(sequence)
        self.match = match
        self.match_info = match_info
        self.clipped = clipped or [0, 0, 0, 0]
        self.insert_overlap = insert_overlap
        self.merged = merged
        self.corrected = corrected

    def subseq(self, begin=0, end=None):
        """Slice [begin:end], updating clip provenance. Returns
        (front_bases, back_bases, new_read)."""
        if end is None:
            new_read = self[begin:]
            end_bases = 0
        else:
            new_read = self[begin:end]
            end_bases = len(self) - end
        offset = 2 if self.match else 0
        if begin:
            new_read.clipped[offset] += begin
        if end_bases:
            new_read.clipped[offset + 1] += end_bases
        return (begin, end_bases, new_read)

    def clip(self, front=0, back=0):
        """Cut ``front`` bases from the start and ``-back`` from the end."""
        if back < 0:
            new_read = self[front:back]
            back *= -1
        else:
            new_read = self[front:]
        offset = 2 if self.match else 0
        if front:
            new_read.clipped[offset] += front
        if back:
            new_read.clipped[offset + 1] += back
        return (front, back, new_read)

    def reverse_complement(self):
        """Copy with sequence reverse-complemented and qualities reversed."""
        import copy as _copy

        sequence = reverse_complement(self.sequence)
        qualities = None
        match_info = None
        if self.qualities:
            qualities = self.qualities[::-1]
        if self.match_info:
            match_info = [_copy.copy(m) for m in self.match_info]
        new_read = self.__class__(
            self.name,
            sequence,
            qualities,
            self.name2,
            self.original_length,
            None,
            match_info,
            list(self.clipped),
            self.insert_overlap,
            self.merged,
            self.corrected,
        )
        if self.match:
            match = self.match.copy()
            match.read = new_read
            new_read.match = match
        return new_read

    def __getitem__(self, key):
        return self.__class__(
            self.name,
            self.sequence[key],
            self.qualities[key] if self.qualities is not None else None,
            self.name2,
            self.original_length,
            self.match,
            self.match_info,
            list(self.clipped),
            self.insert_overlap,
            self.merged,
            self.corrected,
        )

    def __repr__(self):
        qstr = ""
        if self.qualities is not None:
            qstr = ", qualities={0!r}".format(truncate_string(self.qualities))
        return "<Sequence(name={0!r}, sequence={1!r}{2})>".format(
            truncate_string(self.name), truncate_string(self.sequence), qstr
        )

    def __len__(self):
        return len(self.sequence)

    def __eq__(self, other):
        return (
            self.name == other.name
            and self.sequence == other.sequence
            and self.qualities == other.qualities
        )

    def __ne__(self, other):
        return not self.__eq__(other)


class ColorspaceSequence(Sequence):
    """Colorspace read: first char is the primer base, remainder colors."""

    __slots__ = ("primer",)

    def __init__(
        self,
        name,
        sequence,
        qualities,
        primer=None,
        name2="",
        original_length=None,
        match=None,
        match_info=None,
        clipped=None,
        insert_overlap=False,
        merged=False,
        corrected=0,
        alphabet=None,
    ):
        if primer is None:
            self.primer = sequence[0:1]
            sequence = sequence[1:]
        else:
            self.primer = primer
        if qualities is not None and len(sequence) != len(qualities):
            rname = truncate_string(name)
            raise FormatError(
                "In read named {0!r}: length of colorspace quality "
                "sequence ({1}) and length of read ({2}) do not match (primer "
                "is: {3!r})".format(rname, len(qualities), len(sequence), self.primer)
            )
        super().__init__(
            name,
            sequence,
            qualities,
            name2,
            original_length,
            match,
            match_info,
            clipped,
            insert_overlap,
            merged,
            corrected,
            alphabet=alphabet,
        )
        if self.primer not in ("A", "C", "G", "T"):
            raise FormatError(
                "Primer base is {0!r} in read {1!r}, but it should be one of "
                "A, C, G, T.".format(self.primer, truncate_string(name))
            )

    def __repr__(self):
        qstr = ""
        if self.qualities is not None:
            qstr = ", qualities={0!r}".format(truncate_string(self.qualities))
        return "<ColorspaceSequence(name={0!r}, primer={1!r}, sequence={2!r}{3})>".format(
            truncate_string(self.name), self.primer, truncate_string(self.sequence), qstr
        )

    def __getitem__(self, key):
        return self.__class__(
            self.name,
            self.sequence[key],
            self.qualities[key] if self.qualities is not None else None,
            self.primer,
            self.name2,
            self.original_length,
            self.match,
            self.match_info,
            list(self.clipped),
            self.insert_overlap,
            self.merged,
            self.corrected,
        )


def sra_colorspace_sequence(name, sequence, qualities, name2, alphabet=None):
    """SRA colorspace reads carry one extra leading quality value."""
    return ColorspaceSequence(
        name, sequence, qualities[1:], name2=name2, alphabet=alphabet
    )


# --------------------------------------------------------------------------
# Readers
# --------------------------------------------------------------------------


class SequenceReaderBase(Summarizable):
    """Interface: input_names, input_read, file_format, delivers_qualities,
    has_qualfile, quality_base, colorspace, interleaved."""

    def summarize(self):
        return dict(
            input_names=self.input_names,
            input_read=self.input_read,
            file_format=self.file_format,
            delivers_qualities=self.delivers_qualities,
            quality_base=self.quality_base,
            has_qualfile=self.has_qualfile,
            colorspace=self.colorspace,
            interleaved=self.interleaved,
        )


class SequenceReader(SequenceReaderBase):
    """Reader over a possibly-compressed file path or file-like object."""

    delivers_qualities = False
    has_qualfile = False
    colorspace = False
    interleaved = False
    input_read = SINGLE
    _close_on_exit = False

    def __init__(self, path, mode="r", quality_base=None, alphabet=None):
        self.quality_base = quality_base
        self.alphabet = alphabet
        if isinstance(path, str):
            self.name = path
            self._file = xopen(path, mode)
            self._close_on_exit = True
        else:
            if hasattr(path, "name"):
                self.name = path.name
            else:
                self.name = path.__class__
            self._file = path

    @property
    def input_names(self):
        return (self.name, None)

    def close(self):
        if self._close_on_exit and self._file is not None:
            self._file.close()
            self._file = None

    def __enter__(self):
        if self._file is None:
            raise ValueError("I/O operation on closed SequenceReader")
        return self

    def __exit__(self, *args):
        self.close()


class FileWithPrependedLine:
    """File-like that replays one already-consumed line before the rest
    (needed for content-based format autodetection on streams)."""

    def __init__(self, file, line):
        if not line.endswith("\n"):
            line += "\n"
        self.first_line = line
        self._file = file

    @property
    def name(self):
        return self._file.name

    def __iter__(self):
        yield self.first_line
        for line in self._file:
            yield line

    def close(self):
        self._file.close()


class FastqReader(SequenceReader):
    """4-line FASTQ parser (no multi-line records), CR/LF tolerant, with
    second-header consistency validation."""

    file_format = "FASTQ"
    delivers_qualities = True

    def __init__(self, filename, quality_base=33, sequence_class=Sequence, alphabet=None):
        super().__init__(filename, quality_base=quality_base, alphabet=alphabet)
        self.sequence_class = sequence_class

    def __iter__(self):
        sequence_class = self.sequence_class
        alphabet = self.alphabet

        it = iter(self._file)
        try:
            line = next(it)
        except StopIteration:
            return
        if not (line and line[0] == "@"):
            raise FormatError(
                "Line 1 in FASTQ file is expected to start with '@', but "
                "found {0!r}".format(line[:10])
            )
        strip = -2 if line.endswith("\r\n") else -1
        name = line[1:strip]

        i = 1
        name2 = ""
        sequence = ""
        for line in it:
            if i == 0:
                if not (line and line[0] == "@"):
                    raise FormatError(
                        "Line {0} in FASTQ file is expected to start with "
                        "'@', but found {1!r}".format(i + 1, line[:10])
                    )
                name = line[1:strip]
            elif i == 1:
                sequence = line[:strip]
            elif i == 2:
                if line == "+\n":
                    name2 = ""
                else:
                    line = line[:strip]
                    if not (line and line[0] == "+"):
                        raise FormatError(
                            "Line {0} in FASTQ file is expected to start "
                            "with '+', but found {1!r}".format(i + 1, line[:10])
                        )
                    if len(line) > 1:
                        if not line[1:] == name:
                            raise FormatError(
                                "At line {0}: Sequence descriptions in the "
                                "FASTQ file don't match ({1!r} != {2!r}).\n"
                                "The second sequence description must be "
                                "either empty or equal to the first "
                                "description.".format(i + 1, name, line[1:])
                            )
                        name2 = name
                    else:
                        name2 = ""
            elif i == 3:
                if len(line) == len(sequence) - strip:
                    qualities = line[:strip]
                else:
                    qualities = line.rstrip("\r\n")
                try:
                    yield sequence_class(
                        name, sequence, qualities, name2=name2, alphabet=alphabet
                    )
                except Exception as err:
                    raise FormatError(
                        "Error creating sequence record at line {}".format(i + 1)
                    ) from err
            i = (i + 1) % 4
        if i != 0:
            raise FormatError("FASTQ file ended prematurely")


class FastaReader(SequenceReader):
    """FASTA reader ('#' comment lines skipped, records may wrap)."""

    file_format = "FASTA"

    def __init__(self, path, keep_linebreaks=False, sequence_class=Sequence, alphabet=None):
        super().__init__(path, alphabet=alphabet)
        self.sequence_class = sequence_class
        self._delimiter = "\n" if keep_linebreaks else ""

    def __iter__(self):
        name = None
        seq = []
        for i, line in enumerate(self._file):
            line = line.strip()
            if not line:
                continue
            if line[0] == ">":
                if name is not None:
                    yield self.sequence_class(
                        name, self._delimiter.join(seq), None, alphabet=self.alphabet
                    )
                name = line[1:]
                seq = []
            elif line[0] == "#":
                continue
            elif name is not None:
                seq.append(line)
            else:
                raise FormatError(
                    "At line {0}: Expected '>' at beginning of FASTA record, "
                    "but got {1!r}.".format(i + 1, truncate_string(line))
                )

        if name is not None:
            yield self.sequence_class(
                name, self._delimiter.join(seq), None, alphabet=self.alphabet
            )


class ColorspaceFastaReader(FastaReader):
    colorspace = True

    def __init__(self, path, keep_linebreaks=False, alphabet=None):
        super().__init__(
            path, keep_linebreaks, sequence_class=ColorspaceSequence, alphabet=alphabet
        )


class ColorspaceFastqReader(FastqReader):
    colorspace = True

    def __init__(self, path, quality_base=33, alphabet=None):
        super().__init__(
            path, quality_base=quality_base, sequence_class=ColorspaceSequence,
            alphabet=alphabet,
        )


class SRAColorspaceFastqReader(FastqReader):
    colorspace = True

    def __init__(self, path, quality_base=33, alphabet=None):
        super().__init__(
            path, quality_base=quality_base, sequence_class=sra_colorspace_sequence,
            alphabet=alphabet,
        )


class FastaQualReader(SequenceReaderBase):
    """Paired .(CS)FASTA + .QUAL file reader."""

    file_format = "FastaQual"
    delivers_qualities = True
    has_qualfile = True
    colorspace = False
    interleaved = False
    input_read = SINGLE

    def __init__(self, fastafile, qualfile, quality_base=33, sequence_class=Sequence, alphabet=None):
        self.fastareader = FastaReader(fastafile)
        self.qualreader = FastaReader(qualfile, keep_linebreaks=True)
        self.quality_base = quality_base
        self.sequence_class = sequence_class
        self.alphabet = alphabet

    @property
    def input_names(self):
        return ((self.fastareader.name, self.qualreader.name), None)

    def __iter__(self):
        conv = dict()
        for i in range(-5, 256 - 33):
            conv[str(i)] = chr(i + 33)
        for fastaread, qualread in zip(self.fastareader, self.qualreader):
            if fastaread.name != qualread.name:
                raise FormatError(
                    "The read names in the FASTA and QUAL file do not match "
                    "({0!r} != {1!r})".format(fastaread.name, qualread.name)
                )
            try:
                qualities = "".join(
                    [conv[value] for value in qualread.sequence.split()]
                )
            except KeyError as err:
                raise FormatError(
                    "Within read named {0!r}: Found invalid quality "
                    "value {1}".format(fastaread.name, err)
                )
            yield self.sequence_class(
                fastaread.name, fastaread.sequence, qualities, alphabet=self.alphabet
            )

    def close(self):
        self.fastareader.close()
        self.qualreader.close()

    def __enter__(self):
        return self

    def __exit__(self, *args):
        self.close()


class ColorspaceFastaQualReader(FastaQualReader):
    colorspace = True

    def __init__(self, fastafile, qualfile, quality_base=33, alphabet=None):
        super().__init__(
            fastafile, qualfile, quality_base=quality_base,
            sequence_class=ColorspaceSequence, alphabet=alphabet,
        )


def sequence_names_match(read1, read2):
    """Pair-name check ignoring a trailing 1/2 mate indicator."""
    name1 = read1.name.split(None, 1)[0]
    name2 = read2.name.split(None, 1)[0]
    if name1[-1:] in "12" and name2[-1:] in "12":
        name1 = name1[:-1]
        name2 = name2[:-1]
    return name1 == name2


class PairedSequenceReader(SequenceReaderBase):
    """Reads from two files in lockstep, validating pairing."""

    input_read = PAIRED
    interleaved = False

    def __init__(self, file1, file2, quality_base=33, colorspace=False, file_format=None, alphabet=None):
        self.reader1 = open_reader(
            file1, colorspace=colorspace, quality_base=quality_base,
            file_format=file_format, alphabet=alphabet,
        )
        self.reader2 = open_reader(
            file2, colorspace=colorspace, quality_base=quality_base,
            file_format=file_format, alphabet=alphabet,
        )

    @property
    def input_names(self):
        return (self.reader1.input_names[0], self.reader2.input_names[0])

    def __getattr__(self, name):
        return getattr(self.reader1, name)

    def __iter__(self):
        it1, it2 = iter(self.reader1), iter(self.reader2)
        while True:
            try:
                read1 = next(it1)
            except StopIteration:
                try:
                    next(it2)
                    raise FormatError(
                        "Reads are improperly paired. There are more reads in "
                        "file 2 than in file 1."
                    )
                except StopIteration:
                    pass
                break
            try:
                read2 = next(it2)
            except StopIteration:
                raise FormatError(
                    "Reads are improperly paired. There are more reads in "
                    "file 1 than in file 2."
                )
            if not sequence_names_match(read1, read2):
                raise FormatError(
                    "Reads are improperly paired. Read name '{0}' in file 1 "
                    "does not match '{1}' in file 2.".format(read1.name, read2.name)
                )
            yield (read1, read2)

    def close(self):
        self.reader1.close()
        self.reader2.close()

    def __enter__(self):
        return self

    def __exit__(self, *args):
        self.close()


class InterleavedSequenceReader(SequenceReaderBase):
    """Read pairs from an interleaved file."""

    input_read = PAIRED
    interleaved = True

    def __init__(self, path, quality_base=33, colorspace=False, file_format=None, alphabet=None):
        self.reader = open_reader(
            path, quality_base=quality_base, colorspace=colorspace,
            file_format=file_format, alphabet=alphabet,
        )

    def __getattr__(self, name):
        return getattr(self.reader, name)

    def __iter__(self):
        itr = iter(self.reader)
        for read1 in itr:
            try:
                read2 = next(itr)
            except StopIteration:
                raise FormatError(
                    "Interleaved input file incomplete: Last record has no "
                    "partner."
                )
            if not sequence_names_match(read1, read2):
                raise FormatError(
                    "Reads are improperly paired. Name {0!r} (first) does not "
                    "match {1!r} (second).".format(read1.name, read2.name)
                )
            yield (read1, read2)

    def close(self):
        self.reader.close()

    def __enter__(self):
        return self

    def __exit__(self, *args):
        self.close()


class SAMReader(SequenceReaderBase):
    """SAM/BAM reader via pysam (paired files must be name-sorted)."""

    file_format = "SAM"
    delivers_qualities = True
    interleaved = False
    has_qualfile = False
    colorspace = False

    def __init__(self, path, quality_base=33, sequence_class=Sequence, alphabet=None, pysam_kwargs=None):
        self._close_on_exit = False
        if isinstance(path, str):
            path = xopen(path, "rb")
            self._close_on_exit = True
        self.name = path.name if hasattr(path, "name") else str(path)
        self._file = path
        self.quality_base = quality_base
        self.sequence_class = sequence_class
        self.alphabet = alphabet
        self.pysam_kwargs = pysam_kwargs or dict(check_sq=False)

    @property
    def input_names(self):
        return (self.name, None)

    def __iter__(self):
        try:
            import pysam

            return self._iter(
                pysam.AlignmentFile(self._file, **self.pysam_kwargs)
            )
        except ImportError:
            # fall back to a text-SAM parser with a pysam-compatible
            # record surface (BAM still requires pysam)
            return self._iter(_TextSamFile(self._file))

    def _iter(self, sam):
        raise NotImplementedError()

    def __enter__(self):
        return self

    def __exit__(self, *args):
        self.close()

    def close(self):
        if self._close_on_exit and self._file is not None:
            self._file.close()
            self._file = None

    def _as_sequence(self, read):
        return self.sequence_class(
            read.query_name,
            read.query_sequence,
            "".join(chr(33 + q) for q in read.query_qualities),
            alphabet=self.alphabet,
        )


class _TextSamRecord:
    """pysam.AlignedSegment work-alike over one text SAM line."""

    __slots__ = ("query_name", "flag", "query_sequence", "query_qualities")

    def __init__(self, fields):
        self.query_name = fields[0]
        self.flag = int(fields[1])
        seq = fields[9]
        self.query_sequence = None if seq == "*" else seq
        qual = fields[10]
        if qual == "*":
            self.query_qualities = None
        else:
            self.query_qualities = [ord(ch) - 33 for ch in qual]

    @property
    def is_read1(self):
        return bool(self.flag & 0x40)

    @property
    def is_read2(self):
        return bool(self.flag & 0x80)


class _TextSamFile:
    """Text-only SAM iterator used when pysam is unavailable. Yields every
    alignment record (like pysam's default iteration); rejects BAM."""

    def __init__(self, fileobj):
        self._file = fileobj

    def __iter__(self):
        first = True
        for line in self._file:
            if isinstance(line, bytes):
                if first and line[:2] == b"\x1f\x8b" or line[:4] == b"BAM\x01":
                    raise ImportError(
                        "Reading BAM files requires the pysam library"
                    )
                line = line.decode("ascii")
            first = False
            if not line or line.startswith("@"):
                continue
            fields = line.rstrip("\n").split("\t")
            if len(fields) < 11:
                raise FormatError(
                    "SAM line has {} fields; expected at least 11".format(
                        len(fields)
                    )
                )
            yield _TextSamRecord(fields)


class SingleEndSAMReader(SAMReader):
    input_read = SINGLE

    def _iter(self, sam):
        for read in sam:
            yield self._as_sequence(read)


class Read1SingleEndSAMReader(SAMReader):
    input_read = READ1

    def _iter(self, sam):
        for read in sam:
            if read.is_read1:
                yield self._as_sequence(read)


class Read2SingleEndSAMReader(SAMReader):
    input_read = READ2

    def _iter(self, sam):
        for read in sam:
            if read.is_read2:
                yield self._as_sequence(read)


class PairedEndSAMReader(SAMReader):
    input_read = PAIRED
    interleaved = True

    def _iter(self, sam):
        for reads in zip(sam, sam):
            if reads[0].query_name != reads[1].query_name:
                raise AtroposError(
                    "Consecutive reads {}, {} in paired-end SAM/BAM file do "
                    "not have the same name; make sure your file is "
                    "name-sorted and does not contain any "
                    "secondary/supplementary alignments.",
                    reads[0].query_name,
                    reads[1].query_name,
                )
            if reads[0].is_read1:
                assert reads[1].is_read2
            else:
                assert reads[1].is_read1
                reads = (reads[1], reads[0])
            yield tuple(self._as_sequence(r) for r in reads)


# --------------------------------------------------------------------------
# Output formats / formatters
# --------------------------------------------------------------------------


class SequenceFileFormat:
    def format(self, read):
        raise NotImplementedError()


class FastaFormat(SequenceFileFormat):
    def __init__(self, line_length=None):
        self.text_wrapper = None
        if line_length:
            from textwrap import TextWrapper

            self.text_wrapper = TextWrapper(width=line_length)

    def format(self, read):
        return self.format_entry(read.name, read.sequence)

    def format_entry(self, name, sequence):
        if self.text_wrapper:
            sequence = self.text_wrapper.fill(sequence)
        return "".join((">", name, "\n", sequence, "\n"))


class ColorspaceFastaFormat(FastaFormat):
    def format(self, read):
        return self.format_entry(read.name, read.primer + read.sequence)


class FastqFormat(SequenceFileFormat):
    def format(self, read):
        return self.format_entry(read.name, read.sequence, read.qualities, read.name2)

    def format_entry(self, name, sequence, qualities, name2=""):
        return "".join(("@", name, "\n", sequence, "\n+", name2, "\n", qualities, "\n"))


class ColorspaceFastqFormat(FastqFormat):
    def format(self, read):
        return self.format_entry(read.name, read.primer + read.sequence, read.qualities)


class SingleEndFormatter:
    """Formats single-end reads into a result dict {path: [strings]}."""

    def __init__(self, seq_format, file1):
        self.seq_format = seq_format
        self.file1 = file1
        self.written = 0
        self.read1_bp = 0
        self.read2_bp = 0

    def format(self, result, read1, read2=None):
        result[self.file1].append(self.seq_format.format(read1))
        self.written += 1
        self.read1_bp += len(read1)

    @property
    def written_bp(self):
        return (self.read1_bp, self.read2_bp)


class InterleavedFormatter(SingleEndFormatter):
    def format(self, result, read1, read2=None):
        result[self.file1].extend(
            (self.seq_format.format(read1), self.seq_format.format(read2))
        )
        self.written += 1
        self.read1_bp += len(read1)
        self.read2_bp += len(read2)


class PairedEndFormatter(SingleEndFormatter):
    def __init__(self, seq_format, file1, file2):
        super().__init__(seq_format, file1)
        self.file2 = file2

    def format(self, result, read1, read2):
        result[self.file1].append(self.seq_format.format(read1))
        result[self.file2].append(self.seq_format.format(read2))
        self.written += 1
        self.read1_bp += len(read1)
        self.read2_bp += len(read2)


# --------------------------------------------------------------------------
# SRA streaming (reference ``atropos/io/seqio.py:165-199,924-956``)
# --------------------------------------------------------------------------


class SraSequenceReader(SequenceReader):
    """Wraps a streaming SRA reader: any iterable with a ``paired``
    property yielding lists of (name, sequence, qualities) tuples."""

    delivers_qualities = True
    file_format = "fastq"

    def __init__(self, reader, quality_base=None, sequence_class=Sequence,
                 alphabet=None):
        super().__init__(reader, quality_base=quality_base, alphabet=alphabet)
        self.input_read = PAIRED if reader.paired else SINGLE
        self.sequence_class = sequence_class

    def __iter__(self):
        if self.input_read == PAIRED:
            for read in self._file:
                yield tuple(self._as_sequence(frag) for frag in read[:2])
        else:
            for read in self._file:
                yield self._as_sequence(read[0])

    def _as_sequence(self, frag):
        return self.sequence_class(*frag, alphabet=self.alphabet)

    def close(self):
        self._file.finish()


class SraColorspaceSequenceReader(SraSequenceReader):
    colorspace = True

    def __init__(self, reader, quality_base=33, alphabet=None):
        super().__init__(
            reader, quality_base=quality_base,
            sequence_class=ColorspaceSequence, alphabet=alphabet,
        )


def sra_reader(reader, quality_base=None, colorspace=False, input_read=None,
               alphabet=None):
    """Wrap an existing SRA streaming reader, optionally restricting a
    paired stream to one mate."""
    if colorspace:
        wrapped = SraColorspaceSequenceReader(
            reader, quality_base=quality_base, alphabet=alphabet
        )
    else:
        wrapped = SraSequenceReader(
            reader, quality_base=quality_base, alphabet=alphabet
        )

    if not reader.paired or input_read == PAIRED:
        return wrapped
    if input_read == READ1:
        return paired_to_read1(wrapped)
    return paired_to_read2(wrapped)


# --------------------------------------------------------------------------
# Factories
# --------------------------------------------------------------------------


def paired_to_read1(reader):
    for read1, _ in reader:
        yield read1


def paired_to_read2(reader):
    for _, read2 in reader:
        yield read2


def open_reader(
    file1=None,
    file2=None,
    qualfile=None,
    quality_base=None,
    colorspace=False,
    file_format=None,
    interleaved=False,
    input_read=None,
    alphabet=None,
):
    """Reader factory with format autodetection (by extension, then by
    first content character)."""
    if interleaved and (file2 is not None or qualfile is not None):
        raise ValueError("When interleaved is set, file2 and qualfile must be None")
    if file2 is not None and qualfile is not None:
        raise ValueError("Setting both file2 and qualfile is not supported")

    if alphabet and isinstance(alphabet, str):
        if alphabet not in ALPHABETS:
            raise ValueError("Invalid alphabet {}".format(alphabet))
        alphabet = ALPHABETS[alphabet]

    if file2 is not None:
        return PairedSequenceReader(
            file1, file2, quality_base=quality_base, colorspace=colorspace,
            file_format=file_format, alphabet=alphabet,
        )

    if qualfile is not None:
        if colorspace:
            return ColorspaceFastaQualReader(
                file1, qualfile, quality_base=quality_base, alphabet=alphabet
            )
        return FastaQualReader(
            file1, qualfile, quality_base=quality_base, alphabet=alphabet
        )

    if file_format is None and file1 != STDOUT:
        file_format = guess_format_from_name(file1)

    if file_format is None:
        if file1 == STDOUT:
            file1 = sys.stdin
        for line in file1:
            if line.startswith("#"):
                continue
            if line.startswith(">"):
                file_format = "fasta"
            elif line.startswith("@"):
                file_format = "fastq"
            file1 = FileWithPrependedLine(file1, line)
            break

    if file_format is not None:
        file_format = file_format.lower()
        if file_format in ("sam", "bam"):
            if colorspace:
                raise ValueError(
                    "SAM/BAM format is not currently supported for colorspace reads"
                )
            if interleaved:
                return PairedEndSAMReader(
                    file1, quality_base=quality_base, alphabet=alphabet
                )
            elif input_read == READ1:
                return Read1SingleEndSAMReader(
                    file1, quality_base=quality_base, alphabet=alphabet
                )
            elif input_read == READ2:
                return Read2SingleEndSAMReader(
                    file1, quality_base=quality_base, alphabet=alphabet
                )
            return SingleEndSAMReader(
                file1, quality_base=quality_base, alphabet=alphabet
            )
        elif interleaved:
            reader = InterleavedSequenceReader(
                file1, quality_base=quality_base, colorspace=colorspace,
                file_format=file_format, alphabet=alphabet,
            )
            if input_read == READ1:
                return paired_to_read1(reader)
            elif input_read == READ2:
                return paired_to_read2(reader)
            return reader
        elif file_format == "fasta":
            fasta_handler = ColorspaceFastaReader if colorspace else FastaReader
            return fasta_handler(file1, alphabet=alphabet)
        elif file_format == "fastq":
            fastq_handler = ColorspaceFastqReader if colorspace else FastqReader
            return fastq_handler(file1, quality_base=quality_base, alphabet=alphabet)
        elif file_format == "sra-fastq" and colorspace:
            return SRAColorspaceFastqReader(
                file1, quality_base=quality_base, alphabet=alphabet
            )

    raise UnknownFileType(
        "File format {0!r} is unknown (expected 'sra-fastq' (only for "
        "colorspace), 'fasta', 'fastq', 'sam', or 'bam').".format(
            file_format or "<Undetected>"
        )
    )


def guess_format_from_name(path, raise_on_failure=False):
    """Detect format from a file name (handles compression extensions)."""
    name = None
    ext = None
    if isinstance(path, str):
        name = path
    elif hasattr(path, "name"):
        name = path.name

    if name:
        name, ext1, _ = splitext_compressed(name)
        ext = ext1.lower()
        if ext in [".fasta", ".fa", ".fna", ".csfasta", ".csfa"]:
            return "fasta"
        elif ext in [".fastq", ".fq"] or (ext == ".txt" and name.endswith("_sequence")):
            return "fastq"
        elif ext in (".sam", ".bam"):
            return ext[1:]

    if raise_on_failure:
        raise UnknownFileType(
            "Could not determine whether file {0!r} is FASTA or FASTQ: file "
            "name extension {1!r} not recognized".format(path, ext)
        )


def create_seq_formatter(file1, file2=None, interleaved=False, **kwargs):
    """Formatter factory (format derived from file extension)."""
    seq_format = get_format(file1, **kwargs)
    if file2 is not None:
        return PairedEndFormatter(seq_format, file1, file2)
    elif interleaved:
        return InterleavedFormatter(seq_format, file1)
    return SingleEndFormatter(seq_format, file1)


def get_format(path, file_format=None, colorspace=False, qualities=None, line_length=None):
    """SequenceFileFormat factory."""
    if file_format is None:
        file_format = guess_format_from_name(path, raise_on_failure=qualities is None)

    if file_format is None:
        if qualities is True:
            file_format = "fastq"
        elif qualities is False:
            file_format = "fasta"
        else:
            raise UnknownFileType("Could not determine file type.")

    file_format = file_format.lower()

    if file_format == "fastq" and qualities is False:
        raise ValueError(
            "Output format cannot be FASTQ since no quality values are available."
        )

    if file_format == "fasta":
        if colorspace:
            return ColorspaceFastaFormat(line_length)
        return FastaFormat(line_length)
    elif file_format == "fastq":
        if colorspace:
            return ColorspaceFastqFormat()
        return FastqFormat()
    raise UnknownFileType(
        "File format {0!r} is unknown (expected 'fasta' or 'fastq').".format(
            file_format
        )
    )

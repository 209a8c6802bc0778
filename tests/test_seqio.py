"""Sequence I/O unit tests (behaviors from the upstream
``tests/test_seqio.py``)."""
from collections import defaultdict
from io import StringIO
import os
import random
from textwrap import dedent

import pytest

from atropos_tpu.io import open_output, xopen
from atropos_tpu.io.seqio import (
    ColorspaceSequence,
    FastaFormat,
    FastaQualReader,
    FastaReader,
    FastqFormat,
    FastqReader,
    FormatError,
    InterleavedFormatter,
    InterleavedSequenceReader,
    Sequence,
    get_format,
    open_reader as openseq,
    sequence_names_match,
)
from atropos_tpu.util import ALPHABETS

from .conformance_utils import cutpath, datapath

simple_fastq = [
    Sequence("first_sequence", "SEQUENCE1", ":6;;8<=:<"),
    Sequence("second_sequence", "SEQUENCE2", "83<??:(61"),
]
simple_fasta = [Sequence(x.name, x.sequence, None) for x in simple_fastq]


def test_alphabet():
    alphabet = ALPHABETS["dna"]
    for base in ("A", "C", "G", "T", "N"):
        assert base in alphabet
    assert "X" not in alphabet
    assert alphabet.resolve("X") == "N"


class TestSequence:
    def test_too_many_qualities(self):
        with pytest.raises(FormatError):
            Sequence(name="name", sequence="ACGT", qualities="#####")

    def test_too_many_qualities_colorspace(self):
        with pytest.raises(FormatError):
            ColorspaceSequence(name="name", sequence="T0123", qualities="#####")

    def test_invalid_primer(self):
        with pytest.raises(FormatError):
            ColorspaceSequence(name="name", sequence="K0123", qualities="####")


class TestFastaReader:
    def test(self):
        with FastaReader(datapath("simple.fasta")) as reader:
            reads = list(reader)
        assert reads == simple_fasta
        fasta = StringIO(">first_sequence\nSEQUENCE1\n>second_sequence\nSEQUENCE2\n")
        assert list(FastaReader(fasta)) == simple_fasta

    def test_with_comments(self):
        fasta = StringIO(
            dedent(
                """
            # a comment
            # another one
            >first_sequence
            SEQUENCE1
            >second_sequence
            SEQUENCE2
            """
            )
        )
        assert list(FastaReader(fasta)) == simple_fasta

    def test_wrong_format(self):
        with pytest.raises(FormatError):
            fasta = StringIO("# a comment\nunexpected\n>first_sequence\nSEQUENCE1\n")
            list(FastaReader(fasta))

    def test_fastareader_keeplinebreaks(self):
        with FastaReader(datapath("simple.fasta"), keep_linebreaks=True) as reader:
            reads = list(reader)
        assert reads[0] == simple_fasta[0]
        assert reads[1].sequence == "SEQUEN\nCE2"

    def test_context_manager(self):
        filename = datapath("simple.fasta")
        with open(filename) as infile:
            assert not infile.closed
            list(openseq(infile))
            assert not infile.closed
        assert infile.closed
        with FastaReader(filename) as reader:
            tmp_sr = reader
            assert not reader._file.closed
            list(reader)
            assert not reader._file.closed
        assert tmp_sr._file is None
        with FastaReader(filename):
            pass


class TestFastqReader:
    def test_fastqreader(self):
        with FastqReader(datapath("simple.fastq")) as reader:
            reads = list(reader)
        assert reads == simple_fastq

    def test_fastqreader_dos(self):
        with FastqReader(datapath("dos.fastq")) as reader:
            dos_reads = list(reader)
        with FastqReader(datapath("small.fastq")) as reader:
            unix_reads = list(reader)
        assert dos_reads == unix_reads

    def test_fastq_wrongformat(self):
        with pytest.raises(FormatError), FastqReader(datapath("withplus.fastq")) as fq:
            list(fq)

    def test_fastq_incomplete(self):
        fastq = StringIO("@name\nACGT+\n")
        with pytest.raises(FormatError), FastqReader(fastq) as fq:
            list(fq)

    def test_alphabet(self):
        with FastqReader(datapath("bad_bases.fq"), alphabet=ALPHABETS["dna"]) as fq:
            reads = list(fq)
            assert reads[0].sequence == "ACGNGGACT"
            assert reads[1].sequence == "CGGACNNNC"


class TestFastaQualReader:
    def test_mismatching_read_names(self):
        with pytest.raises(FormatError):
            fasta = StringIO(">name\nACG")
            qual = StringIO(">nome\n3 5 7")
            list(FastaQualReader(fasta, qual))

    def test_invalid_quality_value(self):
        with pytest.raises(FormatError):
            fasta = StringIO(">name\nACG")
            qual = StringIO(">name\n3 xx 7")
            list(FastaQualReader(fasta, qual))


class TestSeqioOpen:
    def test_sequence_reader(self):
        with openseq(datapath("simple.fastq")) as reader:
            assert list(reader) == simple_fastq
        with openseq(datapath("simple.fasta")) as reader:
            assert list(reader) == simple_fasta
        with open(datapath("simple.fastq")) as infile:
            assert list(openseq(infile)) == simple_fastq
        # no name attribute: format detected from content
        handle = StringIO(open(datapath("simple.fastq")).read())
        assert list(openseq(handle)) == simple_fastq
        handle = StringIO(open(datapath("simple.fasta")).read())
        assert list(openseq(handle)) == simple_fasta

    def test_autodetect_fasta_format(self, tmp_path):
        path = str(tmp_path / "tmp.fasta")
        fmt = get_format(path)
        assert isinstance(fmt, FastaFormat)
        with open_output(path, "w") as out:
            for seq in simple_fasta:
                out.write(fmt.format(seq))
        assert list(openseq(path)) == simple_fasta

    def test_write_qualities_to_fasta(self, tmp_path):
        path = str(tmp_path / "tmp.fasta")
        fmt = get_format(path, qualities=True)
        assert isinstance(fmt, FastaFormat)
        with open_output(path, "w") as out:
            for seq in simple_fastq:
                out.write(fmt.format(seq))
        assert list(openseq(path)) == simple_fasta

    def test_autodetect_fastq_format(self, tmp_path):
        path = str(tmp_path / "tmp.fastq")
        fmt = get_format(path)
        with open_output(path, "w") as out:
            for seq in simple_fastq:
                out.write(fmt.format(seq))
        assert list(openseq(path)) == simple_fastq

    def test_fastq_qualities_missing(self, tmp_path):
        with pytest.raises(ValueError):
            get_format(str(tmp_path / "tmp.fastq"), qualities=False)


class TestInterleavedReader:
    def test(self):
        expected = [
            (
                Sequence("read1/1 some text", "TTATTTGTCTCCAGC", "##HHHHHHHHHHHHH"),
                Sequence("read1/2 other text", "GCTGGAGACAAATAA", "HHHHHHHHHHHHHHH"),
            ),
            (
                Sequence("read3/1", "CCAACTTGATATTAATAACA", "HHHHHHHHHHHHHHHHHHHH"),
                Sequence("read3/2", "TGTTATTAATATCAAGTTGG", "#HHHHHHHHHHHHHHHHHHH"),
            ),
        ]
        with InterleavedSequenceReader(cutpath("interleaved.fastq")) as reader:
            reads = list(reader)
        assert reads == expected
        with openseq(cutpath("interleaved.fastq"), interleaved=True) as reader:
            reads = list(reader)
        assert reads == expected

    def test_missing_partner(self):
        with pytest.raises(FormatError):
            stream = StringIO("@r1\nACG\n+\nHHH")
            with InterleavedSequenceReader(stream) as reader:
                list(reader)

    def test_incorrectly_paired(self):
        with pytest.raises(FormatError):
            stream = StringIO("@r1/1\nACG\n+\nHHH\n@wrong_name\nTTT\n+\nHHH")
            with InterleavedSequenceReader(stream) as reader:
                list(reader)


class TestFastaWriter:
    def test(self, tmp_path):
        fmt = FastaFormat()
        path = str(tmp_path / "tmp.fasta")
        with open_output(path, "w") as out:
            out.write(fmt.format_entry("name", "CCATA"))
            out.write(fmt.format_entry("name2", "HELLO"))
        with open(path) as infile:
            assert infile.read() == ">name\nCCATA\n>name2\nHELLO\n"

    def test_linelength(self, tmp_path):
        fmt = FastaFormat(line_length=3)
        path = str(tmp_path / "tmp.fasta")
        with open_output(path, "w") as out:
            out.write(fmt.format_entry("r1", "ACG"))
            out.write(fmt.format_entry("r2", "CCAT"))
            out.write(fmt.format_entry("r3", "TACCAG"))
        with open(path) as infile:
            assert infile.read() == ">r1\nACG\n>r2\nCCA\nT\n>r3\nTAC\nCAG\n"

    def test_write_sequence_object(self, tmp_path):
        fmt = FastaFormat()
        path = str(tmp_path / "tmp.fasta")
        with open_output(path, "w") as out:
            out.write(fmt.format(Sequence("name", "CCATA")))
            out.write(fmt.format(Sequence("name2", "HELLO")))
        with open(path) as infile:
            assert infile.read() == ">name\nCCATA\n>name2\nHELLO\n"

    def test_write_zero_length_sequence(self):
        assert FastaFormat().format_entry("name", "") == ">name\n\n"


class TestFastqWriter:
    def test(self, tmp_path):
        fmt = FastqFormat()
        path = str(tmp_path / "tmp.fastq")
        with open_output(path, "w") as out:
            out.write(fmt.format_entry("name", "CCATA", "!#!#!"))
            out.write(fmt.format_entry("name2", "HELLO", "&&&!&&"))
        with open(path) as infile:
            assert (
                infile.read()
                == "@name\nCCATA\n+\n!#!#!\n@name2\nHELLO\n+\n&&&!&&\n"
            )

    def test_twoheaders(self, tmp_path):
        fmt = FastqFormat()
        path = str(tmp_path / "tmp.fastq")
        with open_output(path, "w") as out:
            out.write(fmt.format(Sequence("name", "CCATA", "!#!#!", name2="name")))
            out.write(fmt.format(Sequence("name2", "HELLO", "&&&!&", name2="name2")))
        with open(path) as infile:
            assert (
                infile.read()
                == "@name\nCCATA\n+name\n!#!#!\n@name2\nHELLO\n+name2\n&&&!&\n"
            )


class TestInterleavedWriter:
    def test(self):
        reads = [
            (
                Sequence("A/1 comment", "TTA", "##H"),
                Sequence("A/2 comment", "GCT", "HH#"),
            ),
            (Sequence("B/1", "CC", "HH"), Sequence("B/2", "TG", "#H")),
        ]
        fmt = InterleavedFormatter(FastqFormat(), "foo")
        result = defaultdict(lambda: [])
        for read1, read2 in reads:
            fmt.format(result, read1, read2)
        assert fmt.written == 2
        assert fmt.read1_bp == 5
        assert fmt.read2_bp == 5
        assert "foo" in result
        assert "".join(result["foo"]) == (
            "@A/1 comment\nTTA\n+\n##H\n@A/2 comment\nGCT\n+\nHH#\n"
            "@B/1\nCC\n+\nHH\n@B/2\nTG\n+\n#H\n"
        )


def test_sequence_names_match():
    def match(name1, name2):
        seq1 = Sequence(name1, "ACGT")
        seq2 = Sequence(name2, "AACC")
        return sequence_names_match(seq1, seq2)

    assert match("abc", "abc")
    assert match("abc/1", "abc/2")
    assert match("abc.1", "abc.2")
    assert match("abc1", "abc2")
    assert not match("abc", "xyz")


def _create_truncated_file(path):
    text = "".join(random.choice("ABCDEFGHIJKLMNOPQRSTUVWXYZ") for _ in range(200))
    with xopen(path, "w") as out:
        out.write(text)
    with open(path, "a") as out:
        out.truncate(os.stat(path).st_size - 10)


def test_truncated_gz(tmp_path):
    path = str(tmp_path / "truncated.gz")
    _create_truncated_file(path)
    with pytest.raises(EOFError):
        handle = xopen(path, "r")
        try:
            handle.read()
        finally:
            handle.close()


def test_truncated_gz_iter(tmp_path):
    path = str(tmp_path / "truncated.gz")
    _create_truncated_file(path)
    with pytest.raises(EOFError):
        handle = xopen(path, "r", use_system=False)
        try:
            for _ in handle:
                pass
        finally:
            handle.close()


class _FakeSraStream:
    """Minimal stand-in for a srastream.SraReader: iterable over lists of
    (name, sequence, qualities) tuples with a ``paired`` property."""

    def __init__(self, reads, paired):
        self.reads = reads
        self.paired = paired
        self.finished = False

    def __iter__(self):
        return iter(self.reads)

    def finish(self):
        self.finished = True


def test_sra_reader_single():
    from atropos_tpu.io.seqio import sra_reader

    stream = _FakeSraStream(
        [[("r1", "ACGT", "IIII")], [("r2", "GGCC", "!!!!")]], paired=False
    )
    reader = sra_reader(stream)
    reads = list(reader)
    assert [r.name for r in reads] == ["r1", "r2"]
    assert reads[0].sequence == "ACGT"
    assert reads[1].qualities == "!!!!"
    reader.close()
    assert stream.finished


def test_sra_reader_paired():
    from atropos_tpu.io.seqio import PAIRED, sra_reader

    stream = _FakeSraStream(
        [[("r1", "ACGT", "IIII"), ("r1", "TTAA", "JJJJ")]], paired=True
    )
    reader = sra_reader(stream, input_read=PAIRED)
    pairs = list(reader)
    assert len(pairs) == 1
    read1, read2 = pairs[0]
    assert read1.sequence == "ACGT" and read2.sequence == "TTAA"


def test_sra_reader_read2_only():
    from atropos_tpu.io.seqio import READ2, sra_reader

    stream = _FakeSraStream(
        [[("r1", "ACGT", "IIII"), ("r1", "TTAA", "JJJJ")]], paired=True
    )
    reads = list(sra_reader(stream, input_read=READ2))
    assert [r.sequence for r in reads] == ["TTAA"]


def _write_sam(path, fastq_path, flags=None):
    with open(fastq_path) as fh:
        lines = [line.rstrip("\n") for line in fh]
    with open(path, "w") as out:
        out.write("@HD\tVN:1.6\tSO:queryname\n")
        for rec, i in enumerate(range(0, len(lines), 4)):
            name = lines[i][1:].split()[0]
            flag = flags[rec] if flags else 4
            out.write("\t".join([
                name, str(flag), "*", "0", "0", "*", "*", "0", "0",
                lines[i + 1], lines[i + 3],
            ]) + "\n")


def test_text_sam_reader_single(tmp_path):
    """SAM input parses without pysam via the text fallback."""
    from .conformance_utils import datapath
    from atropos_tpu.io.seqio import open_reader

    sam = str(tmp_path / "in.sam")
    _write_sam(sam, datapath("small.fastq"))
    reader = open_reader(sam, file_format="sam")
    reads = list(reader)
    assert len(reads) == 3
    assert reads[0].name.startswith("prefix:1_13_573")
    assert reads[0].qualities is not None


def test_text_sam_reader_paired(tmp_path):
    from .conformance_utils import datapath
    from atropos_tpu.io.seqio import open_reader

    with open(datapath("paired.1.fastq")) as fh:
        n_reads = sum(1 for _ in fh) // 4
    sam = str(tmp_path / "pe.sam")
    with open(datapath("paired.1.fastq")) as fh1, open(
        datapath("paired.2.fastq")
    ) as fh2:
        lines1 = [line.rstrip("\n") for line in fh1]
        lines2 = [line.rstrip("\n") for line in fh2]
    with open(sam, "w") as out:
        out.write("@HD\tVN:1.6\tSO:queryname\n")
        for i in range(0, len(lines1), 4):
            name = lines1[i][1:].split()[0].rstrip("/12")
            out.write("\t".join([name, str(0x1 | 0x40), "*", "0", "0",
                                 "*", "*", "0", "0", lines1[i+1], lines1[i+3]]) + "\n")
            out.write("\t".join([name, str(0x1 | 0x80), "*", "0", "0",
                                 "*", "*", "0", "0", lines2[i+1], lines2[i+3]]) + "\n")
    reader = open_reader(sam, file_format="sam", interleaved=True)
    pairs = list(reader)
    assert len(pairs) == n_reads
    read1, read2 = pairs[0]
    assert read1.sequence == lines1[1]
    assert read2.sequence == lines2[1]


def test_bam_requires_pysam(tmp_path):
    """BAM input without pysam fails with the actionable ImportError, not
    a parse error (the text-SAM fallback serves SAM only; ref
    seqio.py:751 documents pysam as the BAM surface)."""
    import gzip

    bam = str(tmp_path / "tiny.bam")
    # minimal BGZF/BAM magic: a gzip stream whose payload starts 'BAM\1'
    with gzip.open(bam, "wb") as out:
        out.write(b"BAM\x01" + b"\x00" * 16)
    reader = openseq(bam, file_format="sam")
    with pytest.raises(ImportError, match="pysam"):
        next(iter(reader))

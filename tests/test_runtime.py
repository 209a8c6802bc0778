"""Tests for the native C++ FASTQ runtime."""
import numpy as np
import pytest

from atropos_tpu import runtime

from .conformance_utils import datapath

pytestmark = pytest.mark.skipif(
    not runtime.available(), reason="native runtime unavailable"
)


SAMPLE = (
    b"@read1 extra\nACGTACGT\n+\n!!!!!!!!\n"
    b"@read2\nTTTT\n+read2\nHHHH\n"
)


def test_parse_basic():
    chunk = runtime.parse_chunk(SAMPLE)
    assert chunk.n == 2
    assert chunk.consumed == len(SAMPLE)
    buf = chunk.buf.tobytes()
    name0 = buf[chunk.name_off[0] : chunk.name_off[0] + chunk.name_len[0]]
    assert name0 == b"read1 extra"
    seq1 = buf[chunk.seq_off[1] : chunk.seq_off[1] + chunk.seq_len[1]]
    assert seq1 == b"TTTT"
    plus1 = buf[chunk.plus_off[1] : chunk.plus_off[1] + chunk.plus_len[1]]
    assert plus1 == b"read2"


def test_parse_crlf():
    data = SAMPLE.replace(b"\n", b"\r\n")
    chunk = runtime.parse_chunk(data)
    assert chunk.n == 2
    buf = chunk.buf.tobytes()
    seq0 = buf[chunk.seq_off[0] : chunk.seq_off[0] + chunk.seq_len[0]]
    assert seq0 == b"ACGTACGT"


def test_parse_partial_record():
    data = SAMPLE + b"@read3\nACGT\n+\n"  # truncated: quality line missing
    chunk = runtime.parse_chunk(data)
    assert chunk.n == 2
    assert chunk.consumed == len(SAMPLE)


def test_parse_errors():
    with pytest.raises(runtime.FastqParseError):
        runtime.parse_chunk(b"not a fastq\n")
    with pytest.raises(runtime.FastqParseError):
        runtime.parse_chunk(b"@r\nACGT\nX\n!!!!\n")
    with pytest.raises(runtime.FastqParseError):
        runtime.parse_chunk(b"@r\nACGT\n+\n!!!\n@x\nA\n+\n!\n")


def test_parse_matches_python_reader():
    """Native parser must agree with the Python FastqReader on real data."""
    from atropos_tpu.io.seqio import FastqReader

    path = datapath("small.fastq")
    with open(path, "rb") as fh:
        data = fh.read()
    chunk = runtime.parse_chunk(data)
    with FastqReader(path) as reader:
        records = list(reader)
    assert chunk.n == len(records)
    buf = chunk.buf.tobytes()
    for i, rec in enumerate(records):
        assert (
            buf[chunk.name_off[i] : chunk.name_off[i] + chunk.name_len[i]].decode()
            == rec.name
        )
        assert (
            buf[chunk.seq_off[i] : chunk.seq_off[i] + chunk.seq_len[i]].decode()
            == rec.sequence
        )
        assert (
            buf[chunk.qual_off[i] : chunk.qual_off[i] + chunk.qual_len[i]].decode()
            == rec.qualities
        )


def test_padded_matrices():
    chunk = runtime.parse_chunk(SAMPLE)
    seqs = chunk.padded_sequences()
    assert seqs.shape == (2, 8)
    assert seqs[0].tobytes() == b"ACGTACGT"
    assert seqs[1].tobytes() == b"TTTT\x00\x00\x00\x00"


def test_format_roundtrip():
    chunk = runtime.parse_chunk(SAMPLE)
    out = chunk.format_trimmed(
        np.zeros(2, np.int32), chunk.seq_len.astype(np.int32)
    )
    assert out == SAMPLE


def test_format_trimmed_and_filtered():
    chunk = runtime.parse_chunk(SAMPLE)
    out = chunk.format_trimmed(
        np.array([2, 0], np.int32),
        np.array([6, 2], np.int32),
        keep=np.array([1, 0], np.uint8),
    )
    assert out == b"@read1 extra\nGTAC\n+\n!!!!\n"

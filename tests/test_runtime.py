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


def test_native_quality_trim_windows_matches_scalar():
    """The native host qualtrim kernel must match the scalar spec
    (commands/trim/qualtrim.py) exactly, including NextSeq G-masking,
    5'+3' cutoffs, zero cutoffs, and degenerate windows."""
    import random

    import numpy as np

    from atropos_tpu.runtime import _i32, _i64, _lib, _u8
    from atropos_tpu.commands.trim.qualtrim import quality_trim_index

    rng = random.Random(17)
    records = []
    for i in range(500):
        length = rng.randrange(0, 120)
        seq = "".join(rng.choice("ACGTN") for _ in range(length))
        if rng.random() < 0.3:  # G-rich tails exercise the NextSeq mask
            seq = seq[: length // 2] + "G" * (length - length // 2)
        qual = "".join(chr(33 + rng.randint(0, 41)) for _ in range(length))
        records.append((seq, qual))
    buf = b"".join(
        ("@r%d\n%s\n+\n%s\n" % (i, seq, qual)).encode()
        for i, (seq, qual) in enumerate(records)
    )
    from atropos_tpu.runtime import parse_chunk

    chunk = parse_chunk(buf)
    assert chunk.n == len(records)

    def scalar_nextseq(seq, qual, cutoff, base):
        acc = best = 0
        maxi = len(qual)
        for j in range(len(qual) - 1, -1, -1):
            qv = ord(qual[j]) - base
            if seq[j] == "G":
                qv = cutoff - 1
            acc += cutoff - qv
            if acc < 0:
                break
            if acc > best:
                best = acc
                maxi = j
        return maxi

    for nextseq_cut, has_q, cf, cb in (
        (-1, 1, 10, 20), (-1, 1, 0, 0), (22, 0, 0, 0), (22, 1, 15, 20),
        (-1, 1, 40, 40),
    ):
        n = chunk.n
        wl = np.ascontiguousarray(chunk.seq_len, np.int32)
        g_stop = np.empty(n, np.int32)
        q_start = np.empty(n, np.int32)
        q_stop = np.empty(n, np.int32)
        _lib.quality_trim_windows(
            _u8(chunk.buf),
            _i64(np.ascontiguousarray(chunk.seq_off)),
            _i64(np.ascontiguousarray(chunk.qual_off)),
            _i32(wl), n, 33, nextseq_cut, has_q, cf, cb,
            _i32(g_stop), _i32(q_start), _i32(q_stop),
        )
        for i, (seq, qual) in enumerate(records):
            if len(qual) == 0:
                assert (g_stop[i], q_start[i], q_stop[i]) == (0, 0, 0)
                continue
            if nextseq_cut >= 0:
                want_g = scalar_nextseq(seq, qual, nextseq_cut, 33)
                assert g_stop[i] == want_g, (i, "nextseq")
                seq, qual = seq[:want_g], qual[:want_g]
            else:
                assert g_stop[i] == len(qual)
            if has_q:
                want = quality_trim_index(qual, cf, cb, base=33)
                assert (q_start[i], q_stop[i]) == want, (i, seq, qual)
            else:
                assert (q_start[i], q_stop[i]) == (0, len(qual))

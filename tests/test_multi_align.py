"""Differential parity: BatchMultiAligner vs the scalar MultiAligner.

The batched no-indel top-K kernel (used by the paired-end insert matcher)
must produce the exact candidate sequence — same tuples, same order, same
exact-match collapse — as the scalar oracle for every read in a batch.
"""
import random

import numpy as np
import pytest

from atropos_tpu.align import oracle
from atropos_tpu.align.batched import BatchMultiAligner
from atropos_tpu.align.flags import (
    SEMIGLOBAL,
    START_WITHIN_SEQ1,
    START_WITHIN_SEQ2,
    STOP_WITHIN_SEQ1,
    STOP_WITHIN_SEQ2,
)
from atropos_tpu.util import reverse_complement

INSERT_FLAGS = START_WITHIN_SEQ1 | STOP_WITHIN_SEQ2

FLAG_CASES = [
    ("insert", INSERT_FLAGS),
    ("semiglobal", SEMIGLOBAL),
    ("start2_stop1", START_WITHIN_SEQ2 | STOP_WITHIN_SEQ1),
    ("stop2_only", STOP_WITHIN_SEQ2),
]


def _encode(strings, width):
    arr = np.zeros((len(strings), width), dtype=np.uint8)
    for i, s in enumerate(strings):
        b = s.encode("ascii")
        arr[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    return arr


def _run_batch(refs, queries, flags, rate, min_overlap, max_matches=100):
    m = len(refs[0])
    width = max(len(q) for q in queries)
    aligner = BatchMultiAligner(
        rate, flags=flags, min_overlap=min_overlap, max_matches=max_matches
    )
    out = aligner.locate_same_shape(
        _encode(refs, m),
        _encode(queries, width),
        m,
        np.array([len(q) for q in queries], np.int32),
    )
    out_np = {k: np.asarray(v) for k, v in out.items()}
    return [BatchMultiAligner.extract(out_np, b) for b in range(len(queries))]


def _oracle_batch(refs, queries, flags, rate, min_overlap, max_matches=100):
    aligner = oracle.MultiAligner(rate, flags=flags, min_overlap=min_overlap)
    return [
        aligner.locate(ref, q, max_matches=max_matches)
        for ref, q in zip(refs, queries)
    ]


def _random_pair(rng, m, overlap_prob=0.7):
    """An insert-matcher-style pair: same-length sequences that overlap
    (read-through) with some mutations, or are unrelated."""
    bases = "ACGT"
    ref = "".join(rng.choice(bases) for _ in range(m))
    if rng.random() < overlap_prob:
        shift = rng.randint(0, m - 1)
        q = list(ref[shift:] + "".join(rng.choice(bases) for _ in range(shift)))
        for _ in range(rng.randint(0, max(1, m // 10))):
            q[rng.randrange(m)] = rng.choice(bases)
        query = "".join(q)
    else:
        query = "".join(rng.choice(bases) for _ in range(m))
    return ref, query


@pytest.mark.parametrize("name,flags", FLAG_CASES)
@pytest.mark.parametrize("rate", [0.1, 0.2])
def test_multi_parity_same_length(name, flags, rate):
    rng = random.Random(hash((name, rate)) & 0xFFFFFFFF)
    m = 24
    pairs = [_random_pair(rng, m) for _ in range(64)]
    refs = [p[0] for p in pairs]
    queries = [p[1] for p in pairs]
    got = _run_batch(refs, queries, flags, rate, min_overlap=1)
    want = _oracle_batch(refs, queries, flags, rate, min_overlap=1)
    for b, (g, w) in enumerate(zip(got, want)):
        assert g == w, "read {} ({}): {} != {}".format(b, name, g, w)


@pytest.mark.parametrize("min_overlap", [1, 5, 12])
def test_multi_parity_insert_minoverlap(min_overlap):
    rng = random.Random(min_overlap * 977)
    m = 30
    pairs = [_random_pair(rng, m) for _ in range(48)]
    refs = [p[0] for p in pairs]
    queries = [p[1] for p in pairs]
    got = _run_batch(refs, queries, INSERT_FLAGS, 0.2, min_overlap)
    want = _oracle_batch(refs, queries, INSERT_FLAGS, 0.2, min_overlap)
    assert got == want


def test_multi_parity_ragged_query_lengths():
    """Queries shorter than the padded width must behave as if unpadded."""
    rng = random.Random(4242)
    m = 20
    refs, queries = [], []
    for _ in range(40):
        ref, q = _random_pair(rng, m)
        refs.append(ref)
        queries.append(q[: rng.randint(5, m)])
    got = _run_batch(refs, queries, SEMIGLOBAL, 0.15, 1)
    want = _oracle_batch(refs, queries, SEMIGLOBAL, 0.15, 1)
    assert got == want


def test_multi_exact_match_collapse():
    """An exact full overlap yields exactly one candidate (early break)."""
    ref = "ACGTACGTACGTACGTACGT"
    got = _run_batch([ref], [ref], INSERT_FLAGS, 0.2, 1)
    want = _oracle_batch([ref], [ref], INSERT_FLAGS, 0.2, 1)
    assert got == want
    assert len(got[0]) == 1


def test_multi_max_matches_cap():
    """Low-complexity sequences overflow max_matches; the cap and the
    early break must match the oracle."""
    ref = "ATATATATATATATATATAT"
    query = "ATATATATATATATATATAT"
    for cap in (1, 2, 5):
        got = _run_batch([ref], [query], INSERT_FLAGS, 0.3, 1, max_matches=cap)
        want = _oracle_batch([ref], [query], INSERT_FLAGS, 0.3, 1, max_matches=cap)
        assert got == want


def test_multi_no_match():
    got = _run_batch(["AAAAAAAAAA"], ["CCCCCCCCCC"], INSERT_FLAGS, 0.1, 3)
    want = _oracle_batch(["AAAAAAAAAA"], ["CCCCCCCCCC"], INSERT_FLAGS, 0.1, 3)
    assert got == want == [None]


def _run_insert_matcher(refs, queries, rate, min_overlap, max_matches=100):
    """Drive the variable-length BatchInsertMatcher (refs/queries already
    truncated pair-wise to equal length, as InsertAligner does)."""
    from atropos_tpu.align.batched import BatchInsertMatcher

    lengths = np.array([len(r) for r in refs], np.int32)
    width = max(8, int(lengths.max()) if len(refs) else 8)
    matcher = BatchInsertMatcher(rate, min_overlap, max_matches)
    return matcher.candidates(
        _encode(refs, width), _encode(queries, width), lengths
    )


@pytest.mark.parametrize("rate", [0.0, 0.1, 0.2, 0.34])
@pytest.mark.parametrize("min_overlap", [1, 5])
def test_insert_matcher_variable_lengths(rate, min_overlap):
    """The diagonal closed-form matcher must reproduce the scalar
    MultiAligner candidate stream for MIXED pair lengths in one batch
    (the same-length-group kernel cannot do this at all)."""
    rng = random.Random(hash((rate, min_overlap)) & 0xFFFFFFFF)
    refs, queries = [], []
    for _ in range(80):
        m = rng.randint(max(1, min_overlap), 48)
        ref, q = _random_pair(rng, m)
        refs.append(ref)
        queries.append(q)
    # low-complexity + exact + empty-ish edge cases
    refs += ["ATATATATATATATAT", "ACGTACGTACGT", "A"]
    queries += ["ATATATATATATATAT", "ACGTACGTACGT", "A"]
    got = _run_insert_matcher(refs, queries, rate, min_overlap)
    want = _oracle_batch(refs, queries, INSERT_FLAGS, rate, min_overlap)
    for b, (g, w) in enumerate(zip(got, want)):
        assert g == w, "pair {} ({!r}/{!r}): {} != {}".format(
            b, refs[b], queries[b], g, w
        )


def test_insert_matcher_cap_and_exact():
    ref = "ATATATATATATATATATAT"
    for cap in (1, 2, 5, 100):
        got = _run_insert_matcher([ref], [ref], 0.3, 1, max_matches=cap)
        want = _oracle_batch([ref], [ref], INSERT_FLAGS, 0.3, 1, cap)
        assert got == want, cap


def test_multi_matches_insert_aligner_usage():
    """End-to-end shape used by InsertAligner: ref = rc(read2), query =
    read1, truncated to equal length."""
    rng = random.Random(777)
    bases = "ACGT"
    refs, queries = [], []
    for _ in range(32):
        insert_len = rng.randint(10, 35)
        insert = "".join(rng.choice(bases) for _ in range(insert_len))
        read_len = 30
        a1 = "AGATCGGAAGAGC"
        a2 = "AGATCGGAAGAGC"
        r1 = (insert + a1 + "A" * read_len)[:read_len]
        r2 = (reverse_complement(insert) + a2 + "A" * read_len)[:read_len]
        refs.append(reverse_complement(r2))
        queries.append(r1)
    got = _run_batch(refs, queries, INSERT_FLAGS, 0.2, 1)
    want = _oracle_batch(refs, queries, INSERT_FLAGS, 0.2, 1)
    assert got == want

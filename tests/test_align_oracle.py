"""Tests for the scalar alignment oracle.

Vectors reproduce the behavioral contract established by the reference's
test suite (``/root/reference/tests/test_align.py``) — these values are the
conformance spec for any aligner implementation in this framework.
"""
import math

import pytest

from atropos_tpu.align import (
    Aligner,
    InsertAligner,
    MultiAligner,
    compare_prefixes,
    compare_suffixes,
    locate,
)
from atropos_tpu.align.flags import (
    START_WITHIN_SEQ2,
    STOP_WITHIN_SEQ1,
    STOP_WITHIN_SEQ2,
)
from atropos_tpu.util import RandomMatchProbability

# 'back' (-a) adapter flag combination
BACK = START_WITHIN_SEQ2 | STOP_WITHIN_SEQ2 | STOP_WITHIN_SEQ1

WILDCARD_SEQUENCES = [
    "CCCATTGATC",
    "CCCRTTRATC",
    "YCCATYGATC",
    "CSSATTSATC",
    "CCCWWWGATC",
    "CCCATKKATC",
    "CCMATTGMTC",
    "BCCATTBABC",
    "BCCATTBABC",
    "CCCDTTDADC",
    "CHCATHGATC",
    "CVCVTTVATC",
    "CCNATNGATC",
    "CCCNTTNATC",
]


def test_basic_smoke():
    Aligner("CTCCAGCTTAGACATATC", 0.1, flags=BACK).locate("CC")
    Aligner("GCTTAGACATATC", 1.0, flags=BACK).locate("CAA")


def test_polya():
    s = "A" * 17
    t = "ACAG" + "A" * 42
    result = locate(s, t, 0.0, BACK)
    assert result == (0, len(s), 4, 4 + len(s), len(s), 0)


def test_compare_prefixes():
    assert compare_prefixes("AAXAA", "AAAAATTTTTTTTT") == (0, 5, 0, 5, 4, 1)
    assert compare_prefixes("AANAA", "AACAATTTTTTTTT", wildcard_ref=True) == (
        0, 5, 0, 5, 5, 0,
    )
    assert compare_prefixes("XAAAAA", "AAAAATTTTTTTTT") == (0, 6, 0, 6, 4, 2)
    a = WILDCARD_SEQUENCES[0]
    for s in WILDCARD_SEQUENCES:
        r = s + "GCCAGGGTTGATTCGGCTGATCTGGCCG"
        assert compare_prefixes(a, r, wildcard_query=True) == (0, 10, 0, 10, 10, 0)
        assert compare_prefixes(r, a, wildcard_ref=True) == (0, 10, 0, 10, 10, 0)
    r = WILDCARD_SEQUENCES[0] + "GCCAGG"
    for wc_ref in (False, True):
        for wc_query in (False, True):
            assert compare_prefixes(
                "CCCXTTXATC", r, wildcard_ref=wc_ref, wildcard_query=wc_query
            ) == (0, 10, 0, 10, 8, 2)


def test_compare_suffixes():
    assert compare_suffixes("AAXAA", "TTTTTTTAAAAA") == (0, 5, 7, 12, 4, 1)
    assert compare_suffixes("AANAA", "TTTTTTTAACAA", wildcard_ref=True) == (
        0, 5, 7, 12, 5, 0,
    )
    assert compare_suffixes("AAAAAX", "TTTTTTTAAAAA") == (0, 6, 6, 12, 4, 2)


def test_wildcards_in_adapter():
    r = "CATCTGTCC" + WILDCARD_SEQUENCES[0] + "GCCAGGGTTGATTCGGCTGATCTGGCCG"
    for a in WILDCARD_SEQUENCES:
        assert locate(a, r, 0.0, BACK, wildcard_ref=True) == (0, 10, 9, 19, 10, 0)
    assert locate("CCCXTTXATC", r, 0.0, BACK, wildcard_ref=True) is None


def test_wildcards_in_read():
    a = WILDCARD_SEQUENCES[0]
    for s in WILDCARD_SEQUENCES:
        r = "CATCTGTCC" + s + "GCCAGGGTTGATTCGGCTGATCTGGCCG"
        result = locate(a, r, 0.0, BACK, wildcard_query=True)
        if "X" in s:
            assert result is None
        else:
            assert result == (0, 10, 9, 19, 10, 0)


def test_wildcards_in_both():
    for a in WILDCARD_SEQUENCES:
        for s in WILDCARD_SEQUENCES:
            if "X" in s or "X" in a:
                continue
            r = "CATCTGTCC" + s + "GCCAGGGTTGATTCGGCTGATCTGGCCG"
            assert locate(
                a, r, 0.0, BACK, wildcard_ref=True, wildcard_query=True
            ) == (0, 10, 9, 19, 10, 0)


def test_no_match():
    assert locate("CTGATCTGGCCG", "AAAAGGG", 0.1, BACK) is None


def test_factorial():
    f = RandomMatchProbability()
    assert f.factorial(0) == 1
    assert f.factorial(1) == 1
    assert f.factorial(3) == 6
    assert int(f.factorial(27)) == int(math.factorial(27))
    assert int(f.factorial(150)) == int(math.factorial(150))


def test_match_probability():
    a = InsertAligner("TTAGACATAT", "CAGTGGAGTA")
    i3 = (120 / (6 * 2)) * (0.25 ** 3) * (0.75 ** 2)
    i4 = (120 / 24) * (0.25 ** 4) * 0.75
    i5 = 0.25 ** 5
    assert a.match_probability(3, 5) == pytest.approx(i3 + i4 + i5, abs=0.0001)


def test_insert_align():
    a1_seq = "TTAGACATATGG"
    a2_seq = "CAGTGGAGTATA"
    aligner = InsertAligner(a1_seq, a2_seq)
    r1 = "AGTCGAGCCCATTGCAGACT" + a1_seq[0:10]
    r2 = "AGTCTGCAATGGGCTCGACT" + a2_seq[0:10]
    insert_match, match1, match2 = aligner.match_insert(r1, r2)
    assert match1.rstart == 20
    assert match1.length == 10
    assert match2.rstart == 20
    assert match2.length == 10


def test_short_adapter_overlap():
    aligner = InsertAligner("TTAGACATAT", "CAGTGGAGTA")
    insert_match, match1, match2 = aligner.match_insert(
        "GACAGGCCGTTTGAATGTTGACGGGATGTT", "CATCCCGTCAACATTCAAACGGCCTGTCCA"
    )
    assert match1.rstart == 28
    assert match1.length == 2
    assert match2.rstart == 28
    assert match2.length == 2


def test_multi_aligner_no_mismatches():
    a = MultiAligner(max_error_rate=0, min_overlap=3)
    matches = a.locate("AGAGATCAGATGACAGATC", "GATCA")
    assert len(matches) == 2
    matches.sort(key=lambda x: x[4], reverse=True)
    assert matches[0] == (3, 8, 0, 5, 5, 0)
    assert matches[1] == (15, 19, 0, 4, 4, 0)


def test_multi_aligner_with_mismatches():
    a = MultiAligner(max_error_rate=0.1, min_overlap=10)
    matches = a.locate("GATATCAGATGACAGATCAGAGATCAGAT", "GAGATCAGATGA")
    assert len(matches) == 2
    matches.sort(key=lambda x: x[5])
    assert matches[0] == (19, 29, 0, 10, 10, 0)
    assert matches[1] == (0, 12, 0, 12, 11, 1)


def test_indel_alignment():
    # one deletion in the read relative to the adapter
    adapter = "TTAGACATAT"
    read = "CCCCCC" + "TTAGAATAT"  # 'C' deleted from adapter occurrence
    result = locate(adapter, read, 0.2, BACK)
    assert result is not None
    astart, astop, rstart, rstop, matches, errors = result
    assert astart == 0 and astop == 10
    assert rstart == 6
    assert errors <= 2


def test_qualtrim_vectors():
    from atropos_tpu.commands.trim.qualtrim import (
        nextseq_trim_index,
        quality_trim_index,
    )

    class _Rec:
        def __init__(self, sequence, qualities):
            self.sequence = sequence
            self.qualities = qualities

    # nextseq vector from the reference test suite (tests/test_qualtrim.py)
    assert nextseq_trim_index(_Rec("", ""), 22) == 0
    rec = _Rec(
        "TCTCGTATGCCGTCTTATGCTTGAAAAAAAAAAGGGGGGGGGGGGGGGGGNNNNNNNNNNNGGNGG",
        "AA//EAEE//A6///E//A//EA/EEEEEEAEA//EEEEEEEEEEEEEEE###########EE#EA",
    )
    assert nextseq_trim_index(rec, 22) == 33

    # basic quality trim behavior (BWA algorithm)
    assert quality_trim_index(chr(33 + 40) * 10, 0, 20) == (0, 10)
    # low-quality tail gets trimmed
    q = chr(33 + 40) * 8 + chr(33 + 2) * 4
    assert quality_trim_index(q, 0, 20) == (0, 8)
    # everything bad -> empty
    q = chr(33 + 2) * 5
    assert quality_trim_index(q, 20, 20) == (0, 0)

"""Adapter and filter unit tests (behaviors from the upstream
``tests/test_adapters.py`` and ``tests/test_filters.py``)."""
import pytest

from atropos_tpu.adapters import (
    Adapter,
    BACK,
    ColorspaceAdapter,
    FRONT,
    LinkedAdapter,
    parse_braces,
)
from atropos_tpu.align import Match
from atropos_tpu.commands.trim.filters import (
    DISCARD,
    KEEP,
    NContentFilter,
    PairedWrapper,
    SingleWrapper,
)
from atropos_tpu.io.seqio import Sequence


def test_issue_52():
    adapter = Adapter(
        sequence="GAACTCCAGTCACNNNNN",
        where=BACK,
        max_error_rate=0.12,
        min_overlap=5,
        read_wildcards=False,
        adapter_wildcards=True,
    )
    read = Sequence(name="abc", sequence="CCCCAGAACTACAGTCCCGGC")
    am = Match(
        astart=0, astop=17, rstart=5, rstop=21, matches=15, errors=2,
        front=None, adapter=adapter, read=read,
    )
    assert am.wildcards() == "GGC"


def test_issue_80():
    # an alignment with an indel has more matches than the no-indel one
    adapter = Adapter(
        sequence="TCGTATGCCGTCTTC",
        where=BACK,
        max_error_rate=0.2,
        min_overlap=3,
        read_wildcards=False,
        adapter_wildcards=False,
    )
    read = Sequence(name="seq2", sequence="TCGTATGCCCTCC")
    result = adapter.match_to(read)
    assert read.original_length == 13
    assert result.errors == 3
    assert result.astart == 0
    assert result.astop == 15


def test_str():
    a = Adapter("ACGT", where=BACK, max_error_rate=0.1)
    str(a)
    str(a.match_to(Sequence(name="seq", sequence="TTACGT")))
    ca = ColorspaceAdapter("0123", where=BACK, max_error_rate=0.1)
    str(ca)


def test_color():
    with pytest.raises(ValueError):
        ColorspaceAdapter("0123", where=FRONT, max_error_rate=0.1)


def test_parse_braces():
    assert parse_braces("") == ""
    assert parse_braces("A") == "A"
    assert parse_braces("A{0}") == ""
    assert parse_braces("A{1}") == "A"
    assert parse_braces("A{2}") == "AA"
    assert parse_braces("A{2}C") == "AAC"
    assert parse_braces("ACGTN{3}TGACCC") == "ACGTNNNTGACCC"
    assert parse_braces("ACGTN{10}TGACCC") == "ACGTNNNNNNNNNNTGACCC"
    assert parse_braces("ACGTN{3}TGA{4}CCC") == "ACGTNNNTGAAAACCC"
    assert parse_braces("ACGTN{0}TGA{4}CCC") == "ACGTTGAAAACCC"


def test_parse_braces_fail():
    for expression in [
        "{", "}", "{}", "{5", "{1}", "A{-7}", "A{", "A{1", "N{7", "AN{7",
        "A{4{}", "A{4}{3}", "A{b}", "A{6X}", "A{X6}",
    ]:
        with pytest.raises(ValueError):
            parse_braces(expression)


def test_linked_adapter():
    linked_adapter = LinkedAdapter("AAAA", "TTTT")
    sequence = Sequence(name="seq", sequence="AAAACCCCCTTTT")
    match = linked_adapter.match_to(sequence)
    trimmed = linked_adapter.trimmed(match)
    assert trimmed.name == "seq"
    assert trimmed.sequence == "CCCCC"


def test_random_match_probabilities():
    a = Adapter("A", BACK)
    assert a.random_match_probabilities() == [1.0, 0.25]
    a = Adapter("AC", BACK, gc_content=0.4)
    assert a.random_match_probabilities() == [1.0, 0.3, 0.06]


def test_ncontentfilter():
    params = [
        ("AAA", 0, KEEP),
        ("AAA", 1, KEEP),
        ("AAACCTTGGN", 1, KEEP),
        ("AAACNNNCTTGGN", 0.5, KEEP),
        ("NNNNNN", 1, DISCARD),
        ("ANAAAA", 1 / 6, KEEP),
        ("ANAAAA", 0, DISCARD),
    ]
    for seq, count, expected in params:
        fltr = NContentFilter(count=count)
        _seq = Sequence("read1", seq, qualities="#" * len(seq))
        assert fltr(_seq) == expected


def test_ncontentfilter_paired():
    params = [
        ("AAA", "AAA", 0, KEEP),
        ("AAAN", "AAA", 0, DISCARD),
        ("AAA", "AANA", 0, DISCARD),
        ("ANAA", "AANA", 1, KEEP),
    ]
    for seq1, seq2, count, expected in params:
        fltr = NContentFilter(count=count)
        filter_legacy = SingleWrapper(fltr)
        filter_both = PairedWrapper(fltr)
        read1 = Sequence("read1", seq1, qualities="#" * len(seq1))
        read2 = Sequence("read1", seq2, qualities="#" * len(seq2))
        assert filter_legacy(read1, read2) == fltr(read1)
        assert filter_both(read1, read2) == expected

"""Modifier unit tests (behaviors from the upstream
``tests/test_modifiers.py``)."""
from atropos_tpu.adapters import Adapter, AdapterParser, FRONT
from atropos_tpu.align import InsertAligner, Match, MatchInfo
from atropos_tpu.commands.trim.modifiers import (
    AdapterCutter,
    ErrorCorrectorMixin,
    InsertAdapterCutter,
    MergeOverlapping,
    MinCutter,
    NEndTrimmer,
    NonDirectionalBisulfiteTrimmer,
    OverwriteRead,
    PairedEndModifiers,
    QualityTrimmer,
    SingleEndModifiers,
    SwiftBisulfiteTrimmer,
    TruSeqBisulfiteTrimmer,
    UnconditionalCutter,
)
from atropos_tpu.io.seqio import Sequence
from atropos_tpu.util import reverse_complement as rc

DUMMY_ADAPTER = Adapter("ACGT", FRONT)


def front_match(read):
    match = Match(0, 2, 0, 2, 1, 0, True, DUMMY_ADAPTER, read)
    match_info = MatchInfo(
        "read", 0, 0, 2, "", "AC", "ACGTAC", "adapter", "", "##", "######",
        True, 2, 2, 2,
    )
    return (match, [match_info])


def back_match(read):
    match = Match(6, 8, 6, 8, 1, 0, False, DUMMY_ADAPTER, read)
    match_info = MatchInfo(
        "read", 0, 6, 8, "ACGTAC", "GT", "", "adapter", "######", "##", "",
        False, 2, 2, 2,
    )
    return (match, [match_info])


def test_unconditional_cutter():
    s = Sequence("read1", "abcdefg")
    assert UnconditionalCutter(lengths=[2])(s).sequence == "cdefg"
    assert UnconditionalCutter(lengths=[-2])(s).sequence == "abcde"
    assert UnconditionalCutter(lengths=[100])(s).sequence == ""
    assert UnconditionalCutter(lengths=[-100])(s).sequence == ""


def test_nend_trimmer():
    trimmer = NEndTrimmer()
    seqs = ["NNNNAAACCTTGGNNN", "NNNNAAACNNNCTTGGNNN", "NNNNNN"]
    trims = ["AAACCTTGG", "AAACNNNCTTGG", ""]
    for seq, trimmed in zip(seqs, trims):
        _seq = Sequence("read1", seq, qualities="#" * len(seq))
        _trimmed = Sequence("read1", trimmed, qualities="#" * len(trimmed))
        assert trimmer(_seq) == _trimmed


def test_quality_trimmer():
    read = Sequence("read1", "ACGTTTACGTA", "##456789###")
    assert QualityTrimmer(10, 10, 33)(read) == Sequence("read1", "GTTTAC", "456789")
    assert QualityTrimmer(0, 10, 33)(read) == Sequence("read1", "ACGTTTAC", "##456789")
    assert QualityTrimmer(10, 0, 33)(read) == Sequence(
        "read1", "GTTTACGTA", "456789###"
    )


def test_modifiers_single():
    m = SingleEndModifiers()
    m.add_modifier(UnconditionalCutter, lengths=[5])
    assert len(m.get_modifiers(read=1)) == 1
    assert isinstance(m.get_modifiers(read=1)[0], UnconditionalCutter)
    assert len(m.get_modifiers(read=2)) == 0
    read = Sequence("read1", "ACGTTTACGTA", "##456789###")
    mod_read = m.modify(read)
    assert len(mod_read) == 1
    assert mod_read[0].sequence == "TACGTA"


def test_modifiers_paired_legacy():
    m = PairedEndModifiers(paired="first")
    m.add_modifier(UnconditionalCutter, lengths=[5])
    read1 = Sequence("read1", "ACGTTTACGTA", "##456789###")
    read2 = Sequence("read1", "ACGTTTACGTA", "##456789###")
    mod_read1, mod_read2 = m.modify(read1, read2)
    assert mod_read1.sequence == "TACGTA"
    assert mod_read2.sequence == "ACGTTTACGTA"


def test_modifiers_paired_both():
    m = PairedEndModifiers(paired="both")
    m.add_modifier(UnconditionalCutter, read=1 | 2, lengths=[5])
    assert len(m.get_modifiers(read=1)) == 1
    assert len(m.get_modifiers(read=2)) == 1
    read1 = Sequence("read1", "ACGTTTACGTA", "##456789###")
    read2 = Sequence("read1", "ACGTTTACGTA", "##456789###")
    mod_read1, mod_read2 = m.modify(read1, read2)
    assert mod_read1.sequence == "TACGTA"
    assert mod_read2.sequence == "TACGTA"


def test_min_cutter_count_trimmed_only_trimmed():
    unconditional_before = UnconditionalCutter((2, -2))
    unconditional_after = UnconditionalCutter((1, -1))
    min_trimmer = MinCutter((5, -5), True, True)
    read1 = Sequence("read1", "CAATCGATCGAACGTACCGAT")
    assert read1.clipped == [0, 0, 0, 0]
    read1 = unconditional_before(read1)
    assert read1.sequence == "ATCGATCGAACGTACCG"
    assert read1.clipped == [2, 2, 0, 0]
    # without adapter trimming: untouched (only_trimmed)
    assert min_trimmer(read1).sequence == "ATCGATCGAACGTACCG"
    # with adapter trimming
    read2 = read1[:]
    read2.sequence = "ATCGAACGTACCG"
    read2.match, read2.match_info = front_match(read2)
    read3 = min_trimmer(read2)
    assert read3.sequence == "TCGAACGTACCG"
    assert read3.clipped == [2, 2, 1, 0]
    # with subsequent clipping
    read4 = unconditional_after(read2)
    assert read4.sequence == "TCGAACGTACC"
    assert read4.clipped == [2, 2, 1, 1]
    read5 = min_trimmer(read4)
    assert read5.sequence == "TCGAACGTACC"
    assert read5.clipped == [2, 2, 1, 1]


def test_min_cutter_no_count_trimmed():
    unconditional_before = UnconditionalCutter((2, -2))
    unconditional_after = UnconditionalCutter((1, -1))
    min_trimmer = MinCutter((5, -5), False, True)
    read1 = Sequence("read1", "CAATCGATCGAACGTACCGAT")
    read1 = unconditional_before(read1)
    assert min_trimmer(read1).sequence == "ATCGATCGAACGTACCG"
    read2 = read1[:]
    read2.match, read2.match_info = front_match(read2)
    read2.sequence = "CGATCGAACGTACCG"
    read3 = min_trimmer(read2)
    assert read3.sequence == "GAACGTACCG"
    assert read3.clipped == [2, 2, 5, 0]
    read4 = unconditional_after(read2)
    assert read4.sequence == "GATCGAACGTACC"
    assert read4.clipped == [2, 2, 1, 1]
    read5 = min_trimmer(read4)
    assert read5.sequence == "GAACGTACC"
    assert read5.clipped == [2, 2, 5, 1]


def test_min_cutter_always():
    unconditional_before = UnconditionalCutter((2, -2))
    min_trimmer = MinCutter((4, -4), True, False)
    read1 = Sequence("read1", "CAATCGATCGAACGTACCGAT")
    read1 = unconditional_before(read1)
    assert min_trimmer(read1).sequence == "CGATCGAACGTAC"


def test_non_directional_bisulfite_trimmer():
    trimmer = NonDirectionalBisulfiteTrimmer(rrbs=True)
    read2 = Sequence("read2", "CTATCGATC")
    read2.match, read2.match_info = back_match(read2)
    read3 = Sequence("read3", "CTATCGATCCA")
    assert trimmer(read2).sequence == "CTATCGA"
    assert trimmer(read3).sequence == "CTATCGATCCA"


def test_truseq_trimmer():
    trimmer = TruSeqBisulfiteTrimmer()
    read1 = Sequence("read1", "CTATCGATCCACGAGACTAAC")
    assert trimmer(read1).sequence == "ATCCACGAGACTAAC"


def test_swift_trimmer():
    trimmer = SwiftBisulfiteTrimmer()
    seq = "ACGT" * 30
    read1 = Sequence("read1", seq)
    read2 = Sequence("read2", seq)
    trimmed = trimmer(read1, read2)
    assert trimmed[0].sequence == seq[:-10]
    assert trimmed[1].sequence == seq[10:]


def test_overlapping():
    trimmer = MergeOverlapping(min_overlap=10, error_rate=0.1)
    a1 = "AGATCGGAAGAGCGTCGTGTAGGGAAAGAGTGTAGATCTC"
    a2 = rc("AGATCGGAAGAGCACACGTCTGAACTCCAGTCACGAGTTA")
    frag = "CCAAGCAGACATTCACTCAGATTGCA"
    r1 = (frag + a1)[0:40]
    q1 = "#" * 40
    r2 = rc(a2 + frag)[0:40]
    q2 = "!" * 40
    parser = AdapterParser()
    adapter1 = parser.parse_from_spec(a1)
    adapter2 = parser.parse_from_spec(a2)
    cutter = AdapterCutter([adapter1, adapter2])
    read1 = Sequence("foo", r1, q1)
    read1 = cutter(read1)
    assert len(read1) == 26
    read2 = Sequence("foo", r2, q2)
    read2 = cutter(read2)
    assert len(read2) == 26
    # complete overlap
    read1_merged, read2_merged = trimmer(read1, read2)
    assert read1_merged.merged
    assert read2_merged is None
    assert read1 == read1_merged
    # partial overlap
    read1.merged = False
    read2 = read2.subseq(0, 24)[2]
    read1_merged, read2_merged = trimmer(read1, read2)
    assert read1_merged.merged
    assert read2_merged is None
    assert read1 == read1_merged
    # partial overlap r1, r2
    read1.merged = False
    read1 = read1.subseq(0, 24)[2]
    read1_merged, read2_merged = trimmer(read1, read2)
    assert read1_merged.merged
    assert read2_merged is None
    assert len(read1_merged) == 26
    assert read1_merged.sequence == "CCAAGCAGACATTCACTCAGATTGCA"
    assert read1_merged.qualities == ("#" * 24) + ("!" * 2)
    # 2 errors pass (round(0.1 * 24) = 2)
    read1.merged = False
    r1_seq = list(read1.sequence)
    r1_seq[10] = rc(r1_seq[10])
    r1_seq[20] = rc(r1_seq[20])
    read1.sequence = "".join(r1_seq)
    read1_merged, read2_merged = trimmer(read1, read2)
    assert read1_merged.merged
    assert read2_merged is None
    assert len(read1_merged) == 26
    assert read1_merged.sequence == "CCAAGCAGACTTTCACTCAGTTTGCA"
    assert read1_merged.qualities == ("#" * 24) + ("!" * 2)
    # 3 errors do not
    read1.merged = False
    r1_seq[15] = rc(r1_seq[15])
    read1.sequence = "".join(r1_seq)
    read1_merged, read2_merged = trimmer(read1, read2)
    assert read1_merged.merged is False
    assert read2 is not None


def test_overlapping_with_error_correction():
    trimmer = MergeOverlapping(min_overlap=10, error_rate=0.1, mismatch_action="liberal")
    r1 = "AGATCGGAAGACCGTCATGTAGGGAAAGAGTGTAGATCTC"
    q1 = "FFFFFFFFFFF#FFFFFFFFFFFFFFFFFFFFF#######"
    r2 = rc("AGATCGGTAGAGCGTCGTGTAGGGAAATAGTGTAGATCTC")
    q2 = "".join(reversed("FFFFFFFFFFFFFFFF#FFFFFFFFFF#FFFFFFFFFFFF"))
    read1 = Sequence("foo", r1, q1)
    read2 = Sequence("foo", r2, q2)
    read1_merged, read2_merged = trimmer(read1, read2)
    assert read1_merged.merged
    assert read2_merged is None
    assert read1_merged.sequence == "AGATCGGTAGAGCGTCATGTAGGGAAAGAGTGTAGATCTC"
    assert read1_merged.qualities == "FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFF#######"


def test_mismatched_adapter_overlaps():
    """Real-data case: the adapter overlaps 1 bp less on the forward read;
    the extra 'A' base must be trimmed."""
    r1 = (
        "TTGTTTTTATGGAGAGAGTTTTAAGGTTTATTTTAGTTTTAAAGGATATTGTAGGTTAGAGGGAAAGTG"
        "TATGATGAAGGTATATATTGGTAGATCGGAAGAGCACACGTCTGAACTTCAGTCAC"
    )
    r2 = (
        "ACCAATATTTTACTCCATCATACACTTACCCTCTAAACTATAATAACTTTTTTATCTATACTTAACCTT"
        "TATTTTCAACTCATCACAATAAAGATCCGAAGAGAGACGTGAAGGGAAAGAACATA"
    )
    a1 = "GATCGGAAGAGCACACGTCTGAACTCCAGTCACCAGATCATCTCGTATGCCGTCTTCTGCTTG"
    a2 = "AGATCGGAAGAGCGTCGTGTAGGGAAAGAGTGTAGATCTCGGTGGTCGCCGTATCATT"
    parser = AdapterParser()
    adapter1 = parser.parse_from_spec(a1)
    adapter2 = parser.parse_from_spec(a2)
    cutter = InsertAdapterCutter(
        adapter1, adapter2, max_insert_mismatch_frac=0.3, max_adapter_mismatch_frac=0.3
    )
    read1 = Sequence("foo", r1, "#" * 125)
    read2 = Sequence("foo", r2, "#" * 125)
    new_read1, new_read2 = cutter(read1, read2)
    assert len(new_read1) == 91
    assert len(new_read2) == 91
    assert new_read1.sequence == (
        "TTGTTTTTATGGAGAGAGTTTTAAGGTTTATTTTAGTTTTAAAGGATATTGTAGGTTAGAGGGAAAGTG"
        "TATGATGAAGGTATATATTGGT"
    )


def _correction_fixture(a2_seq):
    a1 = "AGATCGGAAGAGCGTCGTGTAGGGAAAGAGTGTAGATCTC"
    frag = "CCAAGCAGACATTCACTCAGATTGCA"
    r1 = list(frag)
    r1[5] = "T"
    q1 = ["#"] * 40
    q1[5] = "A"
    r1 = ("".join(r1) + a1)[0:40]
    q1 = "".join(q1)
    r2 = list(frag)
    r2[14] = "G"
    q2 = ["#"] * 40
    q2[len(frag) - 15] = "A"
    r2 = rc(rc(a2_seq) + "".join(r2))[0:40]
    q2 = "".join(q2)
    return a1, r1, q1, r2, q2


CORRECT_FRAG = "CCAAGTAGACATTCGCTCAGATTGCA"


def test_error_correction():
    a2 = "AGATCGGAAGAGCACACGTCTGAACTCCAGTCACGAGTTA"
    a1, r1, q1, r2, q2 = _correction_fixture(a2)
    read1 = Sequence("foo", r1, q1)
    read2 = Sequence("foo", r2, q2)
    parser = AdapterParser()
    adapter1 = parser.parse_from_spec(a1)
    adapter2 = parser.parse_from_spec(a2)
    cutter = InsertAdapterCutter(adapter1, adapter2, mismatch_action="liberal")
    new_read1, new_read2 = cutter(read1, read2)
    assert len(new_read1) == 26
    assert new_read1.insert_overlap
    assert new_read1.sequence == CORRECT_FRAG
    assert len(new_read2) == 26
    assert new_read2.insert_overlap
    assert new_read2.sequence == rc(CORRECT_FRAG)


def test_error_correction_no_insert_match_one_adapter_match():
    a2 = "AGATCGGAAGAGCACACGTCTGAACTCCAGTCACGAGTTA"
    a2_mod = "ACATCGGAAGAGCACACGTCTGAACTCCAGTCACGAGTTA"
    a1, r1, q1, r2, q2 = _correction_fixture(a2_mod)
    read1 = Sequence("foo", r1, q1)
    read2 = Sequence("foo", r2, q2)
    adapter1 = AdapterParser().parse_from_spec(a1)
    adapter2 = AdapterParser(max_error_rate=0).parse_from_spec(a2)
    cutter = InsertAdapterCutter(
        adapter1, adapter2, mismatch_action="liberal", max_insert_mismatch_frac=0
    )
    new_read1, new_read2 = cutter(read1, read2)
    assert len(new_read1) == 26
    assert not new_read1.insert_overlap
    assert new_read1.sequence == CORRECT_FRAG
    assert len(new_read2) == 26
    assert not new_read2.insert_overlap
    assert new_read2.sequence == rc(CORRECT_FRAG)


def test_error_correction_no_insert_match_two_adapter_matches():
    a2 = "AGATCGGAAGAGCACACGTCTGAACTCCAGTCACGAGTTA"
    a1, r1, q1, r2, q2 = _correction_fixture(a2)
    read1 = Sequence("foo", r1, q1)
    read2 = Sequence("foo", r2, q2)
    parser = AdapterParser()
    adapter1 = parser.parse_from_spec(a1)
    adapter2 = parser.parse_from_spec(a2)
    cutter = InsertAdapterCutter(
        adapter1, adapter2, mismatch_action="liberal", max_insert_mismatch_frac=0
    )
    new_read1, new_read2 = cutter(read1, read2)
    assert len(new_read1) == 26
    assert not new_read1.insert_overlap
    assert new_read1.sequence == CORRECT_FRAG
    assert len(new_read2) == 26
    assert not new_read2.insert_overlap
    assert new_read2.sequence == rc(CORRECT_FRAG)


def test_error_correction_unequal_read_lengths():
    read1 = Sequence(
        "read1",
        "TTTGCAGCTTTTGTAGACAAGTGCTGTGCAGCTGATGTCAAAGAGACCTGCTTTGCTCTGGAGGGTCCA"
        "AAACTTGTAGCCTCAACCCGAGAAGCCATAGCCTAA",
        "CCCCCFCGGGGGBFFAFC<?BEADCCF<FFFFGFFDFDFFGGGGCFGGC?DFFFEC;,===??DG==DD"
        "DFFFFG8DDD7+5;;DF*=)))10885D**58>6=0",
    )
    read2 = Sequence(
        "read1",
        "ATAGGCTATGGCTTCTCGAGTTGAAGCTACAAGTTTTGGACCCTCCAGAGCAAAGCAGGTCTCTTTGAC"
        "ATCAGCTGCACAGCACTTGTCTACAAAAGCTGCAAAAGATCGGAAGAGCGTCTCGGAAGAGCGTCGTGT"
        "AGGGAAAGAGTGTAGATCTCGGTGGTCGACGTATCATTAAAAAAAAAAACACATCACATCAACAAGATA"
        "ACACGACTTCTCCATCCACAGTACCGATGACCTCAACATTAGT",
        "CCCCCG@FCFGGCFGGGGFEFGFGGFCFGGGFGFGGGGGGGGGGGGGGGGGGGGGGGGGGG9FGGGGGG"
        "GFGDFFGGGGGGGGGGGGGGGGG8;>@?@FEGGGGGGGGGGGGGGGGGGGGG=DDFAEFFFGF>B>EA)"
        ":DFFBDFFB6CDEDDD9=99DD>55)580:A5)*)*;DD>**51:0118):)4))1***0:*)*)((**"
        "*0*.(((((*)/.)1/(6((()1.)(((6).-----8<:C<73",
    )
    aligner = InsertAligner(
        "AGATCGGAAGAGCACACGTCTGAACTCCAGTCACACAGTGATCTCGTATGCCGTCTTCTGCTTG",
        "AGATCGGAAGAGCGTCGTGTAGGGAAAGAGTGTAGATCTCGGTGGTCGCCGTATCATT",
    )
    insert_match, adapter_match1, adapter_match2 = aligner.match_insert(
        read1.sequence, read2.sequence
    )
    ec = ErrorCorrectorMixin("N")
    ec.correct_errors(read1, read2, insert_match, truncate_seqs=True)
    assert read1.corrected == 3
    assert read2.corrected == 3
    for i in (80, 86, 104):
        assert read1.sequence[i] == "N"
        assert read2.sequence[104 - i] == "N"


def ints2quals(ints):
    return "".join(chr(i + 33) for i in ints)


def test_overwrite_read():
    overwrite = OverwriteRead(20, 40, 10)
    lowseq = "ACGT" * 5
    highseq = "TCAG" * 5
    lowq = (11, 31, 16, 24, 16, 20, 17, 19, 21, 28) * 2
    highq = (22, 62, 32, 48, 32, 40, 34, 38, 42, 56) * 2
    read1 = Sequence("foo", lowseq, ints2quals(lowq))
    read2 = Sequence("foo", highseq, ints2quals(highq))
    new_read1, new_read2 = overwrite(read1, read2)
    assert new_read1.sequence == lowseq
    assert new_read2.sequence == highseq
    assert new_read1.corrected == new_read2.corrected == 0
    # mean lowq < 20, mean highq > 40 -> read1 replaced by rc(read2)
    lowq = tuple(i - 1 for i in lowq)
    read1 = Sequence("foo", lowseq, ints2quals(lowq))
    new_read1, new_read2 = overwrite(read1, read2)
    assert new_read1.sequence == rc(highseq)
    assert new_read1.qualities == ints2quals(reversed(highq))
    assert new_read2.sequence == highseq
    assert new_read1.corrected == new_read2.corrected == 1
    # both low -> unchanged
    highq = tuple(i - 1 for i in highq)
    read2 = Sequence("foo", highseq, ints2quals(highq))
    new_read1, new_read2 = overwrite(read1, read2)
    assert new_read1.sequence == lowseq
    assert new_read2.sequence == highseq
    assert new_read1.corrected == new_read2.corrected == 0

"""Single-end trim conformance tests against the upstream golden files.

Each case reproduces a scenario from the upstream suite
(``/root/reference/tests/test_atropos.py``); outputs must be byte-identical
to the upstream expected files.
"""
import os

import pytest

from atropos_tpu.commands import execute_cli, get_command

from .conformance_utils import (
    assert_files_equal,
    cutpath,
    datapath,
    run_trim,
    tracked_execute,
)


def test_example(tmp_path):
    run_trim(tmp_path, "-N -b ADAPTER", "example.fa", "example.fa")


def test_small(tmp_path):
    run_trim(tmp_path, "-b TTAGACATATCTCCGTCG", "small.fastq", "small.fastq")


def test_empty(tmp_path):
    run_trim(tmp_path, "-a TTAGACATATCTCCGTCG", "empty.fastq", "empty.fastq")


def test_newlines(tmp_path):
    run_trim(tmp_path, "-e 0.12 -b TTAGACATATCTCCGTCG", "dos.fastq", "dos.fastq")


def test_lowercase(tmp_path):
    run_trim(tmp_path, "-b ttagacatatctccgtcg", "lowercase.fastq", "small.fastq")


def test_rest(tmp_path):
    path = tmp_path / "rest.tmp"
    run_trim(tmp_path, ["-b", "ADAPTER", "-N", "-r", str(path)], "rest.fa", "rest.fa")
    assert_files_equal(datapath("rest.txt"), str(path))


def test_restfront(tmp_path):
    path = tmp_path / "rest.tmp"
    run_trim(
        tmp_path, ["-g", "ADAPTER", "-N", "-r", str(path)], "restfront.fa", "rest.fa"
    )
    assert_files_equal(datapath("restfront.txt"), str(path))


def test_discard(tmp_path):
    run_trim(
        tmp_path, "-b TTAGACATATCTCCGTCG --discard", "discard.fastq", "small.fastq"
    )


def test_discard_untrimmed(tmp_path):
    run_trim(
        tmp_path,
        "-b CAAGAT --discard-untrimmed",
        "discard-untrimmed.fastq",
        "small.fastq",
    )


def test_plus(tmp_path):
    run_trim(tmp_path, "-e 0.12 -b TTAGACATATCTCCGTCG", "plus.fastq", "plus.fastq")


def test_extensiontxtgz(tmp_path):
    run_trim(
        tmp_path, "-b TTAGACATATCTCCGTCG", "s_1_sequence.txt", "s_1_sequence.txt.gz"
    )


def test_format(tmp_path):
    run_trim(
        tmp_path,
        "-f fastq -b TTAGACATATCTCCGTCG",
        "small.fastq",
        "small.myownextension",
    )


def test_minimum_length(tmp_path):
    run_trim(tmp_path, "-c -m 5 -a 330201030313112312", "minlen.fa", "lengths.fa")


def test_too_short(tmp_path):
    too_short_path = str(tmp_path / "tooshort.tmp.fa")
    run_trim(
        tmp_path,
        "-c -m 5 -a 330201030313112312 --too-short-output " + too_short_path,
        "minlen.fa",
        "lengths.fa",
    )
    assert_files_equal(datapath("tooshort.fa"), too_short_path)


def test_too_short_no_primer(tmp_path):
    too_short_path = str(tmp_path / "tooshort.tmp.fa")
    run_trim(
        tmp_path,
        "-c -m 5 -a 330201030313112312 --trim-primer --too-short-output "
        + too_short_path,
        "minlen.noprimer.fa",
        "lengths.fa",
    )
    assert_files_equal(datapath("tooshort.noprimer.fa"), too_short_path)


def test_maximum_length(tmp_path):
    run_trim(tmp_path, "-c -M 5 -a 330201030313112312", "maxlen.fa", "lengths.fa")


def test_too_long(tmp_path):
    too_long_path = str(tmp_path / "toolong.tmp.fa")
    run_trim(
        tmp_path,
        "-c -M 5 --too-long-output {} -a 330201030313112312".format(too_long_path),
        "maxlen.fa",
        "lengths.fa",
    )
    assert_files_equal(datapath("toolong.fa"), too_long_path)


def test_length_tag(tmp_path):
    run_trim(
        tmp_path,
        "-n 3 -e 0.1 --length-tag length= "
        "-b TGAGACACGCAACAGGGGAAAGGCAAGGCACACAGGGGATAGG "
        "-b TCCATCTCATCCCTGCGTGTCCCATCTGTTCCCTCCCTGTCTCA",
        "454.fa",
        "454.fa",
    )


def test_overlap_a(tmp_path):
    run_trim(
        tmp_path, "-O 10 -a 330201030313112312 -e 0.0 -N", "overlapa.fa", "overlapa.fa"
    )


def test_overlap_b(tmp_path):
    run_trim(tmp_path, "-O 10 -b TTAGACATATCTCCGTCG -N", "overlapb.fa", "overlapb.fa")


def test_qualtrim(tmp_path):
    run_trim(tmp_path, "-q 10 -a XXXXXX", "lowqual.fastq", "lowqual.fastq")


def test_qualbase(tmp_path):
    run_trim(
        tmp_path,
        "-q 10 --quality-base 64 -a XXXXXX",
        "illumina64.fastq",
        "illumina64.fastq",
    )


def test_quality_trim_only(tmp_path):
    run_trim(
        tmp_path, "-q 10 --quality-base 64", "illumina64.fastq", "illumina64.fastq"
    )


def test_twoadapters(tmp_path):
    run_trim(
        tmp_path,
        "-a AATTTCAGGAATT -a GTTCTCTAGTTCT",
        "twoadapters.fasta",
        "twoadapters.fasta",
    )


def test_polya(tmp_path):
    run_trim(
        tmp_path,
        "-m 24 -O 10 -a AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA",
        "polya.fasta",
        "polya.fasta",
    )


def test_polya_brace_notation(tmp_path):
    run_trim(tmp_path, "-m 24 -O 10 -a A{35}", "polya.fasta", "polya.fasta")


def test_mask_adapter(tmp_path):
    run_trim(
        tmp_path,
        "-b CAAG -n 3 --mask-adapter",
        "anywhere_repeat.fastq",
        "anywhere_repeat.fastq",
    )


def test_gz_multiblock(tmp_path):
    run_trim(tmp_path, "-b TTAGACATATCTCCGTCG", "small.fastq", "multiblock.fastq.gz")


def test_suffix(tmp_path):
    run_trim(
        tmp_path,
        "-c -e 0.12 -a 1=330201030313112312 -y _my_suffix_{name} --strip-f3",
        "suffix.fastq",
        "solid.csfasta",
        qualfile="solid.qual",
    )


def test_read_wildcard(tmp_path):
    run_trim(
        tmp_path, "--match-read-wildcards -b ACGTACGT", "wildcard.fa", "wildcard.fa"
    )


def test_adapter_wildcard(tmp_path):
    for adapter_type, expected in (
        ("-a", "wildcard_adapter.fa"),
        ("-b", "wildcard_adapter_anywhere.fa"),
    ):
        path = tmp_path / (expected + ".wildcardtmp.txt")
        run_trim(
            tmp_path,
            "--wildcard-file {0} {1} ACGTNNNACGT".format(path, adapter_type),
            expected,
            "wildcard_adapter.fa",
        )
        with open(path) as wct:
            lines = [line.strip() for line in wct.readlines()]
        assert lines == ["AAA 1", "GGG 2", "CCC 3b", "TTT 4b"]


def test_wildcard_N(tmp_path):
    run_trim(
        tmp_path,
        "-e 0 -a GGGGGGG --match-read-wildcards",
        "wildcardN.fa",
        "wildcardN.fa",
    )


def test_illumina_adapter_wildcard(tmp_path):
    run_trim(
        tmp_path,
        "-a VCCGAMCYUCKHRKDCUBBCNUWNSGHCGU",
        "illumina.fastq",
        "illumina.fastq.gz",
    )


def test_adapter_front(tmp_path):
    run_trim(tmp_path, "--front ADAPTER -N", "examplefront.fa", "example.fa")


def test_literal_N(tmp_path):
    run_trim(tmp_path, "-N -e 0.2 -a NNNNNNNNNNNNNN", "trimN3.fasta", "trimN3.fasta")


def test_literal_N2(tmp_path):
    run_trim(tmp_path, "-N -O 1 -g NNNNNNNNNNNNNN", "trimN5.fasta", "trimN5.fasta")


def test_literal_N_brace_notation(tmp_path):
    run_trim(tmp_path, "-N -e 0.2 -a N{14}", "trimN3.fasta", "trimN3.fasta")


def test_literal_N2_brace_notation(tmp_path):
    run_trim(tmp_path, "-N -O 1 -g N{14}", "trimN5.fasta", "trimN5.fasta")


def test_anchored_front(tmp_path):
    run_trim(tmp_path, "-g ^FRONTADAPT -N", "anchored.fasta", "anchored.fasta")


def test_anchored_front_ellipsis_notation(tmp_path):
    run_trim(tmp_path, "-a FRONTADAPT... -N", "anchored.fasta", "anchored.fasta")


def test_anchored_back(tmp_path):
    run_trim(
        tmp_path, "-a BACKADAPTER$ -N", "anchored-back.fasta", "anchored-back.fasta"
    )


def test_anchored_back_no_indels(tmp_path):
    run_trim(
        tmp_path,
        "-a BACKADAPTER$ -N --no-indels",
        "anchored-back.fasta",
        "anchored-back.fasta",
    )


def test_no_indels(tmp_path):
    run_trim(
        tmp_path,
        "-a TTAGACATAT -g GAGATTGCCA --no-indels",
        "no_indels.fasta",
        "no_indels.fasta",
    )


def test_issue_46(tmp_path):
    path = tmp_path / "wildcardtmp.txt"
    run_trim(
        tmp_path,
        "--anywhere=AACGTN --wildcard-file={0}".format(path),
        "issue46.fasta",
        "issue46.fasta",
    )


def test_strip_suffix(tmp_path):
    run_trim(
        tmp_path,
        "--strip-suffix _sequence -a XXXXXXX",
        "stripped.fasta",
        "simple.fasta",
    )


def test_info_file(tmp_path):
    path = str(tmp_path / "infotmp.txt")
    run_trim(
        tmp_path,
        ["--info-file", path, "-a", "adapt=GCCGAACTTCTTAGACTGCCTTAAGGACGT"],
        "illumina.fastq",
        "illumina.fastq.gz",
    )
    assert_files_equal(cutpath("illumina.info.txt"), path)


def test_info_file_times(tmp_path):
    path = str(tmp_path / "infotmp.txt")
    run_trim(
        tmp_path,
        [
            "--info-file", path, "--times", "2",
            "-a", "adapt=GCCGAACTTCTTA",
            "-a", "adapt2=GACTGCCTTAAGGACGT",
        ],
        "illumina5.fastq",
        "illumina5.fastq",
    )
    assert_files_equal(cutpath("illumina5.info.txt"), path)


def test_info_file_fasta(tmp_path):
    path = str(tmp_path / "infotmp.txt")
    run_trim(
        tmp_path,
        ["--info-file", path, "-a", "TTAGACATAT", "-g", "GAGATTGCCA", "--no-indels"],
        "no_indels.fasta",
        "no_indels.fasta",
    )


def test_named_adapter(tmp_path):
    run_trim(
        tmp_path,
        "-a MY_ADAPTER=GCCGAACTTCTTAGACTGCCTTAAGGACGT",
        "illumina.fastq",
        "illumina.fastq.gz",
    )


def test_adapter_with_U(tmp_path):
    run_trim(
        tmp_path,
        "-a GCCGAACUUCUUAGACUGCCUUAAGGACGU",
        "illumina.fastq",
        "illumina.fastq.gz",
    )


def test_no_trim(tmp_path):
    run_trim(
        tmp_path,
        "--no-trim --discard-untrimmed -a CCCTAGTTAAAC",
        "no-trim.fastq",
        "small.fastq",
    )


def test_bzip2(tmp_path):
    run_trim(tmp_path, "-b TTAGACATATCTCCGTCG", "small.fastq", "small.fastq.bz2")


def test_xz(tmp_path):
    run_trim(tmp_path, "-b TTAGACATATCTCCGTCG", "small.fastq", "small.fastq.xz")


def test_anchored_no_indels(tmp_path):
    run_trim(
        tmp_path,
        "-g ^TTAGACATAT --no-indels -e 0.1",
        "anchored_no_indels.fasta",
        "anchored_no_indels.fasta",
    )


def test_anchored_no_indels_wildcard_read(tmp_path):
    run_trim(
        tmp_path,
        "-g ^TTAGACATAT --match-read-wildcards --no-indels -e 0.1",
        "anchored_no_indels_wildcard.fasta",
        "anchored_no_indels.fasta",
    )


def test_anchored_no_indels_wildcard_adapt(tmp_path):
    run_trim(
        tmp_path,
        "-g ^TTAGACANAT --no-indels -e 0.1",
        "anchored_no_indels.fasta",
        "anchored_no_indels.fasta",
    )


def test_unconditional_cut_front(tmp_path):
    run_trim(tmp_path, "-u 5", "unconditional-front.fastq", "small.fastq")


def test_unconditional_cut_back(tmp_path):
    run_trim(tmp_path, "-u -5", "unconditional-back.fastq", "small.fastq")


def test_unconditional_cut_both(tmp_path):
    run_trim(tmp_path, "-u -5 -u 5", "unconditional-both.fastq", "small.fastq")


def test_untrimmed_output(tmp_path):
    path = str(tmp_path / "untrimmed.tmp.fastq")
    run_trim(
        tmp_path,
        ["-a", "TTAGACATATCTCCGTCG", "--untrimmed-output", path],
        "small.trimmed.fastq",
        "small.fastq",
    )
    assert_files_equal(cutpath("small.untrimmed.fastq"), path)


def test_adapter_file(tmp_path):
    run_trim(
        tmp_path,
        "-a file:" + datapath("adapter.fasta"),
        "illumina.fastq",
        "illumina.fastq.gz",
    )


def test_adapter_file_5p_anchored(tmp_path):
    run_trim(
        tmp_path,
        "-N -g file:" + datapath("prefix-adapter.fasta"),
        "anchored.fasta",
        "anchored.fasta",
    )


def test_adapter_file_3p_anchored(tmp_path):
    run_trim(
        tmp_path,
        "-N -a file:" + datapath("suffix-adapter.fasta"),
        "anchored-back.fasta",
        "anchored-back.fasta",
    )


def test_adapter_file_5p_anchored_no_indels(tmp_path):
    run_trim(
        tmp_path,
        "-N --no-indels -g file:" + datapath("prefix-adapter.fasta"),
        "anchored.fasta",
        "anchored.fasta",
    )


def test_adapter_file_3p_anchored_no_indels(tmp_path):
    run_trim(
        tmp_path,
        "-N --no-indels -a file:" + datapath("suffix-adapter.fasta"),
        "anchored-back.fasta",
        "anchored-back.fasta",
    )


def test_demultiplex(tmp_path):
    multiout = str(tmp_path / "tmp-demulti.{name}.fasta")
    params = [
        "-a", "first=AATTTCAGGAATT",
        "-a", "second=GTTCTCTAGTTCT",
        "-o", multiout,
        "-se", datapath("twoadapters.fasta"),
        "--adapter-cache-file", str(tmp_path / ".adapters"),
        "--report-file", str(tmp_path / "report.txt"), "--quiet",
    ]
    command = get_command("trim")
    retcode, _summary = command.execute(params)
    assert retcode == 0
    assert_files_equal(
        cutpath("twoadapters.first.fasta"), multiout.format(name="first")
    )
    assert_files_equal(
        cutpath("twoadapters.second.fasta"), multiout.format(name="second")
    )
    assert_files_equal(
        cutpath("twoadapters.unknown.fasta"), multiout.format(name="unknown")
    )


def test_max_n(tmp_path):
    run_trim(tmp_path, "--max-n 0", "maxn0.fasta", "maxn.fasta")
    run_trim(tmp_path, "--max-n 1", "maxn1.fasta", "maxn.fasta")
    run_trim(tmp_path, "--max-n 2", "maxn2.fasta", "maxn.fasta")
    run_trim(tmp_path, "--max-n 0.2", "maxn0.2.fasta", "maxn.fasta")
    run_trim(tmp_path, "--max-n 0.4", "maxn0.4.fasta", "maxn.fasta")


def test_nextseq(tmp_path):
    run_trim(tmp_path, "--nextseq-trim 22", "nextseq.fastq", "nextseq.fastq")


def test_linked(tmp_path):
    run_trim(tmp_path, "-a AAAAAAAAAA...TTTTTTTTTT", "linked.fasta", "linked.fasta")


def test_fasta(tmp_path):
    run_trim(tmp_path, "-a TTAGACATATCTCCGTCG", "small.fasta", "small.fastq")


def test_custom_bisulfite_1(tmp_path):
    run_trim(
        tmp_path,
        "-b TTAGACATATCTCCGTCG -q 0,0 --bisulfite 2,2,1,1",
        "small.fastq",
        "small.fastq",
    )


def test_custom_bisulfite_2(tmp_path):
    run_trim(
        tmp_path,
        "-b TTAGACATATCTCCGTCG -q 0,0 --bisulfite 15,15,1,1",
        "small_mincut1.fastq",
        "small.fastq",
    )


def test_custom_bisulfite_3(tmp_path):
    run_trim(
        tmp_path,
        "-b TTAGACATATCTCCGTCG -q 0,0 --bisulfite 2,2,1,0",
        "small_mincut2.fastq",
        "small.fastq",
    )


def test_custom_bisulfite_4(tmp_path):
    run_trim(
        tmp_path,
        "-b TTAGACATATCTCCGTCG -q 0,0 --bisulfite 2,2,0,0",
        "small_mincut3.fastq",
        "small.fastq",
    )


def test_no_args():
    assert execute_cli() != 0


def test_two_fastqs_errors():
    with pytest.raises(SystemExit):
        get_command("trim").execute(
            ["-pe1", datapath("paired.1.fastq"), "-pe2", datapath("paired.2.fastq")]
        )


def test_qualfile_only():
    """A .qual file without its FASTA mate is a usage error
    (reference ``tests/test_atropos.py:445``)."""
    with pytest.raises(SystemExit):
        get_command("trim").execute(["-sq", datapath("E3M.qual")])


def test_quiet_is_quiet(tmp_path):
    """--quiet must print nothing to stdout or stderr
    (reference ``tests/test_atropos.py:601``)."""
    import io
    import sys

    captured_out = io.StringIO()
    captured_err = io.StringIO()
    old_stdout, old_stderr = sys.stdout, sys.stderr
    sys.stdout, sys.stderr = captured_out, captured_err
    try:
        execute_cli(
            [
                "-o", "/dev/null", "--quiet", "-a", "XXXX",
                "-se", datapath("illumina.fastq.gz"),
                "--adapter-cache-file", str(tmp_path / ".adapters"),
                "--report-file", str(tmp_path / "report.txt"),
            ]
        )
    finally:
        sys.stdout, sys.stderr = old_stdout, old_stderr
    assert captured_out.getvalue() == ""
    assert captured_err.getvalue() == ""


def test_sra(tmp_path):
    """Stream reads straight from an SRA accession
    (reference ``tests/test_atropos.py:680``). Needs srastream + network."""
    pytest.importorskip("srastream")
    import socket

    try:
        socket.create_connection(("www.ncbi.nlm.nih.gov", 443), timeout=5).close()
    except OSError:
        pytest.skip("no network access")
    run_trim(
        tmp_path,
        "-b CTGGAGTTCAGACGTGTGCTCT --max-reads 100",
        "SRR2040662_trimmed.fq",
        sra_accn="SRR2040662",
    )


def test_sra_stubbed_reader(tmp_path, monkeypatch):
    """Drive the -sra accession path end-to-end with a stub srastream
    module (the real library needs network; the stub proves OUR wiring:
    _open_sra, SraSequenceReader, paired detection, finish()). Output
    must equal trimming the same records from a plain FASTQ."""
    import sys
    import types

    records = [
        ("r{}".format(i), "ACGT" * 10 + "TTAGACATATCTCCGTCG", "I" * 58)
        for i in range(20)
    ]

    class FakeSraReader:
        paired = False
        finished = 0

        def __init__(self, accession, batch_size=1000):
            self.accession = accession

        def start(self):
            pass

        def finish(self):
            FakeSraReader.finished += 1

        def __iter__(self):
            return iter([[rec] for rec in records])

    fake = types.ModuleType("srastream")
    fake.SraReader = FakeSraReader
    monkeypatch.setitem(sys.modules, "srastream", fake)

    out_sra = str(tmp_path / "sra.fastq")
    retcode, summary = tracked_execute(
        [
            "-b", "TTAGACATATCTCCGTCG",
            "-sra", "FAKE000", "-o", out_sra,
            "--no-cache-adapters", "--no-default-adapters", "--quiet",
            "--report-file", str(tmp_path / "r1.txt"),
        ]
    )
    assert retcode == 0
    assert FakeSraReader.finished == 1

    # same records from a plain FASTQ must trim identically
    plain = str(tmp_path / "plain.fastq")
    with open(plain, "w") as fh:
        for name, seq, qual in records:
            fh.write("@{}\n{}\n+\n{}\n".format(name, seq, qual))
    out_plain = str(tmp_path / "plain-out.fastq")
    retcode, _ = tracked_execute(
        [
            "-b", "TTAGACATATCTCCGTCG",
            "-se", plain, "-o", out_plain,
            "--no-cache-adapters", "--no-default-adapters", "--quiet",
            "--report-file", str(tmp_path / "r2.txt"),
        ]
    )
    assert retcode == 0
    assert open(out_sra).read() == open(out_plain).read()

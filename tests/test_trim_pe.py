"""Paired-end trim conformance tests against the upstream golden files
(cases from ``/root/reference/tests/test_paired.py``), parametrized over
both the adapter-match and insert-match aligners."""
import gzip
import os
import shutil

import pytest

from atropos_tpu.commands import execute_cli, get_command

from .conformance_utils import (
    assert_files_equal,
    cutpath,
    datapath,
    run_trim,
    tracked_execute,
)

BACK_ALIGNERS = ("adapter", "insert")


def run_paired(
    params,
    in1,
    in2,
    expected1,
    expected2,
    tmp_path,
    aligners=("adapter",),
    callback=None,
    check_files=True,
    datadir=True,
):
    if isinstance(params, str):
        params = params.split()
    for aligner in aligners:
        p1 = str(tmp_path / ("tmp1-" + expected1.format(aligner=aligner)))
        p2 = str(tmp_path / ("tmp2-" + expected2.format(aligner=aligner)))
        p = params.copy()
        p += ["--aligner", aligner, "-o", p1, "-p", p2]
        if datadir:
            infiles = [datapath(i.format(aligner=aligner)) for i in (in1, in2)]
        else:
            infiles = [i.format(aligner=aligner) for i in (in1, in2)]
        for infile_args in zip(("-pe1", "-pe2"), infiles):
            p.extend(infile_args)
        p += ["--adapter-cache-file", str(tmp_path / ".adapters")]
        p += ["--report-file", str(tmp_path / "report.txt"), "--quiet"]
        result = tracked_execute(p)
        assert isinstance(result, tuple)
        assert len(result) == 2
        err = (
            result[1]["exception"]
            if result[1] and "exception" in result[1]
            else None
        )
        if result[0] != 0:
            if err is None:
                raise AssertionError("Return code {} != 0".format(result[0]))
            raise AssertionError(
                "Return code {} != 0".format(result[0])
            ) from err["details"][1]
        if check_files:
            assert_files_equal(cutpath(expected1.format(aligner=aligner)), p1)
            assert_files_equal(cutpath(expected2.format(aligner=aligner)), p2)
        if callback:
            callback(aligner, infiles, (p1, p2), result)


def run_interleaved(params, inpath, expected, tmp_path, aligners=("adapter",)):
    if isinstance(params, str):
        params = params.split()
    for aligner in aligners:
        tmp = str(tmp_path / expected.format(aligner=aligner))
        p = params.copy()
        p += [
            "--aligner", aligner,
            "-l", datapath(inpath.format(aligner=aligner)),
            "-L", tmp,
            "--adapter-cache-file", str(tmp_path / ".adapters"),
            "--report-file", str(tmp_path / "report.txt"), "--quiet",
        ]
        command = get_command("trim")
        result = command.execute(p)
        assert isinstance(result, tuple)
        assert result[0] == 0
        assert_files_equal(cutpath(expected.format(aligner=aligner)), tmp)


def test_paired_separate(tmp_path):
    run_trim(tmp_path, "-a TTAGACATAT", "paired-separate.1.fastq", "paired.1.fastq")
    run_trim(tmp_path, "-a CAGTGGAGTA", "paired-separate.2.fastq", "paired.2.fastq")


def test_paired_end_legacy(tmp_path):
    run_paired(
        "-a TTAGACATAT -m 14",
        in1="paired.1.fastq",
        in2="paired.2.fastq",
        expected1="paired.m14.1.fastq",
        expected2="paired.m14.2.fastq",
        tmp_path=tmp_path,
    )


def test_untrimmed_paired_output(tmp_path):
    untrimmed1 = str(tmp_path / "tmp-untrimmed.1.fastq")
    untrimmed2 = str(tmp_path / "tmp-untrimmed.2.fastq")

    def callback(aligner, infiles, outfiles, result):
        assert_files_equal(cutpath("paired-untrimmed.1.fastq"), untrimmed1)
        assert_files_equal(cutpath("paired-untrimmed.2.fastq"), untrimmed2)

    run_paired(
        [
            "-a", "TTAGACATAT",
            "--untrimmed-output", untrimmed1,
            "--untrimmed-paired-output", untrimmed2,
        ],
        in1="paired.1.fastq",
        in2="paired.2.fastq",
        expected1="paired-trimmed.1.fastq",
        expected2="paired-trimmed.2.fastq",
        tmp_path=tmp_path,
        callback=callback,
    )


def test_explicit_format_with_paired(tmp_path):
    txt1 = str(tmp_path / "paired.1.txt")
    txt2 = str(tmp_path / "paired.2.txt")
    shutil.copyfile(datapath("paired.1.fastq"), txt1)
    shutil.copyfile(datapath("paired.2.fastq"), txt2)
    run_paired(
        "--format=fastq -a TTAGACATAT -m 14",
        in1=txt1,
        in2=txt2,
        expected1="paired.m14.1.fastq",
        expected2="paired.m14.2.fastq",
        tmp_path=tmp_path,
        datadir=False,
    )


def test_no_trimming_legacy():
    # must not divide by zero
    execute_cli(
        [
            "-a", "XXXXX", "-o", "/dev/null", "-p", "/dev/null",
            "-pe1", datapath("paired.1.fastq"),
            "-pe2", datapath("paired.2.fastq"),
            "--no-cache-adapters", "--no-default-adapters", "--quiet",
        ]
    )


def test_no_trimming():
    execute_cli(
        [
            "-a", "XXXXX", "-A", "XXXXX", "-o", "/dev/null", "-p", "/dev/null",
            "-pe1", datapath("paired.1.fastq"),
            "-pe2", datapath("paired.2.fastq"),
            "--no-cache-adapters", "--no-default-adapters", "--quiet",
        ]
    )


def test_first_too_short(tmp_path):
    trunc1 = str(tmp_path / "truncated.1.fastq")
    with open(datapath("paired.1.fastq")) as infile:
        lines = infile.readlines()[:-4]
    with open(trunc1, "w") as out:
        out.writelines(lines)
    command = get_command("trim")
    retcode, _ = command.execute(
        [
            "-a", "XX",
            "-o", str(tmp_path / "out1.fastq"),
            "-p", str(tmp_path / "out2.fastq"),
            "-pe1", trunc1, "-pe2", datapath("paired.2.fastq"),
            "--no-cache-adapters", "--no-default-adapters", "--quiet",
            "--report-file", str(tmp_path / "r.txt"),
        ]
    )
    assert retcode != 0


def test_second_too_short(tmp_path):
    trunc2 = str(tmp_path / "truncated.2.fastq")
    with open(datapath("paired.2.fastq")) as infile:
        lines = infile.readlines()[:-4]
    with open(trunc2, "w") as out:
        out.writelines(lines)
    command = get_command("trim")
    retcode, _ = command.execute(
        [
            "-a", "XX",
            "-o", str(tmp_path / "out1.fastq"),
            "-p", str(tmp_path / "out2.fastq"),
            "-pe1", datapath("paired.1.fastq"), "-pe2", trunc2,
            "--no-cache-adapters", "--no-default-adapters", "--quiet",
            "--report-file", str(tmp_path / "r.txt"),
        ]
    )
    assert retcode != 0


def test_unmatched_read_names(tmp_path):
    swapped = str(tmp_path / "swapped.1.fastq")
    with open(datapath("paired.1.fastq")) as infile:
        lines = infile.readlines()
        lines = lines[0:4] + lines[8:12] + lines[4:8] + lines[12:]
    with open(swapped, "w") as out:
        out.writelines(lines)
    command = get_command("trim")
    result = command.execute(
        [
            "-a", "XX",
            "-o", str(tmp_path / "out1.fastq"),
            "-p", str(tmp_path / "out2.fastq"),
            "-pe1", swapped, "-pe2", datapath("paired.2.fastq"),
            "--no-cache-adapters", "--no-default-adapters", "--quiet",
            "--report-file", str(tmp_path / "r.txt"),
        ]
    )
    assert result[0] != 0


def test_legacy_minlength(tmp_path):
    """-m must not apply to read2 in legacy mode."""
    run_paired(
        "-a XXX -m 27",
        in1="paired.1.fastq",
        in2="paired.2.fastq",
        expected1="paired-m27.1.fastq",
        expected2="paired-m27.2.fastq",
        tmp_path=tmp_path,
    )


def test_paired_end(tmp_path):
    run_paired(
        "-a TTAGACATAT -A CAGTGGAGTA -m 14",
        in1="paired.1.fastq",
        in2="paired.2.fastq",
        expected1="paired_{aligner}.1.fastq",
        expected2="paired_{aligner}.2.fastq",
        tmp_path=tmp_path,
        aligners=BACK_ALIGNERS,
    )


def test_paired_anchored_back_no_indels(tmp_path):
    run_paired(
        "-a BACKADAPTER$ -A BACKADAPTER$ -N --no-indels",
        in1="anchored-back.fasta",
        in2="anchored-back.fasta",
        expected1="anchored-back.fasta",
        expected2="anchored-back.fasta",
        tmp_path=tmp_path,
    )


def test_paired_end_qualtrim(tmp_path):
    run_paired(
        "-q 20 -a TTAGACATAT -A CAGTGGAGTA -m 14 -M 90",
        in1="paired.1.fastq",
        in2="paired.2.fastq",
        expected1="pairedq.1.fastq",
        expected2="pairedq.2.fastq",
        tmp_path=tmp_path,
        aligners=BACK_ALIGNERS,
    )


def test_paired_end_qualtrim_swapped(tmp_path):
    run_paired(
        "-q 20 -a CAGTGGAGTA -A TTAGACATAT -m 14 --adapter-max-rmp 0.001",
        in1="paired.2.fastq",
        in2="paired.1.fastq",
        expected1="pairedq.2.fastq",
        expected2="pairedq.1.fastq",
        tmp_path=tmp_path,
        aligners=BACK_ALIGNERS,
    )


def test_paired_end_cut(tmp_path):
    run_paired(
        "-u 3 -u -1 -U 4 -U -2",
        in1="paired.1.fastq",
        in2="paired.2.fastq",
        expected1="pairedu.1.fastq",
        expected2="pairedu.2.fastq",
        tmp_path=tmp_path,
    )


def test_paired_end_A_only(tmp_path):
    run_paired(
        "-A CAGTGGAGTA",
        in1="paired.1.fastq",
        in2="paired.2.fastq",
        expected1="paired-onlyA.1.fastq",
        expected2="paired-onlyA.2.fastq",
        tmp_path=tmp_path,
    )


def test_paired_end_mask_adapter(tmp_path):
    run_paired(
        "-a CAAG -A TCGA -n 3 --mask-adapter",
        in1="back_repeat.1.fastq",
        in2="back_repeat.2.fastq",
        expected1="back_repeat.1.fastq",
        expected2="back_repeat.2.fastq",
        tmp_path=tmp_path,
        aligners=BACK_ALIGNERS,
    )


def test_discard_untrimmed(tmp_path):
    run_paired(
        "-a CTCCAGCTTAGACATATC -A XXXXXXXX --discard-untrimmed",
        in1="paired.1.fastq",
        in2="paired.2.fastq",
        expected1="empty.fastq",
        expected2="empty.fastq",
        tmp_path=tmp_path,
    )


def test_discard_trimmed(tmp_path):
    run_paired(
        "-A C -O 1 --discard-trimmed",
        in1="paired.1.fastq",
        in2="paired.2.fastq",
        expected1="empty.fastq",
        expected2="empty.fastq",
        tmp_path=tmp_path,
    )


def test_interleaved(tmp_path):
    run_interleaved(
        "-q 20 -a TTAGACATAT -A CAGTGGAGTA -m 14 -M 90",
        inpath="interleaved.fastq",
        expected="interleaved.fastq",
        tmp_path=tmp_path,
        aligners=BACK_ALIGNERS,
    )


def test_pair_filter(tmp_path):
    run_paired(
        "--pair-filter=both -a TTAGACATAT -A GGAGTA -m 14",
        in1="paired.1.fastq",
        in2="paired.2.fastq",
        expected1="paired-filterboth_{aligner}.1.fastq",
        expected2="paired-filterboth_{aligner}.2.fastq",
        tmp_path=tmp_path,
        aligners=BACK_ALIGNERS,
    )


def test_too_short_paired_output(tmp_path):
    p1 = str(tmp_path / "temp-too-short.1.fastq")
    p2 = str(tmp_path / "temp-too-short.2.fastq")

    def callback(aligner, infiles, outfiles, result):
        assert_files_equal(cutpath("paired-too-short.1.fastq"), p1)
        assert_files_equal(cutpath("paired-too-short.2.fastq"), p2)

    run_paired(
        "-a TTAGACATAT -A CAGTGGAGTA -m 14 --too-short-output "
        "{0} --too-short-paired-output {1}".format(p1, p2),
        in1="paired.1.fastq",
        in2="paired.2.fastq",
        expected1="paired_{aligner}.1.fastq",
        expected2="paired_{aligner}.2.fastq",
        tmp_path=tmp_path,
        aligners=BACK_ALIGNERS,
        callback=callback,
    )


def test_too_long_output(tmp_path):
    p1 = str(tmp_path / "temp-too-long.1.fastq")
    p2 = str(tmp_path / "temp-too-long.2.fastq")

    def callback(aligner, infiles, outfiles, result):
        assert_files_equal(
            cutpath("paired_{aligner}.1.fastq".format(aligner=aligner)), p1
        )
        assert_files_equal(
            cutpath("paired_{aligner}.2.fastq".format(aligner=aligner)), p2
        )

    run_paired(
        "-a TTAGACATAT -A CAGTGGAGTA -M 14 --too-long-output "
        "{0} --too-long-paired-output {1}".format(p1, p2),
        in1="paired.1.fastq",
        in2="paired.2.fastq",
        expected1="paired-too-short.1.fastq",
        expected2="paired-too-short.2.fastq",
        tmp_path=tmp_path,
        aligners=BACK_ALIGNERS,
        callback=callback,
    )


def test_too_short_output_paired_option_missing(tmp_path):
    p1 = str(tmp_path / "temp-too-short.1.fastq")
    with pytest.raises(SystemExit):
        run_paired(
            "-a TTAGACATAT -A CAGTGGAGTA -m 14 --too-short-output {0}".format(p1),
            in1="paired.1.fastq",
            in2="paired.2.fastq",
            expected1="paired.1.fastq",
            expected2="paired.2.fastq",
            tmp_path=tmp_path,
            aligners=BACK_ALIGNERS,
        )


def test_custom_bisulfite_1(tmp_path):
    run_paired(
        "-a TTAGACATAT -A CAGTGGAGTA -m 14 -q 0 --bisulfite 2,2,1,1",
        in1="paired_bis_{aligner}.1.fastq",
        in2="paired_bis_{aligner}.2.fastq",
        expected1="paired_bis1_{aligner}.1.fastq",
        expected2="paired_bis1_{aligner}.2.fastq",
        tmp_path=tmp_path,
        aligners=BACK_ALIGNERS,
    )


def test_custom_bisulfite_2(tmp_path):
    run_paired(
        "-a TTAGACATAT -A CAGTGGAGTA -m 10 -q 0 --bisulfite 20,20,1,1;0,0,0,0",
        in1="paired_bis_{aligner}.1.fastq",
        in2="paired_bis_{aligner}.2.fastq",
        expected1="paired_bis2_{aligner}.1.fastq",
        expected2="paired_bis2_{aligner}.2.fastq",
        tmp_path=tmp_path,
        aligners=BACK_ALIGNERS,
    )


def test_no_insert_match(tmp_path):
    run_paired(
        "-a AGATCGGAAGAGCACACGTCTGAACTCCAGTCACCAGATCATCTCGTATGCCGTCTTCTGCTTG "
        "-A AGATCGGAAGAGCGTCGTGTAGGGAAAGAGTGTAGATCTCGGTGGTCGCCGTATCATT "
        "-e 0.3 --adapter-max-rmp 0.001 -m 25 -q 0 --trim-n",
        in1="insert.1.fastq",
        in2="insert.2.fastq",
        expected1="insert.1.fastq",
        expected2="insert.2.fastq",
        tmp_path=tmp_path,
        aligners=("insert",),
    )


def test_overwrite(tmp_path):
    run_paired(
        "-w 10,30,10",
        in1="lowq.fastq",
        in2="highq.fastq",
        expected1="lowq.fastq",
        expected2="highq.fastq",
        tmp_path=tmp_path,
    )


def test_no_writer_process(tmp_path):
    def check_multifile(aligner, infiles, outfiles, result):
        tmpdir = os.path.dirname(outfiles[0])
        # at least one worker shard pair must exist
        assert any(
            os.path.exists(os.path.join(tmpdir, "tmp1-out.1.{}.fastq".format(i)))
            and os.path.exists(os.path.join(tmpdir, "tmp2-out.2.{}.fastq".format(i)))
            for i in range(3)
        )

    run_paired(
        "--threads 3 --no-writer-process --batch-size 1 "
        "-a AGATCGGAAGAGCACACGTCTGAACTCCAGTCACACAGTGATCTCGTATGCCGTCTTCTGCTTG "
        "-A AGATCGGAAGAGCGTCGTGTAGGGAAAGAGTGTAGATCTCGGTGGTCGCCGTATCATT",
        in1="big.1.fq",
        in2="big.2.fq",
        expected1="out.1.fastq",
        expected2="out.2.fastq",
        tmp_path=tmp_path,
        aligners=BACK_ALIGNERS,
        check_files=False,
        callback=check_multifile,
    )


def test_parallel_matches_serial(tmp_path):
    """--threads output must equal serial output when shards are merged."""
    adapter_args = [
        "-a", "AGATCGGAAGAGCACACGTCTGAACTCCAGTCACACAGTGATCTCGTATGCCGTCTTCTGCTTG",
        "-A", "AGATCGGAAGAGCGTCGTGTAGGGAAAGAGTGTAGATCTCGGTGGTCGCCGTATCATT",
    ]
    serial1 = str(tmp_path / "serial.1.fastq")
    serial2 = str(tmp_path / "serial.2.fastq")
    par1 = str(tmp_path / "par.1.fastq")
    par2 = str(tmp_path / "par.2.fastq")
    common = [
        "-pe1", datapath("big.1.fq"), "-pe2", datapath("big.2.fq"),
        "--no-cache-adapters", "--no-default-adapters", "--quiet",
        "--report-file", str(tmp_path / "r.txt"),
    ]
    command = get_command("trim")
    assert command.execute(adapter_args + ["-o", serial1, "-p", serial2] + common)[0] == 0
    assert (
        command.execute(
            adapter_args + ["--threads", "2", "-o", par1, "-p", par2] + common
        )[0]
        == 0
    )
    with open(serial1) as fh:
        serial1_data = fh.read()
    with open(par1) as fh:
        par1_data = fh.read()
    assert serial1_data == par1_data


def test_summary(tmp_path):
    def check_summary(aligner, infiles, outfiles, result):
        summary = result[1]
        assert summary is not None
        assert isinstance(summary, dict)
        assert summary["command"] == "trim"
        assert summary["sample_id"] == "big"
        assert summary["mode"] == "parallel"
        assert summary["threads"] == 2
        assert summary["record_counts"] == {0: 100}
        assert summary["bp_counts"] == {0: [12500, 12500]}
        assert "timing" in summary
        assert summary["timing"]["wallclock"] > 0
        assert summary["timing"]["cpu"] > 0

    run_paired(
        "--threads 2 "
        "-a AGATCGGAAGAGCACACGTCTGAACTCCAGTCACACAGTGATCTCGTATGCCGTCTTCTGCTTG "
        "-A AGATCGGAAGAGCGTCGTGTAGGGAAAGAGTGTAGATCTCGGTGGTCGCCGTATCATT",
        in1="big.1.fq",
        in2="big.2.fq",
        expected1="out.1.fastq",
        expected2="out.2.fastq",
        tmp_path=tmp_path,
        aligners=BACK_ALIGNERS,
        check_files=False,
        callback=check_summary,
    )


def test_issue68(tmp_path):
    run_paired(
        "--error-rate 0.20 --insert-match-error-rate 0.30 --minimum-length 20 "
        "-a AGATCGGAAGAGCACACGTCTGAACTCCAGTCAC "
        "-A AGATCGGAAGAGCGTCGTGTAGGGAAAGAGTGTAGATCTCGGTGGTCGCCGTATCATT",
        in1="issue68.1.fq",
        in2="issue68.2.fq",
        expected1="issue68.1.fq",
        expected2="issue68.2.fq",
        tmp_path=tmp_path,
        aligners=["insert"],
    )


def test_issue122_empty_gz_outputs(tmp_path):
    def callback(aligner, infiles, outfiles, result):
        for out in outfiles:
            with gzip.open(out) as gz:
                assert gz.read() == b""

    run_paired(
        "--threads 2 --preserve-order --no-default-adapters "
        "-a TTAGACATAT -A CAGTGGAGTA",
        in1="empty.fastq",
        in2="empty.fastq",
        expected1="empty.fastq.gz",
        expected2="empty.fastq.gz",
        tmp_path=tmp_path,
        check_files=False,
        callback=callback,
    )


def test_missing_file(tmp_path):
    """`-p` without `-o` is a CLI error (ref tests/test_paired.py:198)."""
    with pytest.raises(SystemExit):
        get_command("trim").execute(
            [
                "-a", "XX",
                "--paired-output", str(tmp_path / "out.fastq"),
                "-pe1", datapath("paired.1.fastq"),
                "-pe2", datapath("paired.2.fastq"),
                "--quiet", "--no-cache-adapters", "--no-default-adapters",
            ]
        )


def test_interleaved_no_paired_output(tmp_path):
    """Interleaved input with read2 modifications but only a single
    non-interleaved output is a CLI error (ref tests/test_paired.py:390)."""
    with pytest.raises(SystemExit):
        get_command("trim").execute(
            [
                "-a", "XX", "-A", "XX",
                "-l", datapath("interleaved.fastq"),
                "-o", str(tmp_path / "out.1.fastq"),
                "--quiet", "--no-cache-adapters", "--no-default-adapters",
            ]
        )


def test_sra_stubbed_paired_reader(tmp_path, monkeypatch):
    """Paired -sra stream via a stub srastream reader: paired mode is
    adopted from the reader, and output equals trimming the same pairs
    from plain FASTQs."""
    import sys
    import types

    pairs = [
        (
            ("p{}".format(i), "ACGT" * 12 + "TTAGACATATCTCCGTCG", "I" * 66),
            ("p{}".format(i), "TGCA" * 12 + "CAGTGGAGTTCAGACGTG", "I" * 66),
        )
        for i in range(15)
    ]

    class FakeSraReader:
        paired = True

        def __init__(self, accession, batch_size=1000):
            pass

        def start(self):
            pass

        def finish(self):
            pass

        def __iter__(self):
            return iter([list(pair) for pair in pairs])

    fake = types.ModuleType("srastream")
    fake.SraReader = FakeSraReader
    monkeypatch.setitem(sys.modules, "srastream", fake)

    o1 = str(tmp_path / "sra.1.fastq")
    o2 = str(tmp_path / "sra.2.fastq")
    retcode, summary = tracked_execute(
        [
            "-b", "TTAGACATATCTCCGTCG", "-B", "CAGTGGAGTTCAGACGTG",
            "-sra", "FAKE001", "-o", o1, "-p", o2,
            "--no-cache-adapters", "--no-default-adapters", "--quiet",
            "--report-file", str(tmp_path / "r1.txt"),
        ]
    )
    assert retcode == 0

    in1 = str(tmp_path / "plain.1.fastq")
    in2 = str(tmp_path / "plain.2.fastq")
    with open(in1, "w") as f1, open(in2, "w") as f2:
        for frag1, frag2 in pairs:
            f1.write("@{}\n{}\n+\n{}\n".format(*frag1))
            f2.write("@{}\n{}\n+\n{}\n".format(*frag2))
    p1 = str(tmp_path / "plain-out.1.fastq")
    p2 = str(tmp_path / "plain-out.2.fastq")
    retcode, _ = tracked_execute(
        [
            "-b", "TTAGACATATCTCCGTCG", "-B", "CAGTGGAGTTCAGACGTG",
            "-pe1", in1, "-pe2", in2, "-o", p1, "-p", p2,
            "--no-cache-adapters", "--no-default-adapters", "--quiet",
            "--report-file", str(tmp_path / "r2.txt"),
        ]
    )
    assert retcode == 0
    assert open(o1).read() == open(p1).read()
    assert open(o2).read() == open(p2).read()

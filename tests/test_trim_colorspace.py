"""Colorspace conformance tests (cases from the upstream
``tests/test_colorspace.py``)."""
from atropos_tpu.commands import get_command
from atropos_tpu.util.colorspace import decode, encode

from .conformance_utils import datapath, run_trim

SEQUENCES = [
    "",
    "C",
    "ACGGTC",
    "TN",
    "TN.",
    "TNN.N",
    "CCGGCAGCATTCATTACGACAACGTGGCACCGTGTTTTCTCGGTGGTA",
    "TGCAGTTGATGATCGAAGAAAACGACATCATCAGCCAGCAAGTGC",
    "CAGGGTTTGATGAGTGGCTGTGGGTGCTGGCGTATCCGGG",
]


def test_encode():
    assert encode("AA") == "A0"
    assert encode("AC") == "A1"
    assert encode("AG") == "A2"
    assert encode("AT") == "A3"
    assert encode("CA") == "C1"
    assert encode("CC") == "C0"
    assert encode("CG") == "C3"
    assert encode("CT") == "C2"
    assert encode("GA") == "G2"
    assert encode("GC") == "G3"
    assert encode("GG") == "G0"
    assert encode("GT") == "G1"
    assert encode("TA") == "T3"
    assert encode("TC") == "T2"
    assert encode("TG") == "T1"
    assert encode("TT") == "T0"
    assert encode("TN") == "T4"
    assert encode("NT") == "N4"
    assert encode("NN") == "N4"
    assert encode("ACGGTC") == "A13012"
    assert encode("TTT.N") == "T0044"
    assert encode("TTNT.N") == "T04444"


def test_decode():
    for s in SEQUENCES:
        expected = s.replace(".", "N")
        assert decode(encode(s)) == expected
    assert decode("A.") == "AN"
    assert decode("C.") == "CN"
    assert decode("G.") == "GN"
    assert decode("T.") == "TN"


def test_qualtrim_csfastaqual(tmp_path):
    run_trim(
        tmp_path, "-c -q 10", "solidqual.fastq", "solid.csfasta",
        qualfile="solid.qual",
    )


def test_E3M(tmp_path):
    command = get_command("trim")
    retcode, _ = command.execute(
        [
            "-o", "/dev/null",
            "-se", datapath("E3M.fasta"), "-sq", datapath("E3M.qual"),
            "--no-cache-adapters", "--no-default-adapters", "--quiet",
            "--report-file", str(tmp_path / "r.txt"),
        ]
    )
    assert retcode == 0


def test_bwa(tmp_path):
    run_trim(
        tmp_path,
        "-c -e 0.12 -a 330201030313112312 -x 552: --maq",
        "solidmaq.fastq",
        "solid.csfasta",
        qualfile="solid.qual",
    )


def test_bfast(tmp_path):
    run_trim(
        tmp_path,
        "-c -e 0.12 -a 330201030313112312 -x abc: --strip-f3",
        "solidbfast.fastq",
        "solid.csfasta",
        qualfile="solid.qual",
    )


def test_trim_095(tmp_path):
    run_trim(tmp_path, "-c -e 0.122 -a 330201030313112312", "solid.fasta", "solid.fasta")


def test_solid(tmp_path):
    run_trim(tmp_path, "-c -e 0.122 -a 330201030313112312", "solid.fastq", "solid.fastq")


def test_solid_basespace_adapter(tmp_path):
    run_trim(
        tmp_path, "-c -e 0.122 -a CGCCTTGGCCGTACAGCAG", "solid.fastq", "solid.fastq"
    )


def test_solid5p(tmp_path):
    run_trim(
        tmp_path,
        "-c -e 0.1 --trim-primer -g CCGGAGGTCAGCTCGCTATA",
        "solid5p.fasta",
        "solid5p.fasta",
    )


def test_solid5p_prefix_notrim(tmp_path):
    run_trim(
        tmp_path,
        "-c -e 0.1 -g ^CCGGAGGTCAGCTCGCTATA",
        "solid5p-anchored.notrim.fasta",
        "solid5p.fasta",
    )


def test_solid5p_prefix(tmp_path):
    run_trim(
        tmp_path,
        "-c -e 0.1 --trim-primer -g ^CCGGAGGTCAGCTCGCTATA",
        "solid5p-anchored.fasta",
        "solid5p.fasta",
    )


def test_solid5p_fastq(tmp_path):
    run_trim(
        tmp_path,
        "-c -e 0.1 --trim-primer -g CCGGAGGTCAGCTCGCTATA",
        "solid5p.fastq",
        "solid5p.fastq",
    )


def test_solid5p_prefix_notrim_fastq(tmp_path):
    run_trim(
        tmp_path,
        "-c -e 0.1 -g ^CCGGAGGTCAGCTCGCTATA",
        "solid5p-anchored.notrim.fastq",
        "solid5p.fastq",
    )


def test_solid5p_prefix_fastq(tmp_path):
    run_trim(
        tmp_path,
        "-c -e 0.1 --trim-primer -g ^CCGGAGGTCAGCTCGCTATA",
        "solid5p-anchored.fastq",
        "solid5p.fastq",
    )


def test_sra_fastq(tmp_path):
    run_trim(
        tmp_path,
        "-c -e 0.1 --format sra-fastq -a CGCCTTGGCCGTACAGCAG",
        "sra.fastq",
        "sra.fastq",
    )


def test_no_zero_cap(tmp_path):
    run_trim(
        tmp_path,
        "--no-zero-cap -c -e 0.122 -a CGCCTTGGCCGTACAGCAG",
        "solid-no-zerocap.fastq",
        "solid.fastq",
    )

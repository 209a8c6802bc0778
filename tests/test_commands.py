"""Tests for the qc, error, and detect commands."""
import pytest

from atropos_tpu.commands import get_command

from .conformance_utils import datapath


def _common(tmp_path):
    return [
        "--no-cache-adapters",
        "--report-file", str(tmp_path / "out.txt"),
        "--quiet",
    ]


def test_qc_single(tmp_path):
    retcode, summary = get_command("qc").execute(
        ["-se", datapath("simple.fastq"), "-o", str(tmp_path / "qc.txt")]
        + ["--quiet"]
    )
    assert retcode == 0
    stats = summary["pre"][0]["read1"]
    assert stats["counts"] == 2
    assert stats["lengths"]["hist"] == {9: 2}
    assert (tmp_path / "qc.txt").exists()


def test_qc_paired(tmp_path):
    retcode, summary = get_command("qc").execute(
        [
            "-pe1", datapath("paired.1.fastq"),
            "-pe2", datapath("paired.2.fastq"),
            "-o", str(tmp_path / "qc.txt"), "--quiet",
        ]
    )
    assert retcode == 0
    stats = summary["pre"][0]
    assert stats["read1"]["counts"] == 4
    assert stats["read2"]["counts"] == 4


def test_qc_json(tmp_path):
    import json

    out = str(tmp_path / "qc.json")
    retcode, _ = get_command("qc").execute(
        ["-se", datapath("simple.fastq"), "-o", out, "--quiet"]
    )
    assert retcode == 0
    data = json.load(open(out))
    assert data["pre"]["0"]["read1"]["counts"] == 2


def test_error_single(tmp_path):
    retcode, summary = get_command("error").execute(
        ["-se", datapath("lowqual.fastq"), "-o", str(tmp_path / "err.txt"),
         "--quiet"]
    )
    assert retcode == 0
    estimate = summary["errorrate"]["estimate"][0]
    assert 0 < estimate < 1
    text = (tmp_path / "err.txt").read_text()
    assert "Error rate" in text


def test_error_paired(tmp_path):
    retcode, summary = get_command("error").execute(
        [
            "-pe1", datapath("paired.1.fastq"),
            "-pe2", datapath("paired.2.fastq"),
            "-o", str(tmp_path / "err.txt"), "--quiet",
        ]
    )
    assert retcode == 0
    estimates = summary["errorrate"]["estimate"]
    assert len(estimates) == 2
    text = (tmp_path / "err.txt").read_text()
    assert "Overall" in text


def test_error_requires_qualities(tmp_path):
    retcode, summary = get_command("error").execute(
        ["-se", datapath("simple.fasta"), "-o", str(tmp_path / "err.txt"),
         "--quiet"]
    )
    assert retcode != 0


def test_detect_heuristic(tmp_path):
    """Detect the TruSeq adapter planted in the 'big' fixture reads."""
    retcode, summary = get_command("detect").execute(
        [
            "-se", datapath("big.1.fq"),
            "-d", "heuristic",
            "-o", str(tmp_path / "det.txt"),
            "--no-default-contaminants", "--no-cache-contaminants",
            "-x", "TruSeq=AGATCGGAAGAGCACACGTCTGAACTCCAGTCACACAGTGATCTCGTATGCC",
            "--quiet",
        ]
    )
    assert retcode == 0
    matches = summary["detect"]["matches"][0]
    assert len(matches) > 0
    # the planted adapter should be found and identified as known
    assert any(m["is_known"] for m in matches)
    text = (tmp_path / "det.txt").read_text()
    assert "Detected" in text


def test_detect_known(tmp_path):
    retcode, summary = get_command("detect").execute(
        [
            "-se", datapath("big.1.fq"),
            "-d", "known",
            "-i", "known",
            "-o", str(tmp_path / "det.txt"),
            "--no-default-contaminants", "--no-cache-contaminants",
            "-x", "TruSeq=AGATCGGAAGAGCACACGTCTGAACTCCAGTCACACAGTGATCTCGTATGCC",
            "--quiet",
        ]
    )
    assert retcode == 0
    matches = summary["detect"]["matches"][0]
    assert all(m["is_known"] for m in matches)


def test_detect_khmer_fallback(tmp_path):
    """The kmer detector must work without the khmer library installed."""
    retcode, summary = get_command("detect").execute(
        [
            "-se", datapath("big.1.fq"),
            "-d", "khmer",
            "-o", str(tmp_path / "det.txt"),
            "--no-default-contaminants", "--no-cache-contaminants",
            "-x", "TruSeq=AGATCGGAAGAGCACACGTCTGAACTCCAGTCACACAGTGATCTCGTATGCC",
            "--quiet",
        ]
    )
    assert retcode == 0
    assert "matches" in summary["detect"]


def test_detect_paired(tmp_path):
    retcode, summary = get_command("detect").execute(
        [
            "-pe1", datapath("big.1.fq"),
            "-pe2", datapath("big.2.fq"),
            "-d", "heuristic",
            "-o", str(tmp_path / "det.txt"),
            "--no-default-contaminants", "--no-cache-contaminants",
            "--quiet",
        ]
    )
    assert retcode == 0
    assert len(summary["detect"]["matches"]) == 2


def test_detect_fasta_output(tmp_path):
    out = str(tmp_path / "det.fasta")
    retcode, summary = get_command("detect").execute(
        [
            "-se", datapath("big.1.fq"),
            "-d", "heuristic",
            "-o", out,
            "--fasta", "union",
            "--no-default-contaminants", "--no-cache-contaminants",
            "--quiet",
        ]
    )
    assert retcode == 0
    content = open(out).read()
    assert content.startswith(">")

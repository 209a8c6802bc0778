"""Legacy text-report regression tests.

Goldens in ``tests/data_reports/`` hold the deterministic portion of the
report (from the Trimming section on; the header contains timing and
absolute paths). They pin the cutadapt-style layout across refactors of
the report writer.
"""
import os

import pytest

from atropos_tpu.commands import get_command

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "data_reports")

CASES = {
    "se_stats": [
        "-a", "TTAGACATATCTCCGTCG", "-q", "10", "-u", "2",
        "-se", "{data}/small.fastq",
        "--stats", "both", "-m", "10", "-M", "90", "--max-n", "5",
    ],
    "pe_insert": [
        "-a", "TTAGACATAT", "-A", "CAGTGGAGTA", "-m", "14",
        "--aligner", "insert", "--correct-mismatches", "liberal",
        "-pe1", "{data}/paired.1.fastq", "-pe2", "{data}/paired.2.fastq",
    ],
    "linked": [
        "-a", "AAAAAAAAAA...TTTTTTTTTT", "-se", "{data}/linked.fasta",
    ],
    "anywhere": [
        "-b", "TTAGACATATCTCCGTCG", "--stats", "pre:tiles",
        "-se", "{data}/nextseq.fastq",
    ],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_report_matches_golden(tmp_path, name, monkeypatch):
    import itertools

    from .conformance_utils import CONFORMANCE_DIR
    from atropos_tpu.adapters import parser as adapter_parser

    # unnamed adapters are numbered by a process-global counter; pin it so
    # the golden's "Adapter 1" headers reproduce regardless of test order
    monkeypatch.setattr(adapter_parser, "_ADAPTER_IDS", itertools.count(1))

    data = os.path.join(CONFORMANCE_DIR, "data")
    report = str(tmp_path / "report.txt")
    argv = [arg.format(data=data) for arg in CASES[name]]
    suffix = ".fasta" if name == "linked" else ".fq"
    argv += [
        "-o", str(tmp_path / ("out" + suffix)),
        "--no-cache-adapters", "--no-default-adapters", "--quiet",
        "--report-file", report,
    ]
    if "-pe2" in argv:
        argv += ["-p", str(tmp_path / "out.2.fq")]
    retcode, summary = get_command("trim").execute(argv)
    assert retcode == 0, summary.get("exception")

    text = open(report).read()
    marker = "--------\nTrimming\n--------"
    start = text.find(marker)
    assert start > 0
    with open(os.path.join(GOLDEN_DIR, name + ".txt")) as fh:
        assert text[start:] == fh.read()

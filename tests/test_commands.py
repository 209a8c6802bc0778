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


def test_template_report(tmp_path):
    """A report-file extension without a builtin renderer resolves to a
    Jinja2 template named template.<ext> on the search path."""
    from atropos_tpu.commands import get_command

    tpl_dir = tmp_path / "tpl"
    tpl_dir.mkdir()
    (tpl_dir / "template.mini").write_text(
        "records={{ summary.total_record_count }}\n"
    )
    command = get_command("trim")
    options = command.parse_args([
        "-a", "TTAGACATATCTCCGTCG", "-se", datapath("small.fastq"),
        "-o", str(tmp_path / "out.fq"), "--no-cache-adapters",
        "--no-default-adapters", "--quiet",
        "--report-file", str(tmp_path / "rep.mini"),
    ])
    retcode, summary = command.run_command(options)
    assert retcode == 0
    generator = command.report_generator_class(options)
    generator.report_args = tuple(
        {"template_paths": [str(tpl_dir)]} for _ in generator.report_formats
    )
    generator.generate_reports(summary)
    assert (tmp_path / "rep.mini").read_text().startswith("records=3")


def test_template_report_missing_template(tmp_path):
    from atropos_tpu.commands import get_command

    command = get_command("trim")
    options = command.parse_args([
        "-a", "TTAGACATATCTCCGTCG", "-se", datapath("small.fastq"),
        "-o", str(tmp_path / "out.fq"), "--no-cache-adapters",
        "--no-default-adapters", "--quiet",
        "--report-file", str(tmp_path / "rep.nosuch"),
    ])
    retcode, summary = command.run_command(options)
    assert retcode == 0
    with pytest.raises(IOError):
        command.report_generator_class(options).generate_reports(summary)


def test_qc_parallel_matches_serial(tmp_path):
    import re

    command = get_command("qc")
    out_s, out_p = str(tmp_path / "s.txt"), str(tmp_path / "p.txt")
    assert command.execute(
        ["-se", datapath("big.1.fq"), "-o", out_s, "--quiet"])[0] == 0
    assert command.execute(
        ["-se", datapath("big.1.fq"), "-o", out_p, "--quiet",
         "--threads", "2"])[0] == 0

    def stable(path):
        skip = re.compile(
            r"Command line|Start time|Wallclock|CPU time|threads|mode"
        )
        with open(path) as fh:
            return [line for line in fh if not skip.search(line)]

    assert stable(out_s) == stable(out_p)


def test_device_kmer_counts_match_host(monkeypatch):
    """The device-sorted k-mer counting must agree exactly with the host
    np.unique path, and the telemetry must prove the device sort ran."""
    import random

    from atropos_tpu.commands.detect import kmers

    rng = random.Random(31337)
    seqs = [
        "".join(rng.choice("ACGTN") for _ in range(70)) for _ in range(400)
    ]
    k = 12  # > _DEVICE_MIN_CODES windows total, codes fit int32

    monkeypatch.setenv("ATROPOS_TPU_DEVICE_KMERS", "0")
    host = kmers.count_corpus(seqs, k)

    monkeypatch.setenv("ATROPOS_TPU_DEVICE_KMERS", "1")
    before = kmers.DEVICE_KMER_COUNTS["batches"]
    device = kmers.count_corpus(seqs, k)
    assert kmers.DEVICE_KMER_COUNTS["batches"] > before, (
        "device k-mer counting forced but the device sort never ran"
    )
    assert host == device

    # membership variant rides the same sorted-count core
    monkeypatch.setenv("ATROPOS_TPU_DEVICE_KMERS", "0")
    host_m = kmers.count_corpus(seqs, k, with_membership=True)
    monkeypatch.setenv("ATROPOS_TPU_DEVICE_KMERS", "1")
    device_m = kmers.count_corpus(seqs, k, with_membership=True)
    assert host_m == device_m


def test_device_batch_intersections_match_host(monkeypatch):
    """The all-pairs contaminant/read intersection matrix (one device op
    for the whole panel) must agree with per-pair intersection_size, and
    the telemetry must prove the device path ran."""
    import numpy as np

    from atropos_tpu.commands.detect import kmers

    rng = np.random.default_rng(7)
    contams = [
        np.unique(rng.integers(0, 4000, size=int(n)))
        for n in rng.integers(8, 120, size=24)
    ]
    reads = [
        np.unique(rng.integers(0, 4000, size=int(n)))
        for n in rng.integers(5, 60, size=64)
    ]
    monkeypatch.setenv("ATROPOS_TPU_DEVICE_KMERS", "1")
    before = kmers.DEVICE_KMER_COUNTS["intersect_batches"]
    mat = kmers.batch_intersections(contams, reads)
    assert kmers.DEVICE_KMER_COUNTS["intersect_batches"] > before, (
        "device intersections forced but the batched op never ran"
    )
    for m_idx in range(len(contams)):
        for r_idx in range(len(reads)):
            assert mat[m_idx, r_idx] == kmers.intersection_size(
                contams[m_idx], reads[r_idx]
            )


def test_detect_khmer_countgraph_branch(tmp_path, monkeypatch):
    """Drive the khmer-importable branch of KhmerDetector with a stub
    Countgraph (ref detect/__init__.py:748 uses khmer when present; this
    environment has no khmer, so the import is faked). The stub counts
    exactly, so the result must agree with the exact-count fallback."""
    import sys
    import types

    class FakeCountgraph:
        def __init__(self, ksize, tablesize, n_tables):
            self.ksize = ksize
            self.counts = {}
            self.bigcount = False

        def set_use_bigcount(self, flag):
            self.bigcount = flag

        def consume_and_tag(self, seq):
            for i in range(len(seq) - self.ksize + 1):
                kmer = seq[i : i + self.ksize]
                self.counts[kmer] = self.counts.get(kmer, 0) + 1

        def get_tagset(self):
            return list(self.counts)

        def get(self, kmer):
            return self.counts.get(kmer, 0)

    fake_khmer = types.ModuleType("khmer")
    fake_khmer.Countgraph = FakeCountgraph
    fake_args = types.ModuleType("khmer.khmer_args")
    fake_args.DEFAULT_N_TABLES = 4
    fake_khmer.khmer_args = fake_args
    monkeypatch.setitem(sys.modules, "khmer", fake_khmer)
    monkeypatch.setitem(sys.modules, "khmer.khmer_args", fake_args)

    # synthetic heavily-contaminated input: half the reads carry the
    # adapter, so its k-mers clear the over-representation cutoff
    import random

    adapter = "AGATCGGAAGAGCACACGTCTGAACTCCAGTCACACAGTGATCTCGTATGCC"
    rng = random.Random(5)
    infile = str(tmp_path / "contaminated.fastq")
    with open(infile, "w") as out:
        for i in range(1000):
            seq = "".join(rng.choice("ACGT") for _ in range(100))
            if i % 2:
                seq = seq[:40] + adapter + seq[40:]
                seq = seq[:100]
            out.write("@r{}\n{}\n+\n{}\n".format(i, seq, "I" * len(seq)))
    args = [
        "-se", infile,
        "-d", "khmer",
        "--no-default-contaminants", "--no-cache-contaminants",
        "-x", "TruSeq=" + adapter,
        "--quiet",
    ]
    retcode, summary = get_command("detect").execute(
        args + ["-o", str(tmp_path / "det-stub.txt")]
    )
    assert retcode == 0
    stub_matches = summary["detect"]["matches"][0]
    assert stub_matches, "stubbed Countgraph branch found no matches"

    # same run without the stub: the exact-count fallback must agree
    monkeypatch.delitem(sys.modules, "khmer")
    monkeypatch.delitem(sys.modules, "khmer.khmer_args")
    retcode, summary2 = get_command("detect").execute(
        args + ["-o", str(tmp_path / "det-exact.txt")]
    )
    assert retcode == 0
    exact_matches = summary2["detect"]["matches"][0]
    assert [m["longest_kmer"] for m in stub_matches] == [
        m["longest_kmer"] for m in exact_matches
    ]


def test_qc_native_matches_record_pipeline(tmp_path):
    """The qc native-chunk fast path (parse -> collect_matrices, no
    record objects) must produce the same summary and report as the
    record pipeline, for SE and PE (incl. pair-name validation)."""
    import json
    import random
    import re

    import atropos_tpu.commands.qc as qc_mod

    rng = random.Random(7)
    in1 = str(tmp_path / "q.1.fastq")
    in2 = str(tmp_path / "q.2.fastq")
    for mate, path in ((1, in1), (2, in2)):
        gen = random.Random(7)
        with open(path, "w") as out:
            for i in range(2000):
                length = gen.randrange(3, 120)
                seq = "".join(rng.choice("ACGTN") for _ in range(length))
                qual = "".join(
                    chr(33 + rng.randint(0, 41)) for _ in range(length)
                )
                out.write(
                    "@q{}/{} x\n{}\n+\n{}\n".format(i, mate, seq, qual)
                )

    def run(args, native, tag):
        rep = str(tmp_path / "rep-{}.txt".format(tag))
        if not native:
            orig = qc_mod.CommandRunner._run_native
            qc_mod.CommandRunner._run_native = lambda self, a: None
        try:
            retcode, summary = get_command("qc").execute(
                args + ["-o", rep, "--quiet"]
            )
        finally:
            if not native:
                qc_mod.CommandRunner._run_native = orig
        assert retcode == 0, summary.get("exception")
        return summary, rep

    def clean_summary(summary):
        out = dict(summary)
        for key in ("timing", "mode", "threads", "options"):
            out.pop(key, None)
        return json.loads(json.dumps(out, default=str))

    def clean_report(path):
        drop = re.compile(
            r"Command line|Start time|Wallclock|CPU time|report|-o "
        )
        return [
            line for line in open(path).read().splitlines()
            if not drop.search(line)
        ]

    for args in (
        ["-se", in1],
        ["-pe1", in1, "-pe2", in2],
        ["-se", in1, "--max-reads", "500"],
    ):
        sn, rn = run(list(args), True, "n" + args[0])
        assert sn.get("mode") == "turbo", args
        ss, rs = run(list(args), False, "s" + args[0])
        assert clean_summary(sn) == clean_summary(ss), args
        assert clean_report(rn) == clean_report(rs), args


def test_qc_native_pair_name_mismatch(tmp_path):
    """The fast path enforces the paired-name contract like the scalar
    reader."""
    in1 = str(tmp_path / "m.1.fastq")
    in2 = str(tmp_path / "m.2.fastq")
    with open(in1, "w") as fh:
        fh.write("@a/1\nACGT\n+\nIIII\n@b/1\nACGT\n+\nIIII\n")
    with open(in2, "w") as fh:
        fh.write("@a/2\nACGT\n+\nIIII\n@zzz/2\nACGT\n+\nIIII\n")
    retcode, summary = get_command("qc").execute(
        ["-pe1", in1, "-pe2", in2,
         "-o", str(tmp_path / "r.txt"), "--quiet"]
    )
    assert retcode != 0
    assert "improperly paired" in str(summary.get("exception"))

"""Config-fuzz differentials: randomized flag combinations through the
engine-forced path vs the scalar pipeline, byte-exact.

The curated differential suites (tests/test_turbo.py) cover each feature
deliberately; this harness covers their INTERACTIONS — random mixes of
adapters (incl. linked), quality/NextSeq stages, cuts, times, filters,
overwrite and pair filters over randomized data. Whatever mode the
engine-forced run picks (turbo, batched engine, or an eligible-decline
back to serial), the outputs and the consequential summary blocks must
equal the scalar pipeline's exactly.
"""
import json
import os
import random

import pytest

from atropos_tpu import runtime
from atropos_tpu.commands import get_command

pytestmark = pytest.mark.skipif(
    not runtime.available(), reason="native runtime unavailable"
)

ADAPTER = "AGATCGGAAGAGCACACGTCTGAACTCCAGTCA"
ADAPTER2 = "AGATCGGAAGAGCGTCGTGTAGGGAAAGAGTGT"


def _write_reads(path, rng, n=250, mate=1, adapter=ADAPTER):
    with open(path, "w") as out:
        for i in range(n):
            read_len = rng.randrange(8, 110)
            seq = "".join(rng.choice("ACGTN") for _ in range(read_len))
            if read_len > 40 and rng.random() < 0.5:
                pos = rng.randrange(5, read_len - 30)
                seq = (seq[:pos] + adapter)[:read_len]
            if rng.random() < 0.1:
                seq = "A" * read_len  # homopolymer edge case
            lo, hi = rng.choice(((0, 8), (2, 40), (35, 41)))
            qual = "".join(
                chr(33 + rng.randint(lo, hi)) for _ in range(len(seq))
            )
            out.write("@f{}/{}\n{}\n+\n{}\n".format(i, mate, seq, qual))
    return path


def _random_config(rng, paired):
    parts = []
    roll = rng.random()
    linked = False
    if roll < 0.35:
        parts += ["-a", "tru=" + ADAPTER]
    elif roll < 0.5:
        parts += ["-g", "front=ACGTACGTAA"]
    elif roll < 0.6:
        parts += ["-b", "anyw=TTAGACATAT"]
    elif roll < 0.7:
        parts += ["-a", "lnk=AAAAAAAAAA...TTTTTTTTTT"]
        linked = True
    has_adapter = bool(parts)
    if paired and has_adapter and not linked and rng.random() < 0.8:
        parts += ["-A", "tru2=" + ADAPTER2]
        if parts[0] == "-a" and rng.random() < 0.5:
            parts += ["--aligner", "insert"]
    if rng.random() < 0.5:
        parts += ["-q", rng.choice(["20", "15,20", "0,10", "28"])]
    if rng.random() < 0.25:
        parts += ["--nextseq-trim", "22"]
    if rng.random() < 0.3:
        parts += ["-u", rng.choice(["3", "-4"])]
    if rng.random() < 0.3:
        parts += ["-m", "20"]
    if rng.random() < 0.2:
        parts += ["-M", "90"]
    if rng.random() < 0.2:
        parts += ["--max-n", "0.2"]
    if has_adapter and not linked and rng.random() < 0.2:
        parts += ["--times", "2"]
    if has_adapter and not linked and rng.random() < 0.15:
        parts += ["--no-indels"]
    if has_adapter and rng.random() < 0.15:
        parts += ["--discard-untrimmed"]
    if rng.random() < 0.15:
        parts += ["--trim-n"]
    if paired and rng.random() < 0.25:
        parts += ["--pair-filter", "both"]
    if paired and rng.random() < 0.3:
        parts += ["-w", "10,30,10"]
    return parts


def _execute(argv, engine):
    os.environ["ATROPOS_TPU_ENGINE"] = engine
    try:
        return get_command("trim").execute(argv)
    finally:
        os.environ.pop("ATROPOS_TPU_ENGINE", None)


def _compare_reports(rep_s, rep_t, label):
    scalar = json.load(open(rep_s))
    forced = json.load(open(rep_t))
    for key in ("total_record_count", "total_bp_counts"):
        assert forced[key] == scalar[key], (label, key)
    if "trim" in scalar:
        for key in ("modifiers", "filters", "formatters"):
            assert forced["trim"][key] == scalar["trim"][key], (label, key)


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_single_end(tmp_path, seed):
    rng = random.Random(1000 + seed)
    infile = _write_reads(str(tmp_path / "in.fastq"), rng)
    config = _random_config(rng, paired=False)
    label = " ".join(config)
    outs = {}
    reports = {}
    for tag, engine in (("s", "0"), ("e", "1")):
        out = str(tmp_path / "out-{}.fastq".format(tag))
        rep = str(tmp_path / "rep-{}.json".format(tag))
        retcode, summary = _execute(
            config + [
                "-se", infile, "-o", out,
                "--no-cache-adapters", "--no-default-adapters",
                "--report-file", rep, "--quiet",
            ],
            engine,
        )
        assert retcode == 0, (label, summary.get("exception"))
        outs[tag] = open(out).read()
        reports[tag] = rep
    assert outs["e"] == outs["s"], label
    _compare_reports(reports["s"], reports["e"], label)


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_paired(tmp_path, seed):
    rng = random.Random(2000 + seed)
    in1 = _write_reads(str(tmp_path / "in.1.fastq"), rng, mate=1)
    in2 = _write_reads(
        str(tmp_path / "in.2.fastq"),
        random.Random(2000 + seed),  # same lengths per record index
        mate=2,
        adapter=ADAPTER2,
    )
    config = _random_config(rng, paired=True)
    label = " ".join(config)
    outs = {}
    reports = {}
    for tag, engine in (("s", "0"), ("e", "1")):
        out1 = str(tmp_path / "o1-{}.fastq".format(tag))
        out2 = str(tmp_path / "o2-{}.fastq".format(tag))
        rep = str(tmp_path / "rep-{}.json".format(tag))
        retcode, summary = _execute(
            config + [
                "-pe1", in1, "-pe2", in2, "-o", out1, "-p", out2,
                "--no-cache-adapters", "--no-default-adapters",
                "--report-file", rep, "--quiet",
            ],
            engine,
        )
        assert retcode == 0, (label, summary.get("exception"))
        outs[tag] = (open(out1).read(), open(out2).read())
        reports[tag] = rep
    assert outs["e"] == outs["s"], label
    _compare_reports(reports["s"], reports["e"], label)

"""Differential tests: turbo path vs scalar pipeline (byte-exact)."""
import json
import random

import pytest

from atropos_tpu import runtime
from atropos_tpu.commands import get_command

from .conformance_utils import datapath

pytestmark = pytest.mark.skipif(
    not runtime.available(), reason="native runtime unavailable"
)

ADAPTER = "AGATCGGAAGAGCACACGTCTGAACTCCAGTCA"


def _write_synthetic(path, n=500, read_len=100, seed=11):
    rng = random.Random(seed)
    with open(path, "w") as out:
        for i in range(n):
            seq = "".join(rng.choice("ACGT") for _ in range(read_len))
            if rng.random() < 0.5:
                pos = rng.randrange(10, read_len - 3)
                alen = min(len(ADAPTER), read_len - pos)
                seq = (seq[:pos] + ADAPTER[:alen] + seq[pos + alen :])[:read_len]
            if rng.random() < 0.1:
                seq = seq[: rng.randrange(5, read_len)]
            qual = "".join(
                chr(33 + rng.randint(2, 40)) for _ in range(len(seq))
            )
            out.write("@r{}/1 x\n{}\n+\n{}\n".format(i, seq, qual))
    return path


def _run(tmp_path, args, infile, tag, turbo):
    out = str(tmp_path / "out-{}.fastq".format(tag))
    rep = str(tmp_path / "rep-{}.json".format(tag))
    argv = list(args) + [
        "-se", infile, "-o", out,
        "--no-cache-adapters", "--no-default-adapters",
        "--report-file", rep, "--quiet",
    ]
    import os

    old = os.environ.get("ATROPOS_TPU_ENGINE")
    os.environ["ATROPOS_TPU_ENGINE"] = "1" if turbo else "0"
    try:
        retcode, summary = get_command("trim").execute(argv)
    finally:
        if old is None:
            os.environ.pop("ATROPOS_TPU_ENGINE", None)
        else:
            os.environ["ATROPOS_TPU_ENGINE"] = old
    assert retcode == 0, summary.get("exception")
    return out, rep, summary


AD = "tru=" + ADAPTER
CONFIGS = [
    ["-a", AD],
    ["-a", AD, "-q", "20", "-m", "14"],
    ["-a", AD, "-q", "15,20"],
    ["-a", AD, "-u", "3", "-u", "-2"],
    ["-a", AD, "--nextseq-trim", "22"],
    ["-a", AD, "-m", "30", "-M", "90", "--max-n", "0.1"],
    ["-a", AD, "--discard-untrimmed"],
    ["-a", AD, "--discard-trimmed"],
    ["-g", "front=ACGTACGTAA"],
    ["-b", "anyw=TTAGACATAT"],
    ["-a", AD, "-a", "two=TTAGACATATCTCCGTCG", "-O", "5"],
    ["-a", "wild=ACGTNNNACGT"],  # wildcard adapter
    ["-q", "20", "-m", "10"],  # no adapters at all
    # anchored no-indel adapters: vectorized host comparator path
    ["-g", "anch=^ACGTACGTAA", "--no-indels"],
    ["-a", "sufx=TTAGACATATCTCCGTCG$", "--no-indels"],
    ["-g", "anch=^ACGTACGTAA", "-a", AD, "--no-indels", "-q", "20"],
    # pre/post read statistics from the gathered matrices
    ["-a", AD, "--stats", "both", "-q", "20", "-m", "14"],
    ["-a", AD, "--stats", "pre"],
    ["-a", AD, "--stats", "post", "--discard-untrimmed"],
]


@pytest.mark.parametrize("config", CONFIGS, ids=lambda c: " ".join(c))
def test_turbo_matches_scalar(tmp_path, config):
    infile = _write_synthetic(str(tmp_path / "in.fastq"))
    out_s, rep_s, sum_s = _run(tmp_path, config, infile, "scalar", turbo=False)
    out_t, rep_t, sum_t = _run(tmp_path, config, infile, "turbo", turbo=True)
    assert sum_t.get("mode") == "turbo", "turbo path not taken"
    with open(out_s) as fh:
        scalar_data = fh.read()
    with open(out_t) as fh:
        turbo_data = fh.read()
    assert turbo_data == scalar_data
    # summaries must agree on the consequential counters
    rep_scalar = json.load(open(rep_s))
    rep_turbo = json.load(open(rep_t))
    for key in (
        "total_record_count",
        "total_bp_counts",
        "record_counts",
        "bp_counts",
    ):
        assert rep_turbo[key] == rep_scalar[key], key
    trim_s = rep_scalar.get("trim")
    trim_t = rep_turbo.get("trim")
    if trim_s:
        assert trim_t["formatters"] == trim_s["formatters"]
        assert trim_t["filters"] == trim_s["filters"]
        assert trim_t["modifiers"] == trim_s["modifiers"]
        # pre/post read statistics (when --stats requested) must agree
        for stats_key in ("pre", "post"):
            assert trim_t.get(stats_key) == trim_s.get(stats_key), stats_key


def test_turbo_small_fixture(tmp_path):
    """Turbo on the upstream small.fastq fixture matches the golden file."""
    from .conformance_utils import assert_files_equal, cutpath

    out, _, summary = _run(
        tmp_path,
        ["-b", "small=TTAGACATATCTCCGTCG"],
        datapath("small.fastq"),
        "turbo-small",
        turbo=True,
    )
    assert summary.get("mode") == "turbo"
    assert_files_equal(cutpath("small.fastq"), out)


@pytest.mark.parametrize("ext", ["gz", "bz2", "xz"])
def test_turbo_compressed_input_output(tmp_path, ext):
    """Compressed in/out runs turbo and stays byte-identical to the scalar
    pipeline (same xopen writer, so even the compressed bytes match)."""
    plain = _write_synthetic(str(tmp_path / "in.fastq"), n=300)
    comp_in = str(tmp_path / ("in.fastq." + ext))
    from atropos_tpu.io.compression import get_compressor

    module = get_compressor(comp_in)
    with open(plain, "rb") as src, module.open(comp_in, "wb") as dst:
        dst.write(src.read())

    config = ["-a", AD, "-q", "20", "-m", "14"]
    outputs = {}
    for turbo in (False, True):
        tag = "{}-{}".format(ext, "t" if turbo else "s")
        out = str(tmp_path / ("out-{}.fastq.{}".format(tag, ext)))
        rep = str(tmp_path / ("rep-{}.json".format(tag)))
        argv = config + [
            "-se", comp_in, "-o", out,
            "--no-cache-adapters", "--no-default-adapters",
            "--report-file", rep, "--quiet",
        ]
        import os

        os.environ["ATROPOS_TPU_ENGINE"] = "1" if turbo else "0"
        try:
            retcode, summary = get_command("trim").execute(argv)
        finally:
            os.environ.pop("ATROPOS_TPU_ENGINE", None)
        assert retcode == 0, summary.get("exception")
        if turbo:
            assert summary.get("mode") == "turbo", "turbo path not taken"
        with open(out, "rb") as fh:
            outputs[turbo] = fh.read()
        with module.open(out, "rb") as fh:
            outputs[(turbo, "plain")] = fh.read()

    assert outputs[(True, "plain")] == outputs[(False, "plain")]
    assert outputs[True] == outputs[False]


def test_turbo_gz_fixture_matches_golden(tmp_path):
    """Turbo on the upstream gzipped fixture matches the golden file."""
    from .conformance_utils import assert_files_equal, cutpath

    out, _, summary = _run(
        tmp_path,
        ["-b", "small=TTAGACATATCTCCGTCG"],
        datapath("small.fastq.gz"),
        "turbo-small-gz",
        turbo=True,
    )
    assert summary.get("mode") == "turbo"
    assert_files_equal(cutpath("small.fastq"), out)


def test_turbo_ineligible_falls_back(tmp_path):
    """Configs outside the turbo envelope must fall back cleanly."""
    infile = _write_synthetic(str(tmp_path / "in.fastq"), n=50)
    out, _, summary = _run(
        tmp_path,
        ["-a", ADAPTER, "--times", "2"],
        infile,
        "fallback",
        turbo=True,
    )
    assert summary.get("mode") == "serial"


# -- paired-end turbo ---------------------------------------------------------

ADAPTER2 = "AGATCGGAAGAGCGTCGTGTAGGGAAAGAGTGT"


def _write_synthetic_pair(tmp_path, n=400, read_len=100, seed=7):
    rng = random.Random(seed)
    path1 = str(tmp_path / "in.1.fastq")
    path2 = str(tmp_path / "in.2.fastq")
    with open(path1, "w") as out1, open(path2, "w") as out2:
        for i in range(n):
            for mate, out, adapter in ((1, out1, ADAPTER), (2, out2, ADAPTER2)):
                seq = "".join(rng.choice("ACGT") for _ in range(read_len))
                if rng.random() < 0.5:
                    pos = rng.randrange(10, read_len - 3)
                    alen = min(len(adapter), read_len - pos)
                    seq = (seq[:pos] + adapter[:alen] + seq[pos + alen :])[
                        :read_len
                    ]
                if rng.random() < 0.1:
                    seq = seq[: rng.randrange(5, read_len)]
                qual = "".join(
                    chr(33 + rng.randint(2, 40)) for _ in range(len(seq))
                )
                out.write(
                    "@r{}/{} x\n{}\n+\n{}\n".format(i, mate, seq, qual)
                )
    return path1, path2


def _run_paired(tmp_path, args, in1, in2, tag, turbo):
    out1 = str(tmp_path / "out1-{}.fastq".format(tag))
    out2 = str(tmp_path / "out2-{}.fastq".format(tag))
    rep = str(tmp_path / "rep-{}.json".format(tag))
    argv = list(args) + [
        "-pe1", in1, "-pe2", in2, "-o", out1, "-p", out2,
        "--no-cache-adapters", "--no-default-adapters",
        "--report-file", rep, "--quiet",
    ]
    import os

    old = os.environ.get("ATROPOS_TPU_ENGINE")
    os.environ["ATROPOS_TPU_ENGINE"] = "1" if turbo else "0"
    try:
        retcode, summary = get_command("trim").execute(argv)
    finally:
        if old is None:
            os.environ.pop("ATROPOS_TPU_ENGINE", None)
        else:
            os.environ["ATROPOS_TPU_ENGINE"] = old
    assert retcode == 0, summary.get("exception")
    return out1, out2, rep, summary


AD2 = "tru2=" + ADAPTER2
PE_CONFIGS = [
    ["-a", AD, "-A", AD2, "--aligner", "adapter"],
    ["-a", AD, "-A", AD2, "--aligner", "adapter", "-q", "20", "-m", "14"],
    ["-a", AD, "-A", AD2, "--aligner", "adapter", "-q", "15,20", "-u", "2"],
    ["-a", AD, "-A", AD2, "--aligner", "adapter", "--pair-filter", "both",
     "-m", "30"],
    ["-a", AD, "-A", AD2, "--aligner", "adapter", "--discard-untrimmed"],
    ["-a", AD, "-A", AD2, "--aligner", "adapter", "--nextseq-trim", "22"],
    ["-a", AD, "-A", AD2, "--aligner", "adapter", "-M", "90", "--max-n",
     "0.1"],
    # legacy 'first' pairing mode: only read1 is modified
    ["-a", AD],
    # pre/post read statistics, paired
    ["-a", AD, "-A", AD2, "--aligner", "adapter", "--stats", "both",
     "-q", "20", "-m", "14"],
]


@pytest.mark.parametrize("config", PE_CONFIGS, ids=lambda c: " ".join(c))
def test_turbo_paired_matches_scalar(tmp_path, config):
    in1, in2 = _write_synthetic_pair(tmp_path)
    s1, s2, rep_s, sum_s = _run_paired(
        tmp_path, config, in1, in2, "scalar", turbo=False
    )
    t1, t2, rep_t, sum_t = _run_paired(
        tmp_path, config, in1, in2, "turbo", turbo=True
    )
    assert sum_t.get("mode") == "turbo", "paired turbo path not taken"
    for scalar_file, turbo_file in ((s1, t1), (s2, t2)):
        with open(scalar_file) as fh:
            scalar_data = fh.read()
        with open(turbo_file) as fh:
            turbo_data = fh.read()
        assert turbo_data == scalar_data
    rep_scalar = json.load(open(rep_s))
    rep_turbo = json.load(open(rep_t))
    for key in (
        "total_record_count",
        "total_bp_counts",
        "record_counts",
        "bp_counts",
    ):
        assert rep_turbo[key] == rep_scalar[key], key
    trim_s = rep_scalar.get("trim")
    trim_t = rep_turbo.get("trim")
    if trim_s:
        assert trim_t["formatters"] == trim_s["formatters"]
        assert trim_t["filters"] == trim_s["filters"]
        assert trim_t["modifiers"] == trim_s["modifiers"]
        for stats_key in ("pre", "post"):
            assert trim_t.get(stats_key) == trim_s.get(stats_key), stats_key


def test_turbo_paired_name_mismatch(tmp_path):
    """Improperly paired names raise the scalar reader's FormatError."""
    in1, in2 = _write_synthetic_pair(tmp_path, n=30)
    lines = open(in2).read().splitlines(True)
    lines[0] = "@zzz/2 x\n"
    with open(in2, "w") as fh:
        fh.write("".join(lines))
    import os

    os.environ["ATROPOS_TPU_ENGINE"] = "1"
    try:
        retcode, summary = get_command("trim").execute(
            ["-a", AD, "-A", AD2, "--aligner", "adapter",
             "-pe1", in1, "-pe2", in2,
             "-o", str(tmp_path / "o1.fastq"),
             "-p", str(tmp_path / "o2.fastq"),
             "--no-cache-adapters", "--no-default-adapters", "--quiet"]
        )
    finally:
        os.environ.pop("ATROPOS_TPU_ENGINE", None)
    assert retcode != 0
    assert "improperly paired" in str(summary.get("exception"))


def test_turbo_paired_length_mismatch(tmp_path):
    """File-length mismatch raises the scalar reader's FormatError."""
    in1, in2 = _write_synthetic_pair(tmp_path, n=30)
    lines = open(in2).read().splitlines(True)
    with open(in2, "w") as fh:
        fh.write("".join(lines[:-4]))
    import os

    os.environ["ATROPOS_TPU_ENGINE"] = "1"
    try:
        retcode, summary = get_command("trim").execute(
            ["-a", AD, "-A", AD2, "--aligner", "adapter",
             "-pe1", in1, "-pe2", in2,
             "-o", str(tmp_path / "o1.fastq"),
             "-p", str(tmp_path / "o2.fastq"),
             "--no-cache-adapters", "--no-default-adapters", "--quiet"]
        )
    finally:
        os.environ.pop("ATROPOS_TPU_ENGINE", None)
    assert retcode != 0
    assert "more reads in file" in str(summary.get("exception"))


def test_turbo_side_outputs(tmp_path):
    """untrimmed/too-short/too-long output files through turbo are
    byte-identical to the scalar pipeline's."""
    infile = _write_synthetic(str(tmp_path / "in.fastq"))
    names = ("out", "short", "long", "untr")
    files = {}
    for turbo in (False, True):
        tag = "t" if turbo else "s"
        files[tag] = {
            name: str(tmp_path / "{}-{}.fastq".format(name, tag))
            for name in names
        }
        config = [
            "-a", AD, "-q", "20", "-m", "30", "-M", "90",
            "--too-short-output", files[tag]["short"],
            "--too-long-output", files[tag]["long"],
            "--untrimmed-output", files[tag]["untr"],
        ]
        out, _, summary = _run(
            tmp_path, config, infile, "side-" + tag, turbo=turbo
        )
        import shutil

        shutil.move(out, files[tag]["out"])
        if turbo:
            assert summary.get("mode") == "turbo", "turbo path not taken"
    import os

    for name in names:
        scalar_file, turbo_file = files["s"][name], files["t"][name]
        data_s = open(scalar_file).read() if os.path.exists(scalar_file) else None
        data_t = open(turbo_file).read() if os.path.exists(turbo_file) else None
        assert data_t == data_s, name


def test_turbo_paired_side_outputs(tmp_path):
    """Paired side outputs (both mates) through turbo match scalar."""
    in1, in2 = _write_synthetic_pair(tmp_path)
    names = ("o1", "o2", "s1", "s2", "u1", "u2")
    files = {}
    for turbo in (False, True):
        tag = "t" if turbo else "s"
        files[tag] = {
            name: str(tmp_path / "{}-{}.fastq".format(name, tag))
            for name in names
        }
        config = [
            "-a", AD, "-A", AD2, "--aligner", "adapter", "-m", "30",
            "--too-short-output", files[tag]["s1"],
            "--too-short-paired-output", files[tag]["s2"],
            "--untrimmed-output", files[tag]["u1"],
            "--untrimmed-paired-output", files[tag]["u2"],
        ]
        o1, o2, _, summary = _run_paired(
            tmp_path, config, in1, in2, "side-" + tag, turbo=turbo
        )
        import shutil

        shutil.move(o1, files[tag]["o1"])
        shutil.move(o2, files[tag]["o2"])
        if turbo:
            assert summary.get("mode") == "turbo", "turbo path not taken"
    import os

    for name in names:
        scalar_file, turbo_file = files["s"][name], files["t"][name]
        data_s = open(scalar_file).read() if os.path.exists(scalar_file) else None
        data_t = open(turbo_file).read() if os.path.exists(turbo_file) else None
        assert data_t == data_s, name


_COMP_TABLE = str.maketrans("ACGTN", "TGCAN")


def _write_insert_pairs(tmp_path, n=400, read_len=100, seed=23):
    """Proper paired-end inserts: roughly half read through the insert
    (adapters appear in both mates, full-length overlap) with sprinkled
    base errors so overlap error correction actually fires; the rest are
    long-insert pairs that exercise the fallback lanes."""
    rng = random.Random(seed)
    path1 = str(tmp_path / "ins.1.fastq")
    path2 = str(tmp_path / "ins.2.fastq")

    def mutate(seq):
        chars = list(seq)
        for _ in range(rng.randrange(0, 3)):
            pos = rng.randrange(len(chars))
            chars[pos] = rng.choice("ACGTN")
        return "".join(chars)

    with open(path1, "w") as out1, open(path2, "w") as out2:
        for i in range(n):
            if rng.random() < 0.5:
                ilen = rng.randrange(30, read_len - 5)
            else:
                ilen = rng.randrange(read_len + 10, read_len * 2)
            insert = "".join(rng.choice("ACGT") for _ in range(ilen))
            read1 = mutate((insert + ADAPTER + "A" * read_len)[:read_len])
            rc = insert.translate(_COMP_TABLE)[::-1]
            read2 = mutate((rc + ADAPTER2 + "A" * read_len)[:read_len])
            qual1 = "".join(chr(33 + rng.randint(2, 40)) for _ in read1)
            qual2 = "".join(chr(33 + rng.randint(2, 40)) for _ in read2)
            out1.write("@p{}/1 x\n{}\n+\n{}\n".format(i, read1, qual1))
            out2.write("@p{}/2 x\n{}\n+\n{}\n".format(i, read2, qual2))
    return path1, path2


INSERT_CONFIGS = [
    ["-a", AD, "-A", AD2, "--aligner", "insert"],
    ["-a", AD, "-A", AD2, "--aligner", "insert", "-q", "20", "-m", "14"],
    ["-a", AD, "-A", AD2, "--aligner", "insert",
     "--correct-mismatches", "conservative"],
    ["-a", AD, "-A", AD2, "--aligner", "insert",
     "--correct-mismatches", "liberal"],
    ["-a", AD, "-A", AD2, "--aligner", "insert",
     "--correct-mismatches", "N"],
    ["-a", AD, "-A", AD2, "--aligner", "insert",
     "--correct-mismatches", "conservative", "-q", "20", "-m", "14",
     "--trim-n"],
    ["-a", AD, "-A", AD2, "--aligner", "insert",
     "--correct-mismatches", "liberal", "--max-n", "0.2",
     "--discard-untrimmed"],
]


@pytest.mark.parametrize("config", INSERT_CONFIGS, ids=lambda c: " ".join(c))
def test_turbo_insert_correction_matches_scalar(tmp_path, config):
    """Insert-aligner turbo (incl. overlap error correction) must be
    byte-identical to the scalar pipeline, with identical modifier
    summaries (corrected_pairs/corrected_bp counters included)."""
    in1, in2 = _write_insert_pairs(tmp_path)
    s1, s2, rep_s, _ = _run_paired(
        tmp_path, config, in1, in2, "scalar", turbo=False
    )
    t1, t2, rep_t, sum_t = _run_paired(
        tmp_path, config, in1, in2, "turbo", turbo=True
    )
    assert sum_t.get("mode") == "turbo", "insert turbo path not taken"
    for scalar_file, turbo_file in ((s1, t1), (s2, t2)):
        with open(scalar_file) as fh:
            scalar_data = fh.read()
        with open(turbo_file) as fh:
            turbo_data = fh.read()
        assert turbo_data == scalar_data
    rep_scalar = json.load(open(rep_s))
    rep_turbo = json.load(open(rep_t))
    trim_s = rep_scalar.get("trim")
    trim_t = rep_turbo.get("trim")
    assert trim_t["modifiers"] == trim_s["modifiers"]
    assert trim_t["filters"] == trim_s["filters"]
    assert trim_t["formatters"] == trim_s["formatters"]


# -- mate overwrite (-w) ------------------------------------------------------


def _write_overwrite_pairs(tmp_path, n=400, seed=31):
    """Pairs engineered so the -w quality-window rules fire in BOTH
    directions: ~1/4 of pairs have a low-quality read1 window with a
    high-quality read2 (read1 replaced by rc(read2)), ~1/4 the reverse,
    plus untriggered and short-read pairs. Mates have different lengths
    (the replacement adopts the partner's length) and some records carry
    a '+' line payload (the replacement adopts the partner's header)."""
    rng = random.Random(seed)
    path1 = str(tmp_path / "ow.1.fastq")
    path2 = str(tmp_path / "ow.2.fastq")

    def qual(length, lo, hi):
        return "".join(chr(33 + rng.randint(lo, hi)) for _ in range(length))

    with open(path1, "w") as out1, open(path2, "w") as out2:
        for i in range(n):
            len1 = rng.randrange(20, 100)
            len2 = rng.randrange(20, 80)
            roll = rng.random()
            if roll < 0.25:
                q1, q2 = qual(len1, 0, 8), qual(len2, 35, 40)
            elif roll < 0.5:
                q1, q2 = qual(len1, 35, 40), qual(len2, 0, 8)
            elif roll < 0.6:
                # short reads: below the window size, ineligible
                len1, len2 = rng.randrange(1, 9), rng.randrange(1, 9)
                q1, q2 = qual(len1, 0, 40), qual(len2, 0, 40)
            else:
                q1, q2 = qual(len1, 5, 35), qual(len2, 5, 35)
            seq1 = "".join(rng.choice("ACGTN") for _ in range(len1))
            seq2 = "".join(rng.choice("ACGTN") for _ in range(len2))
            if len1 > 25 and rng.random() < 0.3:
                pos = max(5, len1 - 20)
                seq1 = seq1[:pos] + ADAPTER[: len1 - pos]
            name1 = "ow{}/1 x".format(i)
            name2 = "ow{}/2 x".format(i)
            plus1 = name1 if rng.random() < 0.5 else ""
            plus2 = name2 if rng.random() < 0.5 else ""
            out1.write("@{}\n{}\n+{}\n{}\n".format(name1, seq1, plus1, q1))
            out2.write("@{}\n{}\n+{}\n{}\n".format(name2, seq2, plus2, q2))
    return path1, path2


OVERWRITE_CONFIGS = [
    # default op order 'CGQAW': W last, measured on the trimmed reads
    ["-w", "10,30,10"],
    ["-w", "10,30,10", "-a", AD, "-A", AD2, "--aligner", "adapter"],
    ["-w", "10,30,10", "-a", AD, "-A", AD2, "--aligner", "adapter",
     "-q", "20", "-m", "14"],
    ["-w", "12,25,15", "-u", "3", "--nextseq-trim", "22"],
    ["-w", "10,30,10", "-q", "15,20"],
    ["-w", "10,30,10", "--discard-untrimmed", "-a", AD, "-A", AD2,
     "--aligner", "adapter"],
    ["-w", "10,30,10", "-m", "25", "--max-n", "0.2", "--pair-filter", "both"],
    # cutadapt-compat op order 'WCGQA': W first, raw reads are replaced
    # and every later stage operates on the replacement
    ["-w", "10,30,10", "--op-order", "WCGQA", "-a", AD, "-A", AD2,
     "--aligner", "adapter", "-q", "20", "-m", "14"],
    ["-w", "12,25,15", "--op-order", "WCGQA", "-u", "3",
     "--nextseq-trim", "22"],
    ["-w", "10,30,10", "--op-order", "WCGQA", "-m", "25", "--max-n", "0.2"],
]


@pytest.mark.parametrize(
    "config", OVERWRITE_CONFIGS, ids=lambda c: " ".join(c)
)
def test_turbo_overwrite_matches_scalar(tmp_path, config):
    """OverwriteRead (-w) through the turbo pre-pass must be
    byte-identical to the scalar pair modifier, including replaced
    record headers and downstream trimming of the replaced content."""
    in1, in2 = _write_overwrite_pairs(tmp_path)
    s1, s2, rep_s, _ = _run_paired(
        tmp_path, config, in1, in2, "scalar", turbo=False
    )
    t1, t2, rep_t, sum_t = _run_paired(
        tmp_path, config, in1, in2, "turbo", turbo=True
    )
    assert sum_t.get("mode") == "turbo", "overwrite turbo path not taken"
    for scalar_file, turbo_file in ((s1, t1), (s2, t2)):
        with open(scalar_file) as fh:
            scalar_data = fh.read()
        with open(turbo_file) as fh:
            turbo_data = fh.read()
        assert turbo_data == scalar_data
    rep_scalar = json.load(open(rep_s))
    rep_turbo = json.load(open(rep_t))
    assert rep_turbo["trim"]["modifiers"] == rep_scalar["trim"]["modifiers"]
    assert rep_turbo["trim"]["filters"] == rep_scalar["trim"]["filters"]
    assert (
        rep_turbo["trim"]["formatters"] == rep_scalar["trim"]["formatters"]
    )


def test_turbo_overwrite_interleaved_output(tmp_path):
    """-w with interleaved output: the alt-name path must survive the
    byte-interleaving assembly."""
    in1, in2 = _write_overwrite_pairs(tmp_path, n=120)
    outs = {}
    for turbo in (False, True):
        tag = "t" if turbo else "s"
        out = str(tmp_path / "il-{}.fastq".format(tag))
        argv = [
            "-w", "10,30,10", "-q", "20",
            "-pe1", in1, "-pe2", in2, "-L", out,
            "--no-cache-adapters", "--no-default-adapters",
            "--report-file", str(tmp_path / "rep-il-{}.json".format(tag)),
            "--quiet",
        ]
        import os

        os.environ["ATROPOS_TPU_ENGINE"] = "1" if turbo else "0"
        try:
            retcode, summary = get_command("trim").execute(argv)
        finally:
            os.environ.pop("ATROPOS_TPU_ENGINE", None)
        assert retcode == 0, summary.get("exception")
        if turbo:
            assert summary.get("mode") == "turbo"
        outs[tag] = open(out).read()
    assert outs["t"] == outs["s"]


def test_host_vs_device_qualtrim_identical(tmp_path):
    """The host-native quality path (default) and the device quality
    kernels (ATROPOS_TPU_HOST_QUALTRIM=0) must produce byte-identical
    output, including the 5'-cutoff sync path."""
    import os

    infile = _write_synthetic(str(tmp_path / "in.fastq"))
    outs = {}
    for tag, host_q in (("host", "1"), ("device", "0")):
        os.environ["ATROPOS_TPU_HOST_QUALTRIM"] = host_q
        try:
            out, _, summary = _run(
                tmp_path,
                ["-a", AD, "-q", "15,20", "--nextseq-trim", "22", "-m", "14"],
                infile, "hq-" + tag, turbo=True,
            )
        finally:
            os.environ.pop("ATROPOS_TPU_HOST_QUALTRIM", None)
        assert summary.get("mode") == "turbo"
        outs[tag] = open(out).read()
    assert outs["host"] == outs["device"]


def test_turbo_insert_slot_overflow_matches_scalar(tmp_path):
    """Pairs whose candidate stream exceeds the fixed wire slots (here:
    near-poly-A pairs where ~95 diagonals are admissible) take the
    host-recompute overflow path and must stay byte-identical."""
    rng = random.Random(41)
    in1 = str(tmp_path / "ov.1.fastq")
    in2 = str(tmp_path / "ov.2.fastq")
    with open(in1, "w") as o1, open(in2, "w") as o2:
        for i in range(200):
            if i % 3 == 0:
                # poly-A insert with one planted mismatch: no exact-match
                # collapse at s=0, dozens of admissible diagonals
                seq1 = list("A" * 100)
                seq1[rng.randrange(20, 80)] = "C"
                seq1 = "".join(seq1)
                seq2 = "T" * 100
            else:
                ilen = rng.randrange(30, 150)
                ins = "".join(rng.choice("ACGT") for _ in range(ilen))
                seq1 = (ins + ADAPTER + "A" * 100)[:100]
                rc = ins.translate(_COMP_TABLE)[::-1]
                seq2 = (rc + ADAPTER2 + "A" * 100)[:100]
            q1 = "".join(chr(33 + rng.randint(2, 40)) for _ in seq1)
            q2 = "".join(chr(33 + rng.randint(2, 40)) for _ in seq2)
            o1.write("@ov{}/1\n{}\n+\n{}\n".format(i, seq1, q1))
            o2.write("@ov{}/2\n{}\n+\n{}\n".format(i, seq2, q2))

    from atropos_tpu.engine import turbo as turbo_mod

    config = ["-a", AD, "-A", AD2, "--aligner", "insert", "-q", "20"]
    outs = {}
    before = turbo_mod.SLOT_OVERFLOWS["pairs"]
    for turbo in (False, True):
        tag = "t" if turbo else "s"
        o1x, o2x, _, summary = _run_paired(
            tmp_path, config, in1, in2, "ovf-" + tag, turbo=turbo
        )
        if turbo:
            assert summary.get("mode") == "turbo"
        outs[tag] = (open(o1x).read(), open(o2x).read())
    assert outs["t"] == outs["s"]
    # prove the overflow machinery actually exercised
    assert turbo_mod.SLOT_OVERFLOWS["pairs"] > before

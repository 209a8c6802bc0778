#!/usr/bin/env python
"""Measure line-level similarity between repo files and their reference
counterparts (after normalizing the package rename), the same way the
round-1 verdict adjudicated copy findings. Used to verify that host-layer
rewrites are genuinely original, not cosmetic.

Usage: python tools/similarity.py [repo_file reference_file ...]
With no args, checks the default map of flagged files.
"""
import difflib
import re
import sys

DEFAULT_PAIRS = [
    ("atropos_tpu/commands/trim/modifiers.py", "atropos/commands/trim/modifiers.py"),
    ("atropos_tpu/commands/trim/__init__.py", "atropos/commands/trim/__init__.py"),
    ("atropos_tpu/adapters/__init__.py", "atropos/adapters/__init__.py"),
    ("atropos_tpu/commands/detect/__init__.py", "atropos/commands/detect/__init__.py"),
    ("atropos_tpu/commands/trim/writers.py", "atropos/commands/trim/writers.py"),
    ("atropos_tpu/commands/multicore.py", "atropos/commands/multicore.py"),
    ("atropos_tpu/util/__init__.py", "atropos/util/__init__.py"),
    ("atropos_tpu/commands/legacy_report.py", "atropos/commands/legacy_report.py"),
    ("atropos_tpu/commands/base.py", "atropos/commands/base.py"),
    ("atropos_tpu/commands/stats.py", "atropos/commands/stats.py"),
    ("atropos_tpu/io/compression.py", "atropos/io/compression.py"),
    ("atropos_tpu/io/seqio.py", "atropos/io/seqio.py"),
    ("atropos_tpu/commands/trim/filters.py", "atropos/commands/trim/filters.py"),
    ("atropos_tpu/commands/__init__.py", "atropos/commands/__init__.py"),
    ("atropos_tpu/commands/cli.py", "atropos/commands/cli.py"),
    ("atropos_tpu/commands/trim/cli.py", "atropos/commands/trim/cli.py"),
    ("atropos_tpu/commands/reports.py", "atropos/commands/reports.py"),
    ("atropos_tpu/io/__init__.py", "atropos/io/__init__.py"),
    ("atropos_tpu/io/progress.py", "atropos/io/progress.py"),
    ("atropos_tpu/commands/error/__init__.py", "atropos/commands/error/__init__.py"),
    ("atropos_tpu/commands/qc/__init__.py", "atropos/commands/qc/__init__.py"),
]


def normalize(text):
    text = text.replace("atropos_tpu", "atropos")
    # strip comments/blank lines so similarity reflects code structure
    lines = []
    for line in text.splitlines():
        stripped = line.strip()
        if not stripped or stripped.startswith("#"):
            continue
        lines.append(re.sub(r"\s+", " ", line.rstrip()))
    return lines


def similarity(path_a, path_b):
    with open(path_a) as fh:
        a = normalize(fh.read())
    with open(path_b) as fh:
        b = normalize(fh.read())
    return difflib.SequenceMatcher(None, a, b).ratio()


def main(argv):
    if len(argv) > 1:
        pairs = list(zip(argv[1::2], argv[2::2]))
    else:
        pairs = [("/root/repo/" + a, "/root/reference/" + b) for a, b in DEFAULT_PAIRS]
    for repo_path, ref_path in pairs:
        try:
            ratio = similarity(repo_path, ref_path)
        except OSError as exc:
            print("%-55s ERROR %s" % (repo_path, exc))
            continue
        flag = " <-- HIGH" if ratio >= 0.5 else ""
        print("%-55s %.3f%s" % (repo_path.split("repo/")[-1], ratio, flag))


if __name__ == "__main__":
    main(sys.argv)

"""Shared-line sweep, the round-3 verdict's copy metric: fraction of a
repo file's stripped lines (>10 chars) that also appear in a reference
file (after normalizing the package rename). Lower is better; the
round-4 target for the flagged host files is < 0.35.

Usage: python tools/shared_lines.py repo_file [ref_file]
With no ref_file, sweeps every reference .py file and reports the max.
"""
import os
import sys


def lines_of(path, rename=False):
    with open(path) as fh:
        text = fh.read()
    if rename:
        text = text.replace("atropos_tpu", "atropos")
    out = set()
    for line in text.splitlines():
        line = line.strip()
        if len(line) > 10:
            out.add(line)
    return out


def score(repo_file, ref_file):
    repo = lines_of(repo_file, rename=True)
    ref = lines_of(ref_file)
    if not repo:
        return 0.0
    return len(repo & ref) / len(repo)


def main():
    repo_file = sys.argv[1]
    if len(sys.argv) > 2:
        print("%.3f" % score(repo_file, sys.argv[2]))
        return
    best = (0.0, None)
    for root, _, files in os.walk("/root/reference"):
        if "/paper/" in root or "/.git" in root:
            continue
        for name in files:
            if not name.endswith(".py"):
                continue
            path = os.path.join(root, name)
            val = score(repo_file, path)
            if val > best[0]:
                best = (val, path)
    print("%.3f  %s" % best)


if __name__ == "__main__":
    main()

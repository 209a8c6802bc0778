"""Conformance-test harness.

Runs the trim command in-process against the upstream Atropos test inputs
(``tests/conformance/data``) and asserts byte-identical output against the
upstream golden files (``tests/conformance/expected``). This is the
bit-exactness oracle for the whole framework.
"""
import os

from atropos_tpu.io import xopen

CONFORMANCE_DIR = os.path.join(os.path.dirname(__file__), "conformance")

#: fallback reasons that are legitimately scalar-only — anything else
#: failing to build the engine in an engine-forced golden run is a bug
#: (a silently de-batched suite would otherwise re-test the scalar path).
#: Colorspace is the ONLY whitelisted reason: SOLiD colorspace stays
#: scalar by decision (see README "Colorspace" ADR); quality-only and
#: overwrite configs run through the turbo device path.
EXPECTED_ENGINE_FALLBACKS = frozenset({"colorspace"})

#: batched-vs-scalar tally across the golden suite (reported by the
#: session-finish hook in conftest.py)
ENGINE_RUN_TALLY = {"engine": 0, "turbo": 0, "whitelisted_fallback": 0}


def tracked_execute(params):
    """Execute the trim command; in engine-forced runs, prove the batched
    path actually ran (or the fallback reason is on the legitimate
    whitelist): a future change that silently de-batches the suite must
    FAIL here, not quietly re-test scalar."""
    from atropos_tpu.commands import get_command

    engine_forced = (
        os.environ.get("ATROPOS_TPU_ENGINE") == "1"
        and "--threads" not in params
    )
    if engine_forced:
        from atropos_tpu import engine as engine_mod

        counts_before = dict(engine_mod.BUILD_COUNTS)

    retcode, summary = get_command("trim").execute(params)

    if engine_forced and retcode == 0:
        from atropos_tpu import engine as engine_mod

        if summary.get("mode") == "turbo":
            ENGINE_RUN_TALLY["turbo"] += 1
        elif engine_mod.BUILD_COUNTS["engine"] > counts_before["engine"]:
            ENGINE_RUN_TALLY["engine"] += 1
        else:
            reason = engine_mod.LAST_FALLBACK_REASON
            assert reason in EXPECTED_ENGINE_FALLBACKS, (
                "engine-forced golden run fell back to the scalar "
                "pipeline for a non-whitelisted reason: {!r}".format(reason)
            )
            ENGINE_RUN_TALLY["whitelisted_fallback"] += 1
    return retcode, summary


def datapath(path):
    return os.path.join(CONFORMANCE_DIR, "data", path)


def cutpath(path):
    return os.path.join(CONFORMANCE_DIR, "expected", path)


def read_any(path):
    """Read full (possibly compressed) file contents as text."""
    with xopen(path, "r") as infile:
        return infile.read()


def assert_files_equal(expected_path, actual_path):
    expected = read_any(expected_path)
    actual = read_any(actual_path)
    if expected != actual:
        import difflib

        diff = "\n".join(
            difflib.unified_diff(
                expected.splitlines(),
                actual.splitlines(),
                fromfile=str(expected_path),
                tofile=str(actual_path),
                lineterm="",
            )
        )
        raise AssertionError(
            "Output differs from golden file {}:\n{}".format(expected_path, diff)
        )


def run_trim(
    tmp_path,
    params,
    expected,
    inpath=None,
    inpath2=None,
    qualfile=None,
    interleaved_input=False,
    interleaved_output=False,
    aligner=None,
    assert_files=True,
    sra_accn=None,
):
    """Execute the trim command in-process; compare against the golden file.

    Mirrors the upstream harness (``tests/utils.py:run``): builds an argv,
    executes via the command registry, and diffs the output.
    """
    import traceback

    from atropos_tpu.commands import get_command

    if isinstance(params, str):
        params = params.split()
    tmp_fastaq = str(tmp_path / expected)
    if sra_accn:
        params += ["-sra", sra_accn]
    elif interleaved_input:
        params += ["-l", datapath(inpath)]
    elif inpath2:
        params += ["-pe1", datapath(inpath)]
        params += ["-pe2", datapath(inpath2)]
    else:
        params += ["-se", datapath(inpath)]
        if qualfile:
            params += ["-sq", datapath(qualfile)]
    if interleaved_output:
        params += ["-L", tmp_fastaq]
    else:
        params += ["-o", tmp_fastaq]
    # keep the adapter-cache file out of the repo working directory
    params += ["--adapter-cache-file", str(tmp_path / ".adapters")]
    # reports to a scratch file, not stdout
    params += ["--report-file", str(tmp_path / "report.txt"), "--quiet"]

    retcode, summary = tracked_execute(params)

    assert summary is not None
    assert isinstance(summary, dict)
    if "exception" in summary and summary["exception"] is not None:
        assert retcode != 0
        err = summary["exception"]
        traceback.print_exception(*err["details"])
        raise Exception("Unexpected error: {}".format(err["message"]))
    assert retcode == 0
    assert os.path.exists(tmp_fastaq)
    if assert_files:
        assert_files_equal(cutpath(expected), tmp_fastaq)
    return summary

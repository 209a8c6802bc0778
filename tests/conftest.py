"""Test configuration.

Device-kernel parity and sharding tests run on a virtual 8-device CPU mesh
so they exercise the same program the TPU runs, deterministically and
without requiring hardware. Set ATROPOS_TPU_TEST_REAL_DEVICE=1 to run on
whatever real accelerator is attached instead.

Note: on hosts with an accelerator plugin registered via sitecustomize,
the JAX_PLATFORMS env var may be overridden before we run; forcing the
platform through jax.config is authoritative.
"""
import os

if not os.environ.get("ATROPOS_TPU_TEST_REAL_DEVICE"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except ImportError:
        pass

import pytest

# Golden-suite modules that run byte-exactness cases through the full trim
# command: every case runs twice, once with the scalar pipeline forced and
# once with the batched device engine forced, so engine conformance is
# proven on the ENTIRE behavioral surface (not a sampled subset).
_ENGINE_PARAMETRIZED_MODULES = ("test_trim_se", "test_trim_pe")


def pytest_generate_tests(metafunc):
    module = metafunc.module.__name__.rsplit(".", 1)[-1]
    if (
        module in _ENGINE_PARAMETRIZED_MODULES
        and "engine_mode" in metafunc.fixturenames
    ):
        metafunc.parametrize(
            "engine_mode", ["scalar", "engine"], indirect=True
        )


def pytest_terminal_summary(terminalreporter):
    """Report the batched-vs-scalar split of the engine-forced golden runs
    so coverage regressions are visible in the test log, and list every
    skipped test with its reason (skips must be loud: each one is an
    optional-dependency surface the suite did NOT exercise)."""
    from .conformance_utils import ENGINE_RUN_TALLY

    total = sum(ENGINE_RUN_TALLY.values())
    if total:
        terminalreporter.write_line(
            "engine-forced golden runs: {turbo} turbo, {engine} engine, "
            "{whitelisted_fallback} whitelisted-scalar (of {total})".format(
                total=total, **ENGINE_RUN_TALLY
            )
        )
    skipped = terminalreporter.stats.get("skipped", ())
    for report in skipped:
        reason = report.longrepr[2] if report.longrepr else ""
        terminalreporter.write_line(
            "skipped: {} ({})".format(report.nodeid, reason)
        )


@pytest.fixture(autouse=True)
def engine_mode(request, monkeypatch):
    """Force the trim pipeline mode for parametrized golden tests.

    Unparametrized tests leave the environment alone (engine defaults on).
    """
    mode = getattr(request, "param", None)
    if mode == "scalar":
        monkeypatch.setenv("ATROPOS_TPU_ENGINE", "0")
    elif mode == "engine":
        monkeypatch.setenv("ATROPOS_TPU_ENGINE", "1")
    return mode

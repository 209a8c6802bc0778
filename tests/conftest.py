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

"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; all sharding tests run against
XLA's host-platform device virtualization. Note: the axon TPU plugin (if
present) force-selects itself via `jax.config` at interpreter startup, so the
platform must be overridden through `jax.config`, not env vars.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# keep the persistent XLA compile cache OUT of test runs: tests that invoke
# the CLI in-process (test_cli) would otherwise enable it for the whole
# suite, and a cache WRITE inside jax's serialization layer has segfaulted
# a full-suite run at ~92% (zstd backend, under memory pressure). CPU
# compiles are cheap; determinism beats cache speed in CI.
os.environ["RUSTLIGHT_TPU_NO_COMPILE_CACHE"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", jax.devices()

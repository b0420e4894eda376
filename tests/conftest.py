"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding is exercised without TPU hardware (SURVEY.md §4: tests
runnable on a single host via xla_force_host_platform_device_count)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent jit cache: prove-pipeline compiles dominate test wall time
# persistent cache config comes from the package import (CPU dirs are
# fingerprinted by host CPU features: mismatched AOT loads can SIGILL)

"""Test configuration: force JAX onto an 8-device virtual CPU platform so
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4).

The session environment registers a tunneled TPU PJRT plugin ("axon") via
sitecustomize and pins JAX_PLATFORMS=axon; env vars alone do not undo that,
so we override through jax.config before any computation runs. Unit tests
run on virtual CPU devices; only bench.py targets the real chip.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

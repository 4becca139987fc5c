"""Test harness configuration.

Tests run on the CPU backend with 8 virtual XLA devices so that every
multi-chip sharding / collective path (mesh data parallelism, negative
all-gather, sharded retrieval) is exercised without TPU hardware, per the
strategy in SURVEY.md §4/§7.

The env vars must be set before jax initializes its backends, which is why
this lives at conftest import time.
"""

import os

# Force CPU for tests even when the shell pre-sets a TPU platform: the
# single real chip is reserved for bench.py; tests need 8 virtual devices.
# Chip-gated tests (pytest -m tpu) set CZT_TESTS_ON_TPU=1 to skip the
# override and run on the real device.
_ON_TPU = os.environ.get("CZT_TESTS_ON_TPU") == "1"
if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()
# keep tests deterministic and quiet
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The TPU-tunnel plugin's sitecustomize may have already forced
# jax_platforms="axon,cpu" via jax.config at interpreter startup; override
# it here, before any backend is initialized.
import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")

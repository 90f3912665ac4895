"""Test configuration: force JAX onto CPU with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4
implication: mocked-mesh tests before real slices).

Note: the environment's sitecustomize pins JAX_PLATFORMS=axon (the remote
TPU tunnel), so env vars alone don't stick — we override via jax.config
before any backend is initialized.  Running eager tests through the tunnel
would be pathologically slow (one RPC per op).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

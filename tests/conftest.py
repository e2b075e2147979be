"""Test environment: force CPU with 8 virtual devices.

Multi-chip sharding code is tested on a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), the TPU analog of the
reference's rayon-thread-scaling tests (reference tests/test_performance.rs:134-156).

This environment preregisters a TPU PJRT plugin ('axon') via sitecustomize
that wins over the JAX_PLATFORMS env var, so the platform is forced through
jax.config before any backend initializes.  bench.py and production use keep
the real TPU platform.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

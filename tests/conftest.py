"""Test config: force JAX onto CPU with 8 virtual devices so sharding paths
(data parallel, edge partition) are exercised without TPU hardware
(SURVEY.md §4: fake-device mesh tests).

Note: this environment's sitecustomize.py registers the tunneled 'axon' TPU
backend and imports jax at interpreter start, so env vars alone are too late
— jax.config.update is required to pin the CPU platform.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

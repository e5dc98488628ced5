"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding tests run anywhere (SURVEY.md §4).

Note: this image's sitecustomize imports jax at interpreter start (to
register the TPU backend), so env vars alone are too late — we must use
jax.config.update.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

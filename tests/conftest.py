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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU aborts the whole process (CHECK failure) when the 8 virtual
# devices' collective participants fail to rendezvous within 40 s. This
# host has ONE core; with a production run competing for it, thread
# scheduling can starve past 40 s and a passing suite dies mid-run
# (observed twice at the first shard_map CLI test). Raise both rendezvous
# timeouts — correctness tests care about results, not collective latency.
if "xla_cpu_collective_timeout_seconds" not in flags:
    flags += (" --xla_cpu_collective_timeout_seconds=600"
              " --xla_cpu_collective_call_terminate_timeout_seconds=600")
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

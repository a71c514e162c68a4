"""Test configuration: force an 8-device CPU mesh so sharding paths are
exercised without TPU hardware, and keep x64 on for 64-bit k-mer words.

The container's sitecustomize registers the axon TPU backend in every
process, so the env var alone is not enough — jax.config must be updated
before any computation."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import bronko_tpu  # noqa: F401,E402  (enables jax x64)

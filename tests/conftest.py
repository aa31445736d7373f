"""Test configuration: run JAX on a virtual 8-device CPU mesh so multi-chip
sharding/collective code paths are exercised without TPU hardware (the
standard fake-backend trick; SURVEY.md §4).

The container's sitecustomize imports jax at interpreter start and the env
pins JAX_PLATFORMS to the TPU plugin, so plain env-var edits here are too
late — use jax.config.update instead. XLA_FLAGS still applies because no
backend has been initialized yet when conftest runs.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

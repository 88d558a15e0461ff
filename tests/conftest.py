"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding paths are validated on
host-platform virtual devices (SURVEY.md §4 takeaway (c)/(d)).

Note: the environment preimports jax (sitecustomize) with the TPU platform
selected, so the platform must be overridden via jax.config at runtime —
env vars alone are too late.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

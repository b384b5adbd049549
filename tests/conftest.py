"""Test configuration: force the JAX CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (SURVEY.md §4 strategy).

Note: this environment imports jax at interpreter startup (sitecustomize in
the TPU image), so env vars set here are too late for jax's config latch —
use jax.config.update, which works as long as no backend has initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, (
    "expected 8 virtual CPU devices; a backend initialized too early: "
    f"{jax.devices()}")

"""Test harness config: force JAX onto a virtual 8-device CPU mesh so
multi-chip sharding paths compile and execute without TPU hardware.

NB: this environment preimports jax at interpreter startup
(sitecustomize), so setting JAX_PLATFORMS via os.environ here is too
late — use jax.config.update instead. XLA_FLAGS is still honored via
os.environ because the CPU backend has not been initialized yet when
conftest runs.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

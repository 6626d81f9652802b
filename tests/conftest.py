"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated on host CPU devices (the driver
separately dry-runs the multi-chip path); kernel/math tests also run on CPU
for speed and determinism.

Note: this image's sitecustomize imports jax at interpreter start (to
register a TPU plugin), so env vars alone are too late — we also update
jax.config before any backend is initialized (backend init is lazy).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

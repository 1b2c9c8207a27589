"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Must set env vars before jax is first imported (sharding tests use the
virtual device mesh; float64 lets parity oracles run at numpy precision).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# The environment's TPU plugin (if any) may override JAX_PLATFORMS at
# interpreter start; force the CPU backend for tests explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
assert jax.default_backend() == "cpu", jax.default_backend()

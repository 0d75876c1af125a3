"""Test harness: run everything on a virtual 8-device CPU mesh so sharding code
paths are exercised without TPU hardware (SURVEY.md §4: the TPU-native analog of
the reference's missing multi-node test story)."""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (a remote TPU
# tunnel) — running unit tests over it means every compile is a remote RPC.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# CPU test runs should not inherit a low (bf16-like) default matmul precision:
# geometry assertions below are written against f32 math.
jax.config.update("jax_default_matmul_precision", "highest")

"""Test config: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPUs via
`--xla_force_host_platform_device_count=8`; numerics tests are
platform-independent and need f32 matmul exactness, so tests never run on
the (bf16-MXU, tunneled) axon TPU backend. The axon sitecustomize sets
JAX_PLATFORMS=axon at interpreter start, so we override through
jax.config after import, before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

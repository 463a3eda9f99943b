"""Test configuration: force an 8-device virtual CPU mesh.

The session environment preloads an `axon` TPU PJRT plugin via sitecustomize
(and sets JAX_PLATFORMS=axon), so plain env vars are not enough — jax is
already imported and its platform list says "axon". Override the config
directly before any backend initializes. Sharding/pjit tests then run against
8 fake CPU devices exactly as the driver's multi-chip dry-run does, and
numerical parity tests compare against the torch reference with exact f32
CPU matmuls.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

"""Test env: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip shardings are validated on virtual CPU devices per the build
contract (real multi-chip hardware is not available in CI).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize registers the TPU backend in every interpreter and
# overrides JAX_PLATFORMS; force the config back to CPU before any backend
# is initialized so tests never dispatch over the TPU tunnel.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

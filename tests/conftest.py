"""Test env: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip shardings are validated on virtual CPU devices per the build
contract (real multi-chip hardware is not available in CI).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

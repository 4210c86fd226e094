"""Test configuration: force a virtual 8-device CPU mesh.

Multi-chip sharding is validated on a virtual CPU mesh (no multi-chip
TPU hardware is available in CI); this must run before jax is imported
anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

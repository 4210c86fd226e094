"""Test configuration: force a virtual 8-device CPU mesh.

Multi-chip sharding is validated on a virtual CPU mesh (no multi-chip
TPU hardware in CI).  The environment's axon sitecustomize registers
the TPU backend in every interpreter and presets ``JAX_PLATFORMS=axon``,
so we must *overwrite* (not setdefault) and also pin the config after
import.  Set ``LRGE_TEST_TPU=1`` to run the suite on the real chip
instead (single-device tests only).
"""

import os

# tests use small read sets on purpose; keep them on the device path
# instead of the sparse-bucket host routing (a production optimisation)
os.environ.setdefault("LRGE_DEVICE_MIN_ROWS", "0")

if not os.environ.get("LRGE_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

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


import time as _time

_SESSION_T0 = _time.time()


def pytest_sessionfinish(session, exitstatus):
    """LRGE_TEST_ARTIFACT=<path>: write an auditable run summary
    (pass/fail counts, duration, collected) so headline test claims in
    VERDICT/round notes have a committed artifact behind them."""
    path = os.environ.get("LRGE_TEST_ARTIFACT")
    if not path:
        return
    import json
    import time

    tr = session.config.pluginmanager.get_plugin("terminalreporter")
    stats = {k: len(v) for k, v in tr.stats.items() if k}
    dur = time.time() - _SESSION_T0
    with open(path, "w") as fh:
        json.dump(
            {
                "exitstatus": int(exitstatus),
                "collected": int(session.testscollected),
                "stats": stats,
                "duration_s": round(dur, 1),
            },
            fh,
            indent=1,
        )
        fh.write("\n")

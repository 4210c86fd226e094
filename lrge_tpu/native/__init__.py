"""Native host runtime loader.

Builds (once, into this directory) and loads the ``_lrge_native`` C++
extension.  Import is best-effort: everything has a pure-Python
fallback, so a missing compiler only costs speed.
"""

from __future__ import annotations

import logging
import os
import subprocess
import sys
import sysconfig
from pathlib import Path

logger = logging.getLogger("lrge")

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "lrge_native.cpp"
_SO = _HERE / "_lrge_native.so"


def _build() -> bool:
    inc = sysconfig.get_paths()["include"]
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        f"-I{inc}",
        str(_SRC),
        "-o",
        str(_SO),
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=240)
    except Exception as e:  # pragma: no cover
        logger.debug("native build failed to launch: %s", e)
        return False
    if res.returncode != 0:
        logger.debug("native build failed: %s", res.stderr[-2000:])
        return False
    return True


native = None
if os.environ.get("LRGE_NO_NATIVE") != "1":
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            _build()
        if _SO.exists():
            sys.path.insert(0, str(_HERE))
            try:
                import _lrge_native as native  # type: ignore
            finally:
                sys.path.pop(0)
    except Exception as e:  # pragma: no cover
        logger.debug("native extension unavailable: %s", e)
        native = None

HAVE_NATIVE = native is not None

"""Shared build-on-demand for the native IO library (native/libumxio.so).

pytest collects modules alphabetically, so test_flac.py ran its
``native.available()`` skip check BEFORE test_native.py's build step
had produced the library — on a fresh checkout the 21 FLAC tests
silently skipped until the second pytest run.  Both modules now gate on
this helper, which builds the library (the native toolchain is part of
the environment) the first time either needs it.
"""

from __future__ import annotations

import os
import subprocess

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")


def ensure_native_built() -> bool:
    """Return True once native/libumxio.so is loadable, building it if needed."""
    from umx_tpu.io import native

    if native.available():
        return True
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    except Exception:
        return False
    native._load_lib.cache_clear()
    return native.available()

"""Native (C++) host-path accelerators, consumed via ctypes.

Build on demand with `build_native()` (g++ is baked into the image; pybind11
is not, so the ABI is plain C).  Everything here has a pure-Python reference
implementation in data/ — the native layer is a drop-in speedup, never a
correctness dependency.
"""
from __future__ import annotations

import os
import subprocess
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libwordpiece.so")


def build_native(force: bool = False) -> Optional[str]:
    """Compile libwordpiece.so if needed. Returns its path or None."""
    src = os.path.join(_DIR, "wordpiece.cpp")
    if os.path.exists(_SO) and not force and \
            os.path.getmtime(_SO) >= os.path.getmtime(src):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", _SO, src],
            check=True, capture_output=True, timeout=300)
        return _SO
    except Exception:
        return None


def native_library_path() -> Optional[str]:
    # Always route through build_native(): it no-ops when the .so is fresh
    # and rebuilds when wordpiece.cpp is newer, so source edits can never be
    # silently shadowed by a stale committed binary.
    return build_native()

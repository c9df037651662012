"""Native host-runtime components (C, loaded via ctypes).

The compute path of this framework is compiled XLA; the host runtime around
it is native C here — the analogue of the reference's C++ board engine and
observability code:

  * ``render.c``  — byte-exact ASCII/ANSI renderer (reference
    twixtboard.cc:278-448)
  * ``engine.c``  — single-state host engine: reset/apply/legal/result +
    random-game drivers (reference twixtboard.cc:168-640, twixt.h:31-112),
    wrapped by :mod:`twixt_for_open_spiel_tpu.native.engine`

Each source is built on first use with the system compiler into a shared
object cached next to it; all users must tolerate build failure and fall
back to the pure-Python implementations (game/render.py, the jitted ops
core), which are behaviour-identical (enforced by tests/test_native.py and
tests/test_native_engine.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))

_lock = threading.Lock()
_libs = {}


def _build(src: str, so: str) -> bool:
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return True
    cc = os.environ.get("CC", "cc")
    cmd = [cc, "-O2", "-shared", "-fPIC", "-o", so + ".tmp", src]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(so + ".tmp", so)
        return True
    except Exception:
        return False


def load_lib(stem: str) -> Optional[ctypes.CDLL]:
    """Build (if needed) and load ``<stem>.c``; None on failure (cached)."""
    with _lock:
        if stem in _libs:
            return _libs[stem]
        src = os.path.join(_DIR, stem + ".c")
        so = os.path.join(_DIR, f"_{stem}_c.so")
        lib = None
        if _build(src, so):
            try:
                lib = ctypes.CDLL(so)
            except Exception:
                lib = None
        _libs[stem] = lib
        return lib


def load() -> Optional[ctypes.CDLL]:
    """Build (if needed) and load the native renderer; None on failure."""
    lib = load_lib("render")
    if lib is not None and not hasattr(lib, "_sigs_set"):
        lib.twixt_render.restype = ctypes.c_size_t
        lib.twixt_render.argtypes = [
            ctypes.c_char_p,  # color int8[n*n]
            ctypes.c_char_p,  # links uint8[n*n]
            ctypes.c_int,     # size
            ctypes.c_bool,    # swapped
            ctypes.c_int,     # result
            ctypes.c_bool,    # ansi
            ctypes.c_char_p,  # out buffer
        ]
        lib.twixt_render_capacity.restype = ctypes.c_size_t
        lib.twixt_render_capacity.argtypes = [ctypes.c_int]
        lib._sigs_set = True
    return lib

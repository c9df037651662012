"""Native host-runtime components (C, loaded via ctypes).

The compute path of this framework is compiled XLA; the host runtime around
it (rendering/serialization — the reference's C++ observability code,
twixtboard.cc:278-448) is native C here.  Built on first use with the
system compiler into a shared object cached next to the source; all users
must tolerate build failure and fall back to the pure-Python
implementations (game/render.py), which are byte-for-byte equivalent
(enforced by tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "render.c")
_SO = os.path.join(_DIR, "_render_c.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(
        _SRC
    ):
        return True
    cc = os.environ.get("CC", "cc")
    cmd = [cc, "-O2", "-shared", "-fPIC", "-o", _SO + ".tmp", _SRC]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
        os.replace(_SO + ".tmp", _SO)
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Build (if needed) and load the native renderer; None on failure."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
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
            _lib = lib
        except Exception:
            _lib = None
        return _lib

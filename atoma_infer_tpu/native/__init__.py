"""Native (C++) runtime core: ctypes bindings + lazy build.

The compute path is JAX/Pallas; this package binds the host-side native core
(csrc/atoma_core.cpp) — block manager state machine + input-prep helpers —
the C++ counterpart of the reference's native (Rust) engine internals.
Builds the shared library on first use with g++ (cached under csrc/build/).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

logger = logging.getLogger(__name__)

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB_PATH = os.path.join(_CSRC, "build", "libatoma_core.so")

_lib: Optional[ctypes.CDLL] = None
_lock = threading.Lock()


def _declare(lib: ctypes.CDLL) -> ctypes.CDLL:
    c = ctypes
    i64p = c.POINTER(c.c_int64)
    i32p = c.POINTER(c.c_int32)
    lib.abm_create.restype = c.c_void_p
    lib.abm_create.argtypes = [c.c_int, c.c_int, c.c_int, c.c_double, c.c_int]
    lib.abm_destroy.argtypes = [c.c_void_p]
    lib.abm_can_allocate.restype = c.c_int
    lib.abm_can_allocate.argtypes = [c.c_void_p, c.c_int]
    lib.abm_allocate.restype = c.c_int
    lib.abm_allocate.argtypes = [c.c_void_p, i64p, c.c_int, c.c_int]
    lib.abm_can_append_slots.restype = c.c_int
    lib.abm_can_append_slots.argtypes = [c.c_void_p, c.c_int, c.c_int]
    lib.abm_append_slot.restype = c.c_int
    lib.abm_append_slot.argtypes = [c.c_void_p, c.c_int64, c.c_int, i32p]
    lib.abm_fork.restype = c.c_int
    lib.abm_fork.argtypes = [c.c_void_p, c.c_int64, c.c_int64]
    lib.abm_last_block_shared.restype = c.c_int
    lib.abm_last_block_shared.argtypes = [c.c_void_p, c.c_int64]
    lib.abm_can_swap_in.restype = c.c_int
    lib.abm_can_swap_in.argtypes = [c.c_void_p, i64p, c.c_int, c.c_int]
    lib.abm_swap_in.restype = c.c_int
    lib.abm_swap_in.argtypes = [c.c_void_p, i64p, c.c_int, i32p]
    lib.abm_can_swap_out.restype = c.c_int
    lib.abm_can_swap_out.argtypes = [c.c_void_p, i64p, c.c_int]
    lib.abm_swap_out.restype = c.c_int
    lib.abm_swap_out.argtypes = [c.c_void_p, i64p, c.c_int, i32p]
    lib.abm_free_seq.argtypes = [c.c_void_p, c.c_int64]
    lib.abm_reset.argtypes = [c.c_void_p]
    lib.abm_has_table.restype = c.c_int
    lib.abm_has_table.argtypes = [c.c_void_p, c.c_int64]
    lib.abm_get_table.restype = c.c_int
    lib.abm_get_table.argtypes = [c.c_void_p, c.c_int64, i32p, c.c_int]
    lib.abm_num_free_device.restype = c.c_int
    lib.abm_num_free_device.argtypes = [c.c_void_p]
    lib.abm_num_free_host.restype = c.c_int
    lib.abm_num_free_host.argtypes = [c.c_void_p]
    lib.fill_slot_mapping.argtypes = [
        i32p, c.c_int, c.c_int, c.c_int, c.c_int, i32p,
    ]
    # Prefix caching (content-hash allocation + computed tracking + LRU).
    lib.abm_enable_prefix_caching.argtypes = [c.c_void_p, c.c_int]
    lib.abm_allocate_cached.restype = c.c_int
    lib.abm_allocate_cached.argtypes = [
        c.c_void_p, i64p, c.c_int, c.c_int, i64p, c.c_int,
    ]
    lib.abm_mark_computed.argtypes = [c.c_void_p, c.c_int64, c.c_int]
    lib.abm_computed_prefix.restype = c.c_int
    lib.abm_computed_prefix.argtypes = [c.c_void_p, c.c_int64, i32p, c.c_int]
    lib.abm_touch.argtypes = [c.c_void_p, c.c_int64, c.c_double]
    return lib


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native core; None if unavailable."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        src = os.path.join(_CSRC, "atoma_core.cpp")
        stale = (
            os.path.exists(_LIB_PATH)
            and os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
        )
        if not os.path.exists(_LIB_PATH) or stale:
            try:
                subprocess.run(
                    ["make", "-C", _CSRC],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception as e:  # pragma: no cover - toolchain-specific
                logger.warning("native core build failed: %s", e)
                return None
        try:
            _lib = _declare(ctypes.CDLL(_LIB_PATH))
        except OSError as e:  # pragma: no cover
            logger.warning("native core load failed: %s", e)
            return None
        return _lib


def available() -> bool:
    return load() is not None

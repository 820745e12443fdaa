"""ctypes bridge to the native C++ gate-layer scheduler
(native/fusion_planner.cpp).

Builds the shared library on first use (g++ -O2 -shared) and caches it next
to this module; callers fall back to the pure-Python planner (identical
plans — differential-tested) when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LIB = None
_LIB_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "fusion_planner.cpp")
_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "_libfusionplanner.so")


def _load():
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    try:
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC,
                 "-o", _SO],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(_SO)
        lib.rocq_plan_layer_mp.restype = ctypes.c_int
        lib.rocq_plan_layer_mp.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_int,
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


class Unschedulable(Exception):
    """A gate has more out-of-window qubits than max_pairs allows."""


def plan_layer_native(n: int, supports: Sequence[Tuple[int, ...]],
                      reach: int, max_pairs: int,
                      anchors: Sequence[Tuple[int, ...]] = None
                      ) -> Optional[List[tuple]]:
    """Run the C++ multi-pair scheduler; returns a list of
    ('pass', pair_bits_tuple, gate_idx_tuple) records, or None when the
    library is unavailable (callers fall back to the Python planner).
    ``anchors[i]`` lists the qubits that must fit the window/pair set
    (default: the full support)."""
    lib = _load()
    if lib is None:
        return None
    num = len(supports)
    if anchors is None:
        anchors = supports
    q0 = np.asarray([s[0] for s in supports], np.int32)
    q1 = np.asarray([s[1] if len(s) > 1 else -1 for s in supports], np.int32)
    a0 = np.asarray([a[0] if len(a) > 0 else -1 for a in anchors], np.int32)
    a1 = np.asarray([a[1] if len(a) > 1 else -1 for a in anchors], np.int32)
    capacity = 4 * num + (max_pairs + 4) * (2 * num + 2) + 16
    out = np.zeros(capacity, np.int32)
    rc = lib.rocq_plan_layer_mp(n, reach, max_pairs, num, q0, q1, a0, a1,
                                out, capacity)
    if rc < 0:
        return None
    items: List[tuple] = []
    w = 0
    while w < rc:
        w += 1  # record tag (always 1 = pass)
        npairs = int(out[w])
        w += 1
        pairs = tuple(int(v) for v in out[w:w + npairs])
        w += npairs
        count = int(out[w])
        w += 1
        idx = tuple(int(v) for v in out[w:w + count])
        w += count
        items.append(("pass", pairs, idx))
    return items

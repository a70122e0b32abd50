"""ctypes bindings for the native kmerio data loader (native/kmerio.c).

Falls back silently to the NumPy paths when the shared library has not
been built (`make -C native`); every caller treats this module as an
optional accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for cand in (
        os.path.join(here, "native", "libkmerio.so"),
        os.path.join(os.path.dirname(__file__), "libkmerio.so"),
    ):
        if os.path.exists(cand):
            return cand
    return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.kmerio_parse_fasta.restype = ctypes.c_long
        lib.kmerio_parse_fasta.argtypes = [
            ctypes.c_char_p,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.kmerio_pack2.restype = None
        lib.kmerio_unpack2.restype = None
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def parse_fasta_bytes(data: bytes) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """One native pass: FASTA text -> (codes, fragment offsets).

    Returns None if the native library is unavailable; raises ValueError on
    malformed FASTA (same conditions as the reference,
    lib/core/kmer_counter.h:161-209)."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(data)
    codes = np.empty(max(n, 1), dtype=np.uint8)
    offsets = np.zeros(n + 2, dtype=np.int64)
    rc = lib.kmerio_parse_fasta(
        data,
        n,
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc == -1:
        raise ValueError("FASTA files should have an even number of lines")
    if rc in (-2, -3):
        raise ValueError("invalid FASTA file")
    n_frag = int(rc)
    n_codes = int(offsets[n_frag]) if n_frag else 0
    return codes[:n_codes].copy(), offsets[: n_frag + 1].copy()


def pack2(codes: np.ndarray) -> np.ndarray:
    """2-bit pack (4 bases/byte); numpy fallback when no native lib."""
    lib = get_lib()
    n = codes.shape[0]
    out = np.zeros((n + 3) // 4, dtype=np.uint8)
    if lib is not None and n:
        lib.kmerio_pack2(
            codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out
    for sh in range(4):
        part = codes[sh::4]
        out[: part.shape[0]] |= part << (sh * 2)
    return out


def unpack2(packed: np.ndarray, n: int) -> np.ndarray:
    lib = get_lib()
    out = np.empty(n, dtype=np.uint8)
    if lib is not None and n:
        lib.kmerio_unpack2(
            packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out
    for sh in range(4):
        vals = (packed >> (sh * 2)) & 3
        out[sh::4] = vals[: out[sh::4].shape[0]]
    return out

"""ctypes bridge to the native chemistry kernel (_cchem.cpp).

Builds the shared library on first use (g++, cached next to the source) and
exposes fingerprint entry points that are bit-identical to the python
implementation (asserted by tests/test_native_chem.py). Falls back to the
python path when no compiler is available.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

log = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_cchem.cpp")
# plain shared object loaded via ctypes; named libcchem so the python
# import system never mistakes it for a CPython extension module
_LIB = os.path.join(os.path.dirname(os.path.abspath(__file__)), "libcchem.so.1")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O2", "-std=c++20", "-shared", "-fPIC", "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except Exception as e:  # no compiler / build error -> python fallback
        log.warning("native chem build failed (%s); using python fallback", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_LIB)
        lib.cchem_morgan_fp.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32)]
        lib.cchem_morgan_fp.restype = ctypes.c_int
        lib.cchem_reaction_fp.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32)]
        lib.cchem_reaction_fp.restype = ctypes.c_int
        lib.cchem_morgan_fp_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int8)]
        lib.cchem_canonical_smiles.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
        lib.cchem_canonical_smiles.restype = ctypes.c_int
        lib.cchem_canonical_smiles_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int]
        lib.cchem_canonical_smiles_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def native_morgan_fingerprint(smiles: str, radius: int = 2, n_bits: int = 1024,
                              counts: bool = False) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    out = np.zeros((n_bits,), dtype=np.int32)
    lib.cchem_morgan_fp(smiles.encode(), radius, n_bits, int(counts),
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out if counts else out.astype(np.uint8)


def native_reaction_fingerprint(rxn_smiles: str, radius: int = 2,
                                n_bits: int = 2048) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    out = np.zeros((n_bits,), dtype=np.int32)
    rc = lib.cchem_reaction_fp(rxn_smiles.encode(), radius, n_bits,
                               out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        raise ValueError(f"not a reaction SMILES: {rxn_smiles!r}")
    return out


def native_morgan_batch(smiles_list: Sequence[str], radius: int = 2,
                        n_bits: int = 1024) -> np.ndarray:
    """Batched binary fingerprints -> (N, n_bits) int8 (one C call)."""
    lib = get_lib()
    assert lib is not None
    blob = b"\x00".join(s.encode() for s in smiles_list) + b"\x00"
    out = np.zeros((len(smiles_list), n_bits), dtype=np.int8)
    lib.cchem_morgan_fp_batch(blob, len(smiles_list), radius, n_bits,
                              out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)))
    return out


def native_canonical_batch(smiles_list: Sequence[str]) -> list:
    """Batched canonical SMILES via the C++ engine, one ctypes crossing for
    the whole list; unparseable entries echo back verbatim (reference
    evaluate.py:27-32 contract)."""
    lib = get_lib()
    assert lib is not None
    if not smiles_list:
        return []
    blob = b"\x00".join(s.encode() for s in smiles_list) + b"\x00"
    cap = 4 * len(blob) + 64 * len(smiles_list)
    buf = ctypes.create_string_buffer(cap)
    n = lib.cchem_canonical_smiles_batch(blob, len(smiles_list), buf, cap)
    assert n > 0, "batch canonicalization buffer overflow"
    return bytes(buf.raw[:n - 1]).decode().split("\x00")


def native_canonical_smiles(smiles: str, fallback: Optional[str] = None) -> str:
    """Canonical SMILES via the C++ engine (bit-identical to
    chem.canonical_smiles_strict); returns `fallback` (default: the input,
    matching reference evaluate.py:27-32) on parse failure."""
    lib = get_lib()
    assert lib is not None
    buf = ctypes.create_string_buffer(4 * len(smiles) + 64)
    rc = lib.cchem_canonical_smiles(smiles.encode(), buf, len(buf))
    if rc != 0:
        return smiles if fallback is None else fallback
    return buf.value.decode()

"""ctypes bridge to the native WordPiece kernel (_ctok.cpp).

Same pattern as chem/native.py: builds the shared library on first use and
falls back to the python implementation when no compiler is available. The
native path handles ASCII text only (the corpus is ~pure ASCII); any text
with non-ASCII bytes is routed through the python tokenizer, so results
are bit-identical either way (tests/test_native_tokenizer.py fuzz).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

log = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_ctok.cpp")
_LIB = os.path.join(os.path.dirname(os.path.abspath(__file__)), "libctok.so.1")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O2", "-std=c++20", "-shared", "-fPIC", "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except Exception as e:
        log.warning("native tokenizer build failed (%s); python fallback", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_LIB)
        lib.ctok_encoder_new.restype = ctypes.c_int32
        lib.ctok_encoder_new.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32]
        lib.ctok_encode.restype = ctypes.c_int32
        lib.ctok_encode.argtypes = [
            ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.ctok_smiles_encode.restype = ctypes.c_int32
        lib.ctok_smiles_encode.argtypes = [
            ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
        return _lib


class NativeWordPiece:
    """Handle to a C++ encoder over a fixed vocab; encode() returns
    wordpiece ids (no CLS/SEP) or None when the text needs the python
    path (non-ASCII) or the library is unavailable."""

    def __init__(self, token_to_id, unk_id: int):
        self._handle = None
        lib = get_lib()
        if lib is None:
            return
        parts: List[bytes] = []
        offs = [0]
        ids: List[int] = []
        for tok, tid in token_to_id.items():
            b = tok.encode("utf-8")
            parts.append(b)
            offs.append(offs[-1] + len(b))
            ids.append(tid)
        data = b"".join(parts)
        offs_arr = (ctypes.c_int32 * len(offs))(*offs)
        ids_arr = (ctypes.c_int32 * len(ids))(*ids)
        self._handle = lib.ctok_encoder_new(data, offs_arr, ids_arr,
                                            len(ids), unk_id)
        self._lib = lib
        self._buf = (ctypes.c_int32 * 8192)()

    def __del__(self):
        if getattr(self, "_handle", None) is not None:
            try:
                self._lib.ctok_encoder_free(self._handle)
            except Exception:
                pass

    def encode(self, text: str, max_chars_per_word: int = 100,
               lower: bool = True) -> Optional[List[int]]:
        if self._handle is None or not text.isascii():
            return None
        raw = text.encode("ascii")
        while True:
            n = self._lib.ctok_encode(self._handle, raw, len(raw),
                                      max_chars_per_word, int(lower),
                                      self._buf, len(self._buf))
            if n == -1:  # grow the output buffer
                self._buf = (ctypes.c_int32 * (len(self._buf) * 2))()
                continue
            if n < 0:
                return None
            return list(np.frombuffer(self._buf, dtype=np.int32, count=n))


    def encode_smiles(self, smiles: str) -> Optional[List[int]]:
        """Schwaller-regex SMILES scan + whole-token vocab lookup (the
        SmilesTokenizer algorithm); None for non-ASCII / unavailable."""
        if self._handle is None or not smiles.isascii():
            return None
        raw = smiles.encode("ascii")
        while True:
            n = self._lib.ctok_smiles_encode(self._handle, raw, len(raw),
                                             self._buf, len(self._buf), None)
            if n == -1:
                self._buf = (ctypes.c_int32 * (len(self._buf) * 2))()
                continue
            if n < 0:
                return None
            return list(np.frombuffer(self._buf, dtype=np.int32, count=n))


def native_tokenizer_available() -> bool:
    return get_lib() is not None

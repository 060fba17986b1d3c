"""ctypes loader for the C++ native runtime (native/*.cpp).

Compiles ``libqasr_native.so`` with the system g++ on first use (cached under
the package build dir, keyed by source hash) and exposes thin Python handles.
Everything degrades gracefully: callers treat a ``None`` handle as "use the
pure-Python path" and the two paths are tested for exact agreement.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Dict, List, Optional

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build")
_SOURCES = ["bpe.cpp", "editdist.cpp", "wavio.cpp", "flac.cpp", "resample.cpp"]


def _source_hash() -> str:
    h = hashlib.sha1()
    for src in _SOURCES:
        with open(os.path.join(_NATIVE_DIR, src), "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def _build() -> Optional[str]:
    tag = _source_hash()
    so_path = os.path.join(_BUILD_DIR, f"libqasr_native_{tag}.so")
    if os.path.exists(so_path):
        return so_path
    os.makedirs(_BUILD_DIR, exist_ok=True)
    srcs = [os.path.join(_NATIVE_DIR, s) for s in _SOURCES]
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", *srcs, "-o", so_path]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return so_path
    except Exception:
        return None


_LIB = "unset"


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB == "unset":
        path = _build()
        if path is None:
            _LIB = None
        else:
            lib = ctypes.CDLL(path)
            lib.qasr_bpe_create.restype = ctypes.c_void_p
            lib.qasr_bpe_create.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64,
            ]
            lib.qasr_bpe_destroy.argtypes = [ctypes.c_void_p]
            lib.qasr_bpe_merge.restype = ctypes.c_int32
            lib.qasr_bpe_merge.argtypes = [
                ctypes.c_void_p,
                ctypes.c_char_p,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int32,
            ]
            lib.qasr_levenshtein.restype = ctypes.c_int32
            lib.qasr_levenshtein.argtypes = [
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int32,
            ]
            lib.qasr_wav_decode.restype = ctypes.c_int64
            lib.qasr_wav_decode.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
            ]
            lib.qasr_flac_decode.restype = ctypes.c_int64
            lib.qasr_flac_decode.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
            ]
            _LIB = lib
    return _LIB


def native_wav_decode(data: bytes, target_rate: int = 16000):
    """WAV bytes -> mono float32 at target_rate via the C++ decoder.

    Returns None when the native lib is unavailable; raises ValueError on
    malformed/unsupported input."""
    lib = _lib()
    if lib is None:
        return None
    import numpy as np

    n = lib.qasr_wav_decode(data, len(data), target_rate, None, 0)
    if n == -2:
        # Unsupported-but-valid format (e.g. WAVE_FORMAT_EXTENSIBLE, exotic
        # widths): None = "try the next decoder in the chain", same as when
        # the native lib is missing.  Only malformed input raises.
        return None
    if n < 0:
        raise ValueError(f"WAV decode failed (code {n})")
    out = np.empty(int(n), np.float32)
    got = lib.qasr_wav_decode(
        data, len(data), target_rate,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
    )
    if got < 0:
        raise ValueError(f"WAV decode failed (code {got})")
    return out[:got]


def native_flac_decode(data: bytes, target_rate: int = 16000):
    """FLAC bytes -> mono float32 at target_rate via the C++ decoder
    (native/flac.cpp).  Returns None when the native lib is unavailable;
    raises ValueError on malformed/unsupported input."""
    lib = _lib()
    if lib is None:
        return None
    import numpy as np

    n = lib.qasr_flac_decode(data, len(data), target_rate, None, 0)
    if n == -2:
        return None  # unsupported variant: defer to the next decoder
    if n < 0:
        raise ValueError(f"FLAC decode failed (code {n})")
    out = np.empty(int(n), np.float32)
    got = lib.qasr_flac_decode(
        data, len(data), target_rate,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
    )
    if got < 0:
        raise ValueError(f"FLAC decode failed (code {got})")
    return out[:got]


def native_levenshtein(a_ids, b_ids) -> Optional[int]:
    """Edit distance over int-id sequences via the C++ core; None if no lib."""
    lib = _lib()
    if lib is None:
        return None
    import numpy as np

    a = np.ascontiguousarray(a_ids, np.int32)
    b = np.ascontiguousarray(b_ids, np.int32)
    return int(
        lib.qasr_levenshtein(
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(a),
            b.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(b),
        )
    )


class _BPEHandle:
    """Per-rank-table native BPE state.

    Cache entries hold a strong reference to the ranks dict alongside the
    native handle: keying by ``id(ranks)`` alone would let a collected dict's
    id be reused by a different table, silently serving stale merges.  The
    output buffer is thread-local so concurrent encodes never share it.
    """

    def __init__(self):
        # id -> (ranks, handle); keeping `ranks` alive pins the id.
        self._tables: Dict[int, tuple] = {}
        self._tls = threading.local()

    def _out_buf(self):
        buf = getattr(self._tls, "out", None)
        if buf is None:
            buf = self._tls.out = (ctypes.c_int32 * 4096)()
        return buf

    def _table_for(self, ranks: Dict[bytes, int]) -> Optional[ctypes.c_void_p]:
        entry = self._tables.get(id(ranks))
        if entry is not None and entry[0] is ranks:
            return entry[1]
        lib = _lib()
        if lib is None:
            return None
        items = list(ranks.items())
        blob = b"".join(k for k, _ in items)
        offsets = (ctypes.c_int64 * (len(items) + 1))()
        pos = 0
        for i, (k, _) in enumerate(items):
            offsets[i] = pos
            pos += len(k)
        offsets[len(items)] = pos
        vals = (ctypes.c_int32 * len(items))(*[v for _, v in items])
        handle = ctypes.c_void_p(
            lib.qasr_bpe_create(blob, offsets, vals, len(items))
        )
        self._tables[id(ranks)] = (ranks, handle)
        return handle

    def merge(self, piece: bytes, ranks: Dict[bytes, int]) -> List[int]:
        lib = _lib()
        table = self._table_for(ranks)
        out = self._out_buf()
        n = lib.qasr_bpe_merge(table, piece, len(piece), out, 4096)
        if n < 0:  # capacity/unknown-byte edge: pure-Python fallback
            from .tokenizer.bpe import _bpe_merge_py

            return _bpe_merge_py(piece, ranks)
        return list(out[:n])


def bpe_handle() -> _BPEHandle:
    if _lib() is None:
        raise RuntimeError("native library unavailable (g++ build failed)")
    return _BPEHandle()

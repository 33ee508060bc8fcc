"""ctypes bindings for the native FASTA/FASTQ codec (native/fastx_codec.cpp).

Builds the shared library on first use (g++ is baked into the image; pybind11 is
not, hence ctypes). Every entry point has a pure-Python fallback, so the
pipeline works even where a compiler is unavailable; gzip inputs always take
the Python path (the codec mmaps raw bytes).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

log = logging.getLogger("tpu_euler")

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO = os.path.join(_NATIVE_DIR, "libfastx_codec.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
                os.path.join(_NATIVE_DIR, "fastx_codec.cpp")
            ):
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR, "-s"],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(_SO)
            lib.fq_scan.restype = ctypes.c_int
            lib.fq_scan.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.fq_encode.restype = ctypes.c_int64
            lib.fq_encode.argtypes = [
                ctypes.c_char_p,
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_int32,
                ctypes.c_int8,
                ctypes.c_int32,
            ]
            lib.fa_scan.restype = ctypes.c_int
            lib.fa_scan.argtypes = lib.fq_scan.argtypes
            lib.fa_encode.restype = ctypes.c_int64
            lib.fa_encode.argtypes = [
                ctypes.c_char_p,
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_int32,
                ctypes.c_int32,
            ]
            lib.fq_scan_range.restype = ctypes.c_int
            lib.fq_scan_range.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.fq_encode_range.restype = ctypes.c_int64
            lib.fq_encode_range.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_int32,
                ctypes.c_int8,
                ctypes.c_int32,
            ]
            lib.fa_scan_range.restype = ctypes.c_int
            lib.fa_scan_range.argtypes = lib.fq_scan_range.argtypes
            lib.fa_encode_range.restype = ctypes.c_int64
            lib.fa_encode_range.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_int32,
                ctypes.c_int32,
            ]
            lib.pack_codes.restype = None
            lib.pack_codes.argtypes = [
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_int32,
                ctypes.c_void_p,
                ctypes.c_void_p,
                ctypes.c_int32,
            ]
            _lib = lib
        except Exception as e:
            log.info("native fastx codec unavailable (%s); using Python parser", e)
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def encode_file_native(
    path: str,
    read_len: int = 0,
    min_qual: int = 0,
    min_len_keep: int = 1,
) -> np.ndarray | None:
    """Parse+encode a plain FASTA/FASTQ file into an [R, read_len] int8 matrix.

    Returns None if the native codec can't handle this input (gz, load failure)
    — caller falls back to the Python parser. read_len=0 = use the file's max.
    """
    lib = _load()
    if lib is None or path.endswith(".gz"):
        return None
    stem = path
    is_fq = stem.endswith((".fq", ".fastq"))
    is_fa = stem.endswith((".fa", ".fasta", ".fna"))
    if not (is_fq or is_fa):
        return None
    n = ctypes.c_int64()
    mx = ctypes.c_int64()
    scan = lib.fq_scan if is_fq else lib.fa_scan
    if scan(path.encode(), ctypes.byref(n), ctypes.byref(mx)) != 0 or n.value == 0:
        return None
    rl = read_len or int(mx.value)
    out = np.empty((n.value, rl), dtype=np.int8)
    if is_fq:
        r = lib.fq_encode(
            path.encode(), out.ctypes.data, n.value, rl, min_qual, min_len_keep
        )
    else:
        r = lib.fa_encode(path.encode(), out.ctypes.data, n.value, rl, min_len_keep)
    if r < 0:
        return None
    return out[:r]


def encode_file_shard_native(
    path: str,
    shard: int,
    num_shards: int,
    read_len: int = 0,
    min_qual: int = 0,
    min_len_keep: int = 1,
) -> np.ndarray | None:
    """Parse+encode shard i of n of a plain FASTA/FASTQ file (byte-range, D2).

    Each host mmaps only its ~1/n byte slice (resynced to record boundaries in
    native code), so per-host parse cost is O(file/n). Returns None when the
    codec can't handle the input (gz, load failure) — caller falls back to the
    Python byte-range parser (io.fastx.read_shard). Pass an explicit read_len
    when shards must agree on row width (a shard's max read length is local).
    """
    lib = _load()
    if lib is None or path.endswith(".gz"):
        return None
    is_fq = path.endswith((".fq", ".fastq"))
    is_fa = path.endswith((".fa", ".fasta", ".fna"))
    if not (is_fq or is_fa):
        return None
    size = os.path.getsize(path)
    begin = size * shard // num_shards
    end = size * (shard + 1) // num_shards
    n = ctypes.c_int64()
    mx = ctypes.c_int64()
    scan = lib.fq_scan_range if is_fq else lib.fa_scan_range
    if scan(path.encode(), begin, end, ctypes.byref(n), ctypes.byref(mx)) != 0:
        return None
    rl = read_len or int(mx.value)
    if n.value == 0 or rl == 0:
        return np.empty((0, max(rl, 1)), dtype=np.int8)
    out = np.empty((n.value, rl), dtype=np.int8)
    if is_fq:
        r = lib.fq_encode_range(
            path.encode(), begin, end, out.ctypes.data, n.value, rl,
            min_qual, min_len_keep,
        )
    else:
        r = lib.fa_encode_range(
            path.encode(), begin, end, out.ctypes.data, n.value, rl,
            min_len_keep,
        )
    if r < 0:
        return None
    return out[:r]


def pack_codes_native(
    codes: np.ndarray, n_threads: int = 0
) -> tuple[np.ndarray, np.ndarray] | None:
    """Threaded native 2.25-bit pack; bit-identical to encode.pack_codes_np.

    Returns None if the codec is unavailable — caller falls back to numpy.
    """
    lib = _load()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, dtype=np.int8)
    R, L = codes.shape
    packed = np.empty((R, -(-L // 4)), dtype=np.uint8)
    nmask = np.empty((R, -(-L // 8)), dtype=np.uint8)
    if n_threads <= 0:
        n_threads = min(16, os.cpu_count() or 1)
    lib.pack_codes(
        codes.ctypes.data, R, L, packed.ctypes.data, nmask.ctypes.data, n_threads
    )
    return packed, nmask

"""Native (C, compiled-on-first-use) string-similarity kernels.

``jaro.c`` implements the bit-parallel Jaro / Jaro-Winkler formulation that
rapidfuzz-cpp published and DuckDB vendors — same byte semantics, verified
bit-identical to DuckDB 1.0 output (tests/test_native_jaro.py fuzz + bench
corpus). Calling it directly over Arrow string buffers removes DuckDB's
per-batch register/scan/materialize overhead on the flagship scoring hot
path (~4x measured on the bench's 118-byte texts).

The shared object is compiled lazily with the system C compiler into a
0700 per-user cache directory (``~/.cache/splink_ray`` or
``$XDG_CACHE_HOME``) and memoized per process — never a world-writable
path, and never loaded unless the file is owned by the current uid with no
group/other write bits (a pre-planted .so in a shared tmpdir would
otherwise execute as the victim, CWE-379). Anything failing —
no compiler, compile error, oversized strings (> 2048 bytes, the stack-table
cap), large_string chunks — silently falls back to the DuckDB kernel, which
remains the semantics reference.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np
import pyarrow as pa

_SRC = os.path.join(os.path.dirname(__file__), "jaro.c")
_lib = None
_lib_failed = False


def _cache_dir() -> str | None:
    """0700 user-owned cache dir; None if one can't be secured."""
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    d = os.path.join(base, "splink_ray")
    try:
        os.makedirs(d, mode=0o700, exist_ok=True)
        st = os.stat(d)
        if st.st_uid != os.getuid() or (st.st_mode & 0o022):
            os.chmod(d, 0o700)
            st = os.stat(d)
            if st.st_uid != os.getuid() or (st.st_mode & 0o022):
                return None
        return d
    except OSError:
        return None


def _safe_to_load(path: str) -> bool:
    """Only CDLL a cached .so the current user owns with no group/other
    write bits (ADVICE r4: a pre-planted file in a shared dir would run
    arbitrary code as this process)."""
    try:
        st = os.stat(path)
    except OSError:
        return False
    return st.st_uid == os.getuid() and not (st.st_mode & 0o022)


def _compile() -> str | None:
    try:
        with open(_SRC, "rb") as f:
            src = f.read()
    except OSError:
        return None
    tag = hashlib.md5(src + b"|v2-fpcontract-off").hexdigest()[:16]
    cache = _cache_dir()
    if cache is None:  # no securable cache dir: compile into a fresh mkdtemp
        cache = tempfile.mkdtemp(prefix="splink_ray_native_")
    so_path = os.path.join(cache, f"splink_ray_jaro_{tag}.so")
    if os.path.exists(so_path):
        return so_path if _safe_to_load(so_path) else None
    cc = os.environ.get("CC", "cc")
    tmp = so_path + f".build-{os.getpid()}"
    # -march=native enables BMI (blsi/tzcnt) on this host; fall back to a
    # portable build when the toolchain rejects it. -ffp-contract=off is
    # REQUIRED for bit-parity: fused multiply-add in the winkler boost
    # changes the last ulp vs DuckDB's separate mul+add.
    for flags in (
        ["-O3", "-march=native", "-ffp-contract=off"],
        ["-O3", "-ffp-contract=off"],
        ["-O3"],
    ):
        try:
            subprocess.run(
                [cc, *flags, "-shared", "-fPIC", "-o", tmp, _SRC],
                check=True,
                capture_output=True,
                timeout=60,
            )
            os.chmod(tmp, 0o500)
            os.replace(tmp, so_path)  # atomic: concurrent workers race benignly
            return so_path if _safe_to_load(so_path) else None
        except Exception:
            try:
                os.unlink(tmp)
            except OSError:
                pass
    return None


def get_lib():
    """ctypes handle, or None when native kernels are unavailable."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    if os.environ.get("SPLINK_RAY_NO_NATIVE"):
        _lib_failed = True
        return None
    so = _compile()
    if so is None or not _safe_to_load(so):
        _lib_failed = True
        return None
    try:
        lib = ctypes.CDLL(so)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.jaro_batch.argtypes = [
            u8p, i32p, u8p, i32p, ctypes.c_int64, ctypes.c_double, f64p,
        ]
        lib.jaro_batch.restype = ctypes.c_int
        lib.jaro_winkler_batch.argtypes = [
            u8p, i32p, u8p, i32p, ctypes.c_int64, ctypes.c_double,
            ctypes.c_double, f64p,
        ]
        lib.jaro_winkler_batch.restype = ctypes.c_int
        lib.jaro_batch_idx.argtypes = [
            u8p, i32p, ctypes.c_int64, i32p,
            u8p, i32p, ctypes.c_int64, i32p,
            ctypes.c_int64, ctypes.c_double, f64p,
        ]
        lib.jaro_batch_idx.restype = ctypes.c_int
        lib.jaro_winkler_batch_idx.argtypes = [
            u8p, i32p, ctypes.c_int64, i32p,
            u8p, i32p, ctypes.c_int64, i32p,
            ctypes.c_int64, ctypes.c_double, ctypes.c_double, f64p,
        ]
        lib.jaro_winkler_batch_idx.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib_failed = True
    return _lib


def _string_buffers(arr: pa.Array):
    """(data_ptr, offsets_ptr_rebased) for a pa.string array slice, or None.

    Arrow slices share buffers with a non-zero offset; we pass the raw
    offsets pointer advanced by ``arr.offset`` — the C side only reads
    o[k+1]-o[k] windows into the shared data buffer, so rebasing is free.
    """
    if not pa.types.is_string(arr.type):
        return None
    if arr.null_count:
        return None
    bufs = arr.buffers()  # [validity, offsets, data]
    if bufs[1] is None:
        return None
    off_addr = bufs[1].address + 4 * arr.offset
    data_addr = bufs[2].address if bufs[2] is not None else off_addr
    return data_addr, off_addr


def jaro_arrow(
    l: pa.Array, r: pa.Array, winkler: bool, cutoff: float | None = None
) -> pa.Array | None:
    """Bit-exact DuckDB-parity jaro / jaro_winkler over two Arrow string
    arrays. Nulls in either input yield null. Returns None when the native
    path can't run (caller falls back to DuckDB).

    ``cutoff``: threshold-ladder fast path. Values >= cutoff are exact;
    rows provably below it may come back as 0.0 — ONLY pass this when every
    consumer of the result just compares it against thresholds >= cutoff
    (comparison-level gammas), never when the raw value is surfaced."""
    lib = get_lib()
    if lib is None:
        return None
    if isinstance(l, pa.ChunkedArray):
        l = l.combine_chunks()
    if isinstance(r, pa.ChunkedArray):
        r = r.combine_chunks()
    if not (pa.types.is_string(l.type) and pa.types.is_string(r.type)):
        return None
    n = len(l)
    if n == 0:
        return pa.array([], pa.float64())
    mask = None
    if l.null_count or r.null_count:
        import pyarrow.compute as pc

        valid = pc.and_(pc.is_valid(l), pc.is_valid(r))
        mask = pc.invert(valid).to_numpy(zero_copy_only=False)
        l = pc.fill_null(l, "")
        r = pc.fill_null(r, "")
    lb = _string_buffers(l)
    rb = _string_buffers(r)
    if lb is None or rb is None:
        return None
    out = np.empty(n, np.float64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = out.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    args = [
        ctypes.cast(lb[0], u8p), ctypes.cast(lb[1], i32p),
        ctypes.cast(rb[0], u8p), ctypes.cast(rb[1], i32p),
        ctypes.c_int64(n),
    ]
    cut = ctypes.c_double(-1.0 if cutoff is None else cutoff)
    if winkler:
        rc = lib.jaro_winkler_batch(*args, ctypes.c_double(0.1), cut, f64p)
    else:
        rc = lib.jaro_batch(*args, cut, f64p)
    if rc != 0:  # oversized strings or alloc failure -> DuckDB fallback
        return None
    return pa.array(out, pa.float64(), mask=mask)


def jaro_arrow_idx(
    ldict: pa.Array,
    lidx: np.ndarray,
    rdict: pa.Array,
    ridx: np.ndarray,
    winkler: bool,
    cutoff: float | None = None,
) -> pa.Array | None:
    """Dictionary-indexed jaro / jaro_winkler: row k compares
    ``ldict[lidx[k]]`` vs ``rdict[ridx[k]]``; negative index = null input ->
    null output. No per-row string materialization — the kernel reads the
    (small) dictionary buffers directly; callers sort rows by ``lidx`` so
    the pattern-match table is reused across consecutive rows."""
    lib = get_lib()
    if lib is None:
        return None
    if not (pa.types.is_string(ldict.type) and pa.types.is_string(rdict.type)):
        return None
    if ldict.null_count or rdict.null_count:
        return None  # nulls belong in the index (-1), not the dictionary
    lb = _string_buffers(ldict)
    rb = _string_buffers(rdict)
    if lb is None or rb is None:
        return None
    n = len(lidx)
    if n == 0:
        return pa.array([], pa.float64())
    lidx = np.ascontiguousarray(lidx, np.int32)
    ridx = np.ascontiguousarray(ridx, np.int32)
    out = np.empty(n, np.float64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = out.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    args = [
        ctypes.cast(lb[0], u8p), ctypes.cast(lb[1], i32p),
        ctypes.c_int64(len(ldict)), lidx.ctypes.data_as(i32p),
        ctypes.cast(rb[0], u8p), ctypes.cast(rb[1], i32p),
        ctypes.c_int64(len(rdict)), ridx.ctypes.data_as(i32p),
        ctypes.c_int64(n),
    ]
    cut = ctypes.c_double(-1.0 if cutoff is None else cutoff)
    if winkler:
        rc = lib.jaro_winkler_batch_idx(*args, ctypes.c_double(0.1), cut, f64p)
    else:
        rc = lib.jaro_batch_idx(*args, cut, f64p)
    if rc != 0:
        return None
    isnan = np.isnan(out)
    mask = isnan if isnan.any() else None
    return pa.array(out, pa.float64(), mask=mask)

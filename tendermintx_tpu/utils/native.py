"""Loader for the native host-verifier core (C++ Goldilocks + Poseidon).

Builds native/goldilocks_poseidon.cpp into a shared library on first use
(g++, cached next to the source) and exposes it via ctypes. Everything has a
pure-Python fallback — callers use `backend()` and never require the .so.

The hash parameters are pushed from ops/poseidon.py at init so the native
core and the Python/JAX implementations share one definition.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

log = logging.getLogger(__name__)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "goldilocks_poseidon.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libtmx_native.so")

_lib = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception as e:  # noqa: BLE001 - any failure means fallback
        log.warning("native core build failed (%s); using pure-Python paths", e)
        return False


def load():
    """Returns the initialized ctypes library, or None."""
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        return None
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not os.path.exists(_SRC) or not _build():
            _load_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError as e:
        log.warning("native core load failed: %s", e)
        _load_failed = True
        return None

    u64 = ctypes.c_uint64
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.tmx_gl_mul.restype = u64
    lib.tmx_gl_mul.argtypes = [u64, u64]
    lib.tmx_gl_add.restype = u64
    lib.tmx_gl_add.argtypes = [u64, u64]
    lib.tmx_gl_sub.restype = u64
    lib.tmx_gl_sub.argtypes = [u64, u64]
    lib.tmx_gl_pow.restype = u64
    lib.tmx_gl_pow.argtypes = [u64, u64]
    lib.tmx_gl_inv.restype = u64
    lib.tmx_gl_inv.argtypes = [u64]
    lib.tmx_poseidon_init.argtypes = [u64p, u64p]
    lib.tmx_poseidon_permute.argtypes = [u64p]
    lib.tmx_poseidon_hash.argtypes = [u64p, u64, u64p]
    lib.tmx_poseidon_two_to_one.argtypes = [u64p, u64p, u64p]
    lib.tmx_merkle_verify.restype = ctypes.c_int
    lib.tmx_merkle_verify.argtypes = [u64p, u64, u64p, u64, u64p, u64]
    lib.tmx_mds_check.restype = ctypes.c_int
    lib.tmx_mds_check.argtypes = [u64p, ctypes.c_int]

    # push the canonical Poseidon parameters
    from ..ops import poseidon as ps

    rc = ps.round_constants()
    mds = ps.mds_matrix()
    rc_arr = (ctypes.c_uint64 * (30 * 12))(*[rc[r][j] for r in range(30) for j in range(12)])
    mds_arr = (ctypes.c_uint64 * (12 * 12))(*[mds[i][j] for i in range(12) for j in range(12)])
    lib.tmx_poseidon_init(rc_arr, mds_arr)
    _lib = lib
    return _lib


def permute_ints_native(state: list[int]) -> list[int] | None:
    lib = load()
    if lib is None:
        return None
    buf = (ctypes.c_uint64 * 12)(*state)
    lib.tmx_poseidon_permute(buf)
    return list(buf)


def hash_ints_native(inputs: list[int]) -> list[int] | None:
    lib = load()
    if lib is None:
        return None
    arr = (ctypes.c_uint64 * len(inputs))(*inputs)
    out = (ctypes.c_uint64 * 4)()
    lib.tmx_poseidon_hash(arr, len(inputs), out)
    return list(out)


def mds_check_native(matrix: list[list[int]]) -> bool | None:
    """True iff every square submatrix of `matrix` is nonsingular mod p
    (the MDS property). Exhaustive minor check — ~2.7M determinants for
    12x12, a few seconds of native time; None if the core is unavailable."""
    lib = load()
    if lib is None:
        return None
    n = len(matrix)
    flat = [matrix[i][j] for i in range(n) for j in range(n)]
    arr = (ctypes.c_uint64 * (n * n))(*flat)
    return bool(lib.tmx_mds_check(arr, n))


def two_to_one_native(left: list[int], right: list[int]) -> list[int] | None:
    lib = load()
    if lib is None:
        return None
    l = (ctypes.c_uint64 * 4)(*left)
    r = (ctypes.c_uint64 * 4)(*right)
    out = (ctypes.c_uint64 * 4)()
    lib.tmx_poseidon_two_to_one(l, r, out)
    return list(out)


def merkle_verify_native(
    root: list[int], index: int, leaf_row: list[int], path: list[list[int]]
) -> bool | None:
    lib = load()
    if lib is None:
        return None
    root_a = (ctypes.c_uint64 * 4)(*root)
    row_a = (ctypes.c_uint64 * len(leaf_row))(*leaf_row)
    flat = [v for sib in path for v in sib]
    path_a = (ctypes.c_uint64 * len(flat))(*flat)
    return bool(
        lib.tmx_merkle_verify(
            root_a, index, row_a, len(leaf_row), path_a, len(path)
        )
    )

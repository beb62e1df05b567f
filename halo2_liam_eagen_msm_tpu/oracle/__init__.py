"""ctypes bindings for the C++ CPU oracle (native/oracle.cpp).

An independent 4x64-bit Montgomery implementation of the field / curve /
polynomial / divisor semantics — the bit-level cross-check demanded by
BASELINE config 1 ("bit-exact vs reference vectors").  Builds on demand via
native/Makefile (g++)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

from ..fields import CurveSpec, FieldSpec

_HERE = os.path.dirname(__file__)
_LIB = os.path.join(_HERE, "liboracle.so")
_NATIVE = os.path.normpath(os.path.join(_HERE, "..", "..", "native"))


def build() -> str:
    """Build (if needed) and return the shared library path."""
    src = os.path.join(_NATIVE, "oracle.cpp")
    if not os.path.exists(_LIB) or os.path.getmtime(src) > os.path.getmtime(_LIB):
        subprocess.run(["make", "-C", _NATIVE], check=True, capture_output=True)
    return _LIB


@lru_cache(maxsize=None)
def lib() -> ctypes.CDLL:
    l = ctypes.CDLL(build())
    l.oracle_sizeof_field_ctx.restype = ctypes.c_int
    l.oracle_sizeof_curve_ctx.restype = ctypes.c_int
    l.oracle_divisor_witness.restype = ctypes.c_int
    return l


def _limbs64(x: int) -> np.ndarray:
    return np.array([(x >> (64 * i)) & ((1 << 64) - 1) for i in range(4)], dtype=np.uint64)


def _ints64(xs) -> np.ndarray:
    out = np.zeros((len(xs), 4), dtype=np.uint64)
    for i, x in enumerate(xs):
        for j in range(4):
            out[i, j] = (x >> (64 * j)) & ((1 << 64) - 1)
    return out


def _from64(a: np.ndarray) -> list[int]:
    a = a.reshape(-1, 4)
    return [int(r[0]) | int(r[1]) << 64 | int(r[2]) << 128 | int(r[3]) << 192 for r in a]


@lru_cache(maxsize=None)
def field_ctx(spec: FieldSpec):
    l = lib()
    buf = ctypes.create_string_buffer(l.oracle_sizeof_field_ctx())
    p = _limbs64(spec.p)
    l.oracle_field_ctx(p.ctypes.data_as(ctypes.c_void_p), buf)
    return buf


@lru_cache(maxsize=None)
def curve_ctx(curve: CurveSpec):
    l = lib()
    buf = ctypes.create_string_buffer(l.oracle_sizeof_curve_ctx())
    p = _limbs64(curve.field.p)
    a = _limbs64(curve.a % curve.field.p)
    b = _limbs64(curve.b % curve.field.p)
    l.oracle_curve_ctx(
        p.ctypes.data_as(ctypes.c_void_p),
        a.ctypes.data_as(ctypes.c_void_p),
        b.ctypes.data_as(ctypes.c_void_p),
        buf,
    )
    return buf


def _vp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def ff_mul(spec: FieldSpec, xs, ys) -> list[int]:
    l = lib()
    a, b = _ints64(xs), _ints64(ys)
    out = np.zeros_like(a)
    l.oracle_ff_mul(field_ctx(spec), len(xs), _vp(a), _vp(b), _vp(out))
    return _from64(out)


def ff_add(spec: FieldSpec, xs, ys) -> list[int]:
    l = lib()
    a, b = _ints64(xs), _ints64(ys)
    out = np.zeros_like(a)
    l.oracle_ff_add(field_ctx(spec), len(xs), _vp(a), _vp(b), _vp(out))
    return _from64(out)


def ff_inv(spec: FieldSpec, xs) -> list[int]:
    l = lib()
    a = _ints64(xs)
    out = np.zeros_like(a)
    l.oracle_ff_inv(field_ctx(spec), len(xs), _vp(a), _vp(out))
    return _from64(out)


def _pts_arrays(pts):
    xs = _ints64([p[0] if p else 0 for p in pts])
    ys = _ints64([p[1] if p else 0 for p in pts])
    inf = np.array([1 if p is None else 0 for p in pts], dtype=np.int32)
    return xs, ys, inf


def ec_msm(curve: CurveSpec, scalars, pts):
    """MSM oracle; returns affine (x, y) or None."""
    l = lib()
    xs, ys, inf = _pts_arrays(pts)
    sc = _ints64([s % curve.scalar_field.p for s in scalars])
    ox = np.zeros(4, dtype=np.uint64)
    oy = np.zeros(4, dtype=np.uint64)
    oinf = ctypes.c_int(0)
    l.oracle_ec_msm(
        curve_ctx(curve), len(pts), _vp(sc), _vp(xs), _vp(ys), _vp(inf),
        _vp(ox), _vp(oy), ctypes.byref(oinf),
    )
    if oinf.value:
        return None
    return (_from64(ox)[0], _from64(oy)[0])


def divisor_witness(curve: CurveSpec, pts):
    """(a_coeffs, b_coeffs, output point or None) — independent C++ witness."""
    l = lib()
    xs, ys, inf = _pts_arrays(pts)
    cap = len(pts) + 4
    oa = np.zeros((cap, 4), dtype=np.uint64)
    ob = np.zeros((cap, 4), dtype=np.uint64)
    la = ctypes.c_int(0)
    lb = ctypes.c_int(0)
    ox = np.zeros(4, dtype=np.uint64)
    oy = np.zeros(4, dtype=np.uint64)
    oinf = ctypes.c_int(0)
    rc = l.oracle_divisor_witness(
        curve_ctx(curve), len(pts), _vp(xs), _vp(ys), _vp(inf), cap,
        _vp(oa), _vp(ob), ctypes.byref(la), ctypes.byref(lb),
        _vp(ox), _vp(oy), ctypes.byref(oinf),
    )
    assert rc == 0, "capacity too small"
    a = _from64(oa)[: la.value]
    b = _from64(ob)[: lb.value]
    out = None if oinf.value else (_from64(ox)[0], _from64(oy)[0])
    return a, b, out

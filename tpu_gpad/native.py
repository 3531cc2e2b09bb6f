"""ctypes bindings for the native (C++) sequential GPAD library.

The reference keeps its CPU baseline in C++ (``seq_functions.cpp``) and links
it into the profiling binary; here the equivalent library (``csrc/``) is
built on demand (cmake if available, direct g++ otherwise) and loaded with
ctypes — no pybind11 dependency. Used as the fast host oracle in tests and
as the CPU baseline the benchmark's ``vs_baseline`` compares against.
"""

from __future__ import annotations

import ctypes
import functools
import shutil
import subprocess
from pathlib import Path

import numpy as np

CSRC = Path(__file__).resolve().parent.parent / "csrc"
BUILD = CSRC / "build"


class NativeUnavailable(RuntimeError):
    pass


def _build() -> Path:
    lib = BUILD / "libgpad_seq.so"
    srcs = [CSRC / "gpad_seq.cpp"]
    if lib.exists() and all(lib.stat().st_mtime >= s.stat().st_mtime for s in srcs):
        return lib
    BUILD.mkdir(parents=True, exist_ok=True)
    if shutil.which("cmake") and shutil.which("ninja"):
        subprocess.run(
            ["cmake", "-G", "Ninja", "-DCMAKE_BUILD_TYPE=Release", ".."],
            cwd=BUILD, check=True, capture_output=True,
        )
        subprocess.run(["ninja"], cwd=BUILD, check=True, capture_output=True)
    else:
        gxx = shutil.which("g++")
        if gxx is None:
            raise NativeUnavailable("no cmake/ninja or g++ toolchain found")
        subprocess.run(
            [gxx, "-O3", "-march=native", "-fno-math-errno", "-std=c++17",
             "-shared", "-fPIC", str(CSRC / "gpad_seq.cpp"), "-o", str(lib)],
            check=True, capture_output=True,
        )
    if not lib.exists():
        raise NativeUnavailable("native build produced no library")
    return lib


@functools.lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL:
    lib = ctypes.CDLL(str(_build()))
    fp = ctypes.POINTER(ctypes.c_float)
    i64, f32 = ctypes.c_int64, ctypes.c_float
    lib.gpad_step1.argtypes = [fp, fp, f32, fp, i64]
    lib.gpad_step2.argtypes = [fp, fp, fp, fp, i64, i64, f32]
    lib.gpad_step3.argtypes = [fp, fp, f32, i64]
    lib.gpad_step4.argtypes = [fp, fp, fp, fp, fp, i64, i64]
    lib.gpad_solve_fixed.argtypes = [fp] * 6 + [i64, i64, i64, f32] + [fp] * 3
    lib.gpad_solve_fixed_paired.argtypes = [fp] * 6 + [i64, i64, i64] + [fp] * 3
    lib.gpad_solve_fixed_paired_flat.argtypes = (
        [fp] * 6 + [f32, i64, i64, i64] + [fp] * 3
    )
    lib.gpad_solve_fixed_batch.argtypes = (
        [fp] * 6 + [i64, i64, i64, i64, f32] + [fp] * 3
    )
    lib.gpad_solve_stagewise_fixed.argtypes = (
        [fp] * 14 + [f32] + [i64] * 6 + [fp] * 5
    )
    return lib


def available() -> bool:
    try:
        _lib()
        return True
    except (NativeUnavailable, subprocess.CalledProcessError, OSError):
        return False


def _f32(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32))


def _ptr(x: np.ndarray):
    return x.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def step1(y, y_prev, beta):
    y, y_prev = _f32(y), _f32(y_prev)
    w = np.empty_like(y)
    _lib().gpad_step1(_ptr(y), _ptr(y_prev), float(beta), _ptr(w), y.size)
    return w


def step2(MG_T, w, g_P, sign=-1.0):
    MG_T, w, g_P = _f32(MG_T), _f32(w), _f32(g_P)
    m, n_z = MG_T.shape
    zhat = np.empty(n_z, dtype=np.float32)
    _lib().gpad_step2(_ptr(MG_T), _ptr(w), _ptr(g_P), _ptr(zhat), m, n_z, float(sign))
    return zhat


def step3(z, zhat, theta):
    z, zhat = _f32(z).copy(), _f32(zhat)
    _lib().gpad_step3(_ptr(z), _ptr(zhat), float(theta), z.size)
    return z


def step4(GL_T, w, p_D, zhat):
    GL_T, w, p_D, zhat = _f32(GL_T), _f32(w), _f32(p_D), _f32(zhat)
    n_z, m = GL_T.shape
    y = np.empty(m, dtype=np.float32)
    _lib().gpad_step4(_ptr(GL_T), _ptr(w), _ptr(p_D), _ptr(zhat), _ptr(y), m, n_z)
    return y


def solve_fixed(MG_T, GL_T, g_P, p_D, theta, beta, iterations, sign=-1.0):
    """Dense fixed-budget solve; returns (z, y)."""
    MG_T, GL_T = _f32(MG_T), _f32(GL_T)
    g_P, p_D, theta, beta = _f32(g_P), _f32(p_D), _f32(theta), _f32(beta)
    m, n_z = MG_T.shape
    z = np.empty(n_z, dtype=np.float32)
    y = np.empty(m, dtype=np.float32)
    scratch = np.empty(3 * m + n_z, dtype=np.float32)
    _lib().gpad_solve_fixed(
        _ptr(MG_T), _ptr(GL_T), _ptr(g_P), _ptr(p_D), _ptr(theta), _ptr(beta),
        m, n_z, int(iterations), float(sign), _ptr(z), _ptr(y), _ptr(scratch),
    )
    return z, y


def solve_fixed_paired(MG_T, GL_T, g_P, p_D2, theta, beta, iterations):
    """Paired half-stack solve; ``p_D2`` is (2, m_h); returns (z, y(2,m_h))."""
    MG_T, GL_T = _f32(MG_T), _f32(GL_T)
    g_P, p_D2, theta, beta = _f32(g_P), _f32(p_D2), _f32(theta), _f32(beta)
    m_h, n_z = MG_T.shape
    z = np.empty(n_z, dtype=np.float32)
    y = np.empty((2, m_h), dtype=np.float32)
    scratch = np.empty(7 * m_h + n_z, dtype=np.float32)
    _lib().gpad_solve_fixed_paired(
        _ptr(MG_T), _ptr(GL_T), _ptr(g_P), _ptr(p_D2), _ptr(theta), _ptr(beta),
        m_h, n_z, int(iterations), _ptr(z), _ptr(y), _ptr(scratch),
    )
    return z, y


def solve_fixed_paired_flat(MG_T, GLs_T, g_P, p_D2, theta, beta, L, iterations):
    """Flat paired solve (identity-block layout, GPADData.n_struct): the
    native analogue of the reference's flat variants. ``GLs_T`` is GL_T's
    structured columns (n_z, n_struct); the box rows use 1/L directly.
    Returns (z, y(2, m_h)) with m_h = n_struct + n_z."""
    MG_T, GLs_T = _f32(MG_T), _f32(GLs_T)
    g_P, p_D2, theta, beta = _f32(g_P), _f32(p_D2), _f32(theta), _f32(beta)
    m_h, n_z = MG_T.shape
    n_s = GLs_T.shape[1]
    if m_h != n_s + n_z:
        raise ValueError(f"m_h {m_h} != n_struct {n_s} + n_z {n_z}")
    z = np.empty(n_z, dtype=np.float32)
    y = np.empty((2, m_h), dtype=np.float32)
    scratch = np.empty(7 * m_h + n_z, dtype=np.float32)
    _lib().gpad_solve_fixed_paired_flat(
        _ptr(MG_T), _ptr(GLs_T), _ptr(g_P), _ptr(p_D2), _ptr(theta),
        _ptr(beta), float(1.0 / L), n_s, n_z, int(iterations), _ptr(z),
        _ptr(y), _ptr(scratch),
    )
    return z, y


def solve_fixed_batch(MG_T, GL_T, g_P, p_D, theta, beta, iterations, sign=-1.0):
    """Batched dense solve: g_P (B, n_z), p_D (B, m); returns (Z, Y)."""
    MG_T, GL_T = _f32(MG_T), _f32(GL_T)
    g_P, p_D, theta, beta = _f32(g_P), _f32(p_D), _f32(theta), _f32(beta)
    m, n_z = MG_T.shape
    B = g_P.shape[0]
    Z = np.empty((B, n_z), dtype=np.float32)
    Y = np.empty((B, m), dtype=np.float32)
    scratch = np.empty(3 * m + n_z, dtype=np.float32)
    _lib().gpad_solve_fixed_batch(
        _ptr(MG_T), _ptr(GL_T), _ptr(g_P), _ptr(p_D), _ptr(theta), _ptr(beta),
        B, m, n_z, int(iterations), float(sign), _ptr(Z), _ptr(Y), _ptr(scratch),
    )
    return Z, Y


def solve_stagewise_fixed(data, x0, iterations):
    """Native stage-wise fixed-budget solve (the CPU baseline of the O(N)
    engine; no reference analogue — its seq library is condensed-only).

    ``data`` is a ``StagewiseData``; ``x0`` (n_x,). Returns
    ``(u0, zu (N, n_u), y (N, m_x + m_u), residual, gap)`` matching
    ``solve_stagewise``'s stage packing and diagnostics semantics."""
    arrs = {
        name: _f32(getattr(data, name))
        for name in ("A_seq", "B_seq", "K", "Hi", "E", "Gx", "hx", "Gu",
                     "hu", "dtl", "qoff", "c_seq", "theta", "beta")
    }
    x0 = _f32(x0)
    N, n, p = data.horizon, data.n_x, data.n_u
    m_x, m_u = data.m_x, data.m_u
    ms = m_x + m_u
    it = int(iterations)
    zu = np.empty((N, p), dtype=np.float32)
    y = np.empty((N, ms), dtype=np.float32)
    diag = np.empty(2, dtype=np.float32)
    scratch = np.empty(N * (2 * ms + 3 * n + 2 * p) + 2 * n + 2 * p,
                       dtype=np.float32)
    _lib().gpad_solve_stagewise_fixed(
        _ptr(arrs["A_seq"]), _ptr(arrs["B_seq"]), _ptr(arrs["K"]),
        _ptr(arrs["Hi"]), _ptr(arrs["E"]), _ptr(arrs["Gx"]),
        _ptr(arrs["hx"]), _ptr(arrs["Gu"]), _ptr(arrs["hu"]),
        _ptr(arrs["dtl"]), _ptr(arrs["qoff"]), _ptr(arrs["c_seq"]),
        _ptr(arrs["theta"]), _ptr(arrs["beta"]),
        float(1.0 / float(np.asarray(data.L))), N, n, p, m_x, m_u, it,
        _ptr(x0), _ptr(zu), _ptr(y), _ptr(diag), _ptr(scratch),
    )
    return zu[0].copy(), zu, y, float(diag[0]), float(diag[1])


def build_cli() -> Path:
    """Build (if needed) and return the path of the gpad_cli binary."""
    _build()
    cli = BUILD / "gpad_cli"
    src = CSRC / "gpad_cli.cpp"
    if not cli.exists() or cli.stat().st_mtime < src.stat().st_mtime:
        gxx = shutil.which("g++")
        if gxx is None:
            raise NativeUnavailable("g++ not found")
        subprocess.run(
            [gxx, "-O3", "-march=native", "-std=c++17", str(src),
             str(CSRC / "gpad_seq.cpp"), "-o", str(cli)],
            check=True, capture_output=True,
        )
    return cli

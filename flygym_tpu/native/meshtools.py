"""Python bindings for the native mesh toolchain, with a numpy fallback.

The C++ library (meshtools.cpp) provides fast STL parsing, mass properties,
and capsule fitting; it is auto-built on first use when a compiler is
available, otherwise the numpy implementations below (same algorithms) are
used. Both paths are cross-validated in tests/core/test_native.py.
"""

import ctypes
import subprocess
from pathlib import Path

import numpy as np

__all__ = ["load_stl", "mass_properties", "capsule_fit", "native_available"]

_NATIVE_DIR = Path(__file__).parent
_LIB_PATH = _NATIVE_DIR / "libmeshtools.so"
_lib = None
_lib_tried = False


def _get_lib():
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["sh", str(_NATIVE_DIR / "build.sh")],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.meshtools_load_stl.restype = ctypes.POINTER(ctypes.c_double)
        lib.meshtools_load_stl.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.meshtools_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
        lib.meshtools_mass_properties.restype = ctypes.c_int
        lib.meshtools_mass_properties.argtypes = [
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ]
        lib.meshtools_fit_capsule.restype = ctypes.c_int
        lib.meshtools_fit_capsule.argtypes = (
            lib.meshtools_mass_properties.argtypes
        )
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_available() -> bool:
    """True when the C++ library is built and loadable."""
    return _get_lib() is not None


# ---------------------------------------------------------------------------
# STL loading
# ---------------------------------------------------------------------------


def load_stl(path) -> np.ndarray:
    """Load an STL file into (n_tris, 3, 3) float64 vertices."""
    path = Path(path)
    lib = _get_lib()
    if lib is not None:
        n = ctypes.c_int64(0)
        buf = lib.meshtools_load_stl(str(path).encode(), ctypes.byref(n))
        if buf and n.value > 0:
            tris = np.ctypeslib.as_array(buf, shape=(n.value, 3, 3)).copy()
            lib.meshtools_free(buf)
            return tris
    return _load_stl_numpy(path)


def _load_stl_numpy(path: Path) -> np.ndarray:
    raw = path.read_bytes()
    if len(raw) > 84:
        count = int.from_bytes(raw[80:84], "little")
        if len(raw) == 84 + count * 50 and count > 0:
            rec = np.frombuffer(raw[84:], dtype=np.uint8).reshape(count, 50)
            floats = (
                rec[:, :48].copy().view(np.float32).reshape(count, 4, 3)
            )
            return floats[:, 1:, :].astype(np.float64)
    # ASCII fallback.
    verts = []
    for line in raw.decode(errors="ignore").splitlines():
        parts = line.split()
        if parts[:1] == ["vertex"]:
            verts.append([float(x) for x in parts[1:4]])
    arr = np.asarray(verts, np.float64)
    if arr.size == 0 or len(arr) % 3:
        raise ValueError(f"Cannot parse STL file: {path}")
    return arr.reshape(-1, 3, 3)


# ---------------------------------------------------------------------------
# Mass properties
# ---------------------------------------------------------------------------


def mass_properties(tris: np.ndarray, scale=(1.0, 1.0, 1.0)):
    """Volume, com, and unit-density inertia (about com) of a closed mesh.

    Returns:
        (volume, com (3,), inertia (3, 3)).
    """
    tris = np.ascontiguousarray(tris, np.float64)
    scale = np.ascontiguousarray(scale, np.float64)
    lib = _get_lib()
    if lib is not None:
        out = np.zeros(13)
        rc = lib.meshtools_mass_properties(
            tris.reshape(-1), len(tris), scale, out
        )
        if rc == 0:
            return float(out[0]), out[1:4].copy(), out[4:13].reshape(3, 3).copy()
    return _mass_properties_numpy(tris, scale)


def _mass_properties_numpy(tris, scale):
    v = tris * scale  # (n, 3, 3)
    a, b, c = v[:, 0], v[:, 1], v[:, 2]
    vols = np.einsum("ij,ij->i", a, np.cross(b, c)) / 6.0
    vol = vols.sum()
    sgn = -1.0 if vol < 0 else 1.0
    com = sgn * (vols[:, None] * (a + b + c) / 4.0).sum(0) / (sgn * vol)

    def P(i, j):
        return (
            vols
            / 20.0
            * (
                2 * (a[:, i] * a[:, j] + b[:, i] * b[:, j] + c[:, i] * c[:, j])
                + a[:, i] * b[:, j]
                + a[:, j] * b[:, i]
                + a[:, i] * c[:, j]
                + a[:, j] * c[:, i]
                + b[:, i] * c[:, j]
                + b[:, j] * c[:, i]
            )
        ).sum() * sgn

    xx, yy, zz = P(0, 0), P(1, 1), P(2, 2)
    xy, xz, yz = P(0, 1), P(0, 2), P(1, 2)
    vol = sgn * vol
    I = np.array(
        [
            [yy + zz, -xy, -xz],
            [-xy, xx + zz, -yz],
            [-xz, -yz, xx + yy],
        ]
    )
    d = com
    I -= vol * (
        (d @ d) * np.eye(3) - np.outer(d, d)
    )
    return float(vol), com, I


# ---------------------------------------------------------------------------
# Capsule fitting
# ---------------------------------------------------------------------------


def capsule_fit(tris: np.ndarray, scale=(1.0, 1.0, 1.0)):
    """Fit a capsule to mesh vertices (PCA axis + enclosing radius).

    Returns:
        (pos (3,), quat wxyz (4,), radius, halflength).
    """
    tris = np.ascontiguousarray(tris, np.float64)
    scale = np.ascontiguousarray(scale, np.float64)
    lib = _get_lib()
    if lib is not None:
        out = np.zeros(9)
        rc = lib.meshtools_fit_capsule(tris.reshape(-1), len(tris), scale, out)
        if rc == 0:
            return out[:3].copy(), out[3:7].copy(), float(out[7]), float(out[8])
    return _capsule_fit_numpy(tris, scale)


def _capsule_fit_numpy(tris, scale):
    pts = (tris * scale).reshape(-1, 3)
    mean = pts.mean(0)
    d = pts - mean
    cov = d.T @ d
    w, V = np.linalg.eigh(cov)
    axis = V[:, np.argmax(w)]
    t = d @ axis
    radial = d - t[:, None] * axis
    radius = float(np.linalg.norm(radial, axis=1).max())
    tmin, tmax = float(t.min()), float(t.max())
    half = max((tmax - tmin) / 2.0 - radius, 1e-9)
    center = mean + (tmax + tmin) / 2.0 * axis

    z = np.array([0.0, 0, 1])
    dot = float(z @ axis)
    if dot > 1 - 1e-12:
        quat = np.array([1.0, 0, 0, 0])
    elif dot < -1 + 1e-12:
        quat = np.array([0.0, 1, 0, 0])
    else:
        cr = np.cross(z, axis)
        ang = np.arctan2(np.linalg.norm(cr), dot)
        cr = cr / np.linalg.norm(cr)
        quat = np.concatenate([[np.cos(ang / 2)], np.sin(ang / 2) * cr])
    return center, quat, radius, half

"""Resolve upstream NeuroMechFly model inputs: reference checkout OR bundle.

The derive scripts (``derive_assets.py``, ``derive_sdf_assets.py``) read the
upstream STL meshes + YAML config trees. With a reference checkout at
``/root/reference`` they read it directly; without one they fall back to the
in-repo snapshot produced by ``bundle_upstream_assets.py``
(``flygym_tpu/assets/upstream/``), so a clean clone can re-derive every
compiled asset (VERDICT r3 #10).
"""

import json
import struct
import tempfile
from pathlib import Path

import numpy as np

REFERENCE = Path("/root/reference/src/flygym/assets/model")
BUNDLE = Path(__file__).resolve().parents[2] / "flygym_tpu" / "assets" / "upstream"

_mesh_npz = None
_config = None
_tmpdir = None


def have_reference() -> bool:
    import os

    if os.environ.get("FLYGYM_TPU_NO_REFERENCE"):  # force the bundle (tests)
        return False
    return (REFERENCE / "rigging.yaml").exists()


def _bundle_meshes():
    global _mesh_npz
    if _mesh_npz is None:
        _mesh_npz = np.load(BUNDLE / "source_meshes.npz")
    return _mesh_npz


def _bundle_config():
    global _config
    if _config is None:
        with open(BUNDLE / "upstream_config.json") as f:
            _config = json.load(f)
    return _config


def load_config(name: str):
    """Parsed YAML tree for rigging / visuals / mujoco_globals."""
    if have_reference():
        import yaml

        with open(REFERENCE / f"{name}.yaml") as f:
            return yaml.safe_load(f)
    return _bundle_config()[name]


def load_pose_dir(sub: str) -> dict:
    """{stem: parsed tree} for pose/<sub>/*.yaml."""
    if have_reference():
        import yaml

        out = {}
        for p in sorted((REFERENCE / "pose" / sub).glob("*.yaml")):
            with open(p) as f:
                out[p.stem] = yaml.safe_load(f)
        return out
    return _bundle_config()["pose"][sub]


def mesh_tris(mesh_name: str) -> np.ndarray:
    """(T, 3, 3) float64 triangle soup for a mesh stem (no mirroring)."""
    if have_reference():
        for subdir in ("simplified_max2000faces", "fullsize"):
            p = REFERENCE / "meshes" / subdir / f"{mesh_name}.stl"
            if p.exists():
                return _read_stl(p)
        raise FileNotFoundError(mesh_name)
    z = _bundle_meshes()
    for subdir in ("simplified_max2000faces", "fullsize"):
        key = f"{subdir}/{mesh_name}"
        if key in z.files:
            return np.asarray(z[key], np.float64)
    raise FileNotFoundError(mesh_name)


def mesh_stl_path(mesh_name: str) -> Path:
    """Path to a real .stl file (for MuJoCo's <mesh file=...> ingestion):
    the reference file when present, else a binary STL materialized from
    the bundle into a process-lifetime temp dir."""
    if have_reference():
        for subdir in ("simplified_max2000faces", "fullsize"):
            p = REFERENCE / "meshes" / subdir / f"{mesh_name}.stl"
            if p.exists():
                return p
        raise FileNotFoundError(mesh_name)
    global _tmpdir
    if _tmpdir is None:
        _tmpdir = tempfile.mkdtemp(prefix="flygym_tpu_upstream_")
    out = Path(_tmpdir) / f"{mesh_name}.stl"
    if not out.exists():
        _write_stl(out, mesh_tris(mesh_name).astype(np.float32))
    return out


def _read_stl(path: Path) -> np.ndarray:
    data = path.read_bytes()
    if data[:5].lower() == b"solid" and b"facet" in data[:500]:
        verts = []
        for line in data.decode("ascii", "ignore").splitlines():
            line = line.strip()
            if line.startswith("vertex"):
                verts.append([float(x) for x in line.split()[1:4]])
        return np.asarray(verts, np.float64).reshape(-1, 3, 3)
    (ntri,) = struct.unpack("<I", data[80:84])
    rec = np.frombuffer(data, np.uint8, count=ntri * 50, offset=84)
    rec = rec.reshape(ntri, 50)
    floats = rec[:, :48].copy().view("<f4").reshape(ntri, 4, 3)
    return floats[:, 1:4, :].astype(np.float64)


def _write_stl(path: Path, tris: np.ndarray) -> None:
    """Minimal binary STL writer (zero normals — MuJoCo recomputes)."""
    ntri = tris.shape[0]
    buf = bytearray(84 + ntri * 50)
    struct.pack_into("<I", buf, 80, ntri)
    rec = np.zeros((ntri, 50), np.uint8)
    f = np.zeros((ntri, 12), np.float32)
    f[:, 3:12] = tris.reshape(ntri, 9)
    rec[:, :48] = f.view(np.uint8).reshape(ntri, 48)
    buf[84:] = rec.tobytes()
    path.write_bytes(bytes(buf))

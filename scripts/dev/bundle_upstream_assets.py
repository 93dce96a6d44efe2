"""Bundle the upstream NeuroMechFly model inputs into the repo (VERDICT r3 #10).

The asset-derivation scripts (``derive_assets.py``, ``derive_sdf_assets.py``)
re-derive flygym-tpu's compiled assets (rigging.json, derived_geometry.json,
sdf_meshes.npz, ...) from the upstream model sources: 63 anatomical STL
meshes + the rigging/visuals/globals/pose YAML files (Apache-2.0,
NeLy-EPFL/flygym ``src/flygym/assets/model``). This script snapshots those
INPUTS into the repo so the derive scripts run from a clean clone, with no
reference checkout:

  - ``flygym_tpu/assets/upstream/source_meshes.npz`` — per-mesh triangle
    soups (n_tri, 3, 3) float32, keys ``<subdir>/<name>`` (compressed; the
    63 STLs' 12 MB become ~4 MB).
  - ``flygym_tpu/assets/upstream/upstream_config.json`` — the parsed YAML
    trees (rigging, visuals, mujoco_globals, pose/neutral, pose manual
    specs), verbatim values.

Run (only needs doing when upstream changes)::

    python scripts/dev/bundle_upstream_assets.py [reference_model_dir]
"""

import json
import struct
import sys
from pathlib import Path

import numpy as np
import yaml

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

DEFAULT_REFERENCE = Path("/root/reference/src/flygym/assets/model")
OUT_DIR = (
    Path(__file__).resolve().parents[2] / "flygym_tpu" / "assets" / "upstream"
)


def load_stl(path: Path) -> np.ndarray:
    """Read an STL (binary or ASCII) as an (n_tri, 3, 3) float32 soup."""
    raw = path.read_bytes()
    if raw[:5].lower() == b"solid" and b"facet" in raw[:500]:
        # ASCII STL.
        verts = []
        for line in raw.decode("ascii", "ignore").splitlines():
            line = line.strip()
            if line.startswith("vertex"):
                verts.append([float(x) for x in line.split()[1:4]])
        tris = np.asarray(verts, np.float32).reshape(-1, 3, 3)
        return tris
    (n_tri,) = struct.unpack_from("<I", raw, 80)
    body = np.frombuffer(raw, np.uint8, count=n_tri * 50, offset=84)
    rec = body.reshape(n_tri, 50)
    floats = rec[:, :48].copy().view(np.float32).reshape(n_tri, 12)
    return floats[:, 3:12].reshape(n_tri, 3, 3).astype(np.float32)


def main():
    ref = Path(sys.argv[1]) if len(sys.argv) > 1 else DEFAULT_REFERENCE
    OUT_DIR.mkdir(parents=True, exist_ok=True)

    meshes = {}
    for subdir in ("fullsize", "simplified_max2000faces"):
        for stl in sorted((ref / "meshes" / subdir).glob("*.stl")):
            key = f"{subdir}/{stl.stem}"
            meshes[key] = load_stl(stl)
            print(f"{key}: {meshes[key].shape[0]} tris")
    np.savez_compressed(OUT_DIR / "source_meshes.npz", **meshes)

    cfg = {}
    for name in ("rigging", "visuals", "mujoco_globals"):
        with open(ref / f"{name}.yaml") as f:
            cfg[name] = yaml.safe_load(f)
    cfg["pose"] = {}
    for sub in ("neutral", "_manual_specs"):
        d = ref / "pose" / sub
        if not d.is_dir():
            continue
        cfg["pose"][sub] = {}
        for p in sorted(d.glob("*.yaml")):
            with open(p) as f:
                cfg["pose"][sub][p.stem] = yaml.safe_load(f)
    with open(OUT_DIR / "upstream_config.json", "w") as f:
        json.dump(cfg, f)
    print(
        f"bundled {len(meshes)} meshes + {len(cfg)} config trees -> {OUT_DIR}"
    )


if __name__ == "__main__":
    main()

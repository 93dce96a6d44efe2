"""Derive flygym-tpu model assets from the NeuroMechFly v2 reference assets.

This is a *build-time* developer tool, not a runtime dependency. It:

1. Converts the reference rigging / pose / visuals YAML files (Apache-2.0,
   NeLy-EPFL/flygym) into JSON assets under ``flygym_tpu/assets/model/``.
2. Uses MuJoCo (as a geometry toolchain) to derive, per body segment:
   - mesh-based inertial properties (com, principal-axis quat, diagonal
     inertia) at the rigged mass, and
   - the capsule fit (pos, quat, radius, half-length) MuJoCo produces when a
     mesh geom is converted to a capsule — this is the exact geometry the
     reference gets via ``GeomFittingOption`` (fly.py:51-62,584-589).
   Results are stored in ``derived_geometry.json`` so the TPU runtime never
   touches STL files or MuJoCo.
3. Re-packages the Spotlight mocap demo clip NPZ.

Run:  python scripts/dev/derive_assets.py
"""

import json
import sys
from pathlib import Path

import numpy as np
REFERENCE = Path("/root/reference/src/flygym/assets/model")
REFERENCE_DEMO = Path("/root/reference/src/flygym_demo/spotlight_data/assets")
OUT = Path(__file__).resolve().parents[2] / "flygym_tpu" / "assets" / "model"
OUT_DEMO = Path(__file__).resolve().parents[2] / "flygym_tpu" / "assets" / "demo"

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
from flygym_tpu.anatomy import ALL_SEGMENT_NAMES  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent))
import upstream_assets  # noqa: E402  (reference checkout OR in-repo bundle)

SCALE = 1000.0  # reference meshes are in meters; the model works in mm


def convert_rigging():
    rigging = upstream_assets.load_config("rigging")
    out = {
        name: {
            "pos": [float(x) for x in cfg["pos"]],
            "quat": [float(x) for x in cfg["quat"]],
            "mass": float(cfg["mass"]),
        }
        for name, cfg in rigging.items()
    }
    (OUT / "rigging.json").write_text(json.dumps(out, indent=1))
    print(f"rigging.json: {len(out)} segments")
    return out


def convert_poses():
    dst_dir = OUT / "pose" / "neutral"
    dst_dir.mkdir(parents=True, exist_ok=True)
    for stem, pose in sorted(upstream_assets.load_pose_dir("neutral").items()):
        out = {
            "angle_unit": pose["angle_unit"],
            "axis_order": list(pose["axis_order"]),
            "joint_angles": {k: float(v) for k, v in pose["joint_angles"].items()},
        }
        (dst_dir / f"{stem}.json").write_text(json.dumps(out, indent=1))
        print(f"pose/neutral/{stem}.json: {len(out['joint_angles'])} angles")


def convert_visuals():
    visuals = upstream_assets.load_config("visuals")
    (OUT / "visuals.json").write_text(json.dumps(visuals, indent=1))
    print(f"visuals.json: {len(visuals)} vis sets")


def mesh_path_for(segment: str) -> tuple[Path, float]:
    """Mesh file + y-scale sign (right-side segments mirror the left mesh)."""
    mesh_name, y_sign = segment, 1.0
    if segment.startswith("r"):
        mesh_name, y_sign = "l" + segment[1:], -1.0
    return upstream_assets.mesh_stl_path(mesh_name), y_sign


def derive_geometry(rigging: dict):
    import mujoco as mj

    derived = {}
    for segment in ALL_SEGMENT_NAMES:
        mesh_file, y_sign = mesh_path_for(segment)
        mass = rigging[segment]["mass"]
        entry = {}
        for geom_type in ("mesh", "capsule"):
            xml = f"""
            <mujoco>
              <compiler boundmass="1e-6" boundinertia="1e-12"/>
              <asset>
                <mesh name="m" file="{mesh_file}"
                      scale="{SCALE} {y_sign * SCALE} {SCALE}"/>
              </asset>
              <worldbody>
                <body name="b">
                  <freejoint/>
                  <geom name="g" type="{geom_type}" mesh="m" mass="{mass}"/>
                </body>
              </worldbody>
            </mujoco>
            """
            model = mj.MjModel.from_xml_string(xml)
            key = "mesh_inertia" if geom_type == "mesh" else "capsule_inertia"
            entry[key] = {
                "ipos": model.body_ipos[1].tolist(),
                "iquat": model.body_iquat[1].tolist(),
                "diag": model.body_inertia[1].tolist(),
                "mass": float(model.body_mass[1]),
            }
            if geom_type == "capsule":
                entry["capsule"] = {
                    "pos": model.geom_pos[0].tolist(),
                    "quat": model.geom_quat[0].tolist(),
                    # size: (radius, half-length of cylindrical part)
                    "size": model.geom_size[0][:2].tolist(),
                }
        derived[segment] = entry
    (OUT / "derived_geometry.json").write_text(json.dumps(derived, indent=1))
    print(f"derived_geometry.json: {len(derived)} segments")


def repackage_spotlight():
    OUT_DEMO.mkdir(parents=True, exist_ok=True)
    src = REFERENCE_DEMO / "spotlight_behavior_clip.npz"
    if not src.exists():
        src = OUT_DEMO / "spotlight_behavior_clip.npz"  # already-shipped copy
    data = np.load(src, allow_pickle=True)
    np.savez_compressed(
        OUT_DEMO / "spotlight_behavior_clip.npz", **{k: data[k] for k in data.files}
    )
    print(f"spotlight clip: {data['joint_angles'].shape[0]} frames")


if __name__ == "__main__":
    OUT.mkdir(parents=True, exist_ok=True)
    rigging = convert_rigging()
    convert_poses()
    convert_visuals()
    derive_geometry(rigging)
    repackage_spotlight()
    print("done")

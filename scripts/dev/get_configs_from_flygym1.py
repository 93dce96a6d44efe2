"""Extract rigging data from a legacy flygym 1.x MJCF model.

The analog of the reference's ``scripts/dev/get_configs_from_flygym1.py``
(which scrapes the NeuroMechFly 1.x ``mjcf_model.xml`` for per-body
pos/quat and per-geom mass and re-emits them as 2.x rigging YAML): read a
1.x MJCF, rename bodies through the 1.x -> 2.x map
(``flygym_tpu.utils.api1to2.BODY_NAMES_OLD2NEW``), and write the result as
rigging-format JSON compatible with ``flygym_tpu/assets/model/rigging.json``.

Usage:
    python scripts/dev/get_configs_from_flygym1.py legacy_mjcf.xml \
        [-o rigging_from_1x.json]

This is a one-shot migration tool for users carrying customized 1.x models;
the bundled rigging.json already contains the canonical measurements.
"""

import json
import math
import sys
import xml.etree.ElementTree as ET
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from flygym_tpu.utils.api1to2 import BODY_NAMES_OLD2NEW


def _round_sigfigs(x: float, sigfigs: int = 3) -> float:
    if x == 0:
        return 0.0
    return round(x, sigfigs - int(math.floor(math.log10(abs(x)))) - 1)


def extract_rigging(mjcf_path: Path) -> dict:
    """Per-body {pos, quat, mass} from a legacy 1.x MJCF, in 2.x names."""
    root = ET.parse(mjcf_path).getroot()

    pose_by_body = {}
    for body in root.findall(".//body"):
        name = body.attrib["name"]
        if name == "FlyBody":  # virtual root, not an anatomical segment
            continue
        pos = [_round_sigfigs(float(x)) for x in body.attrib["pos"].split()]
        quat = [_round_sigfigs(float(x)) for x in body.attrib["quat"].split()]
        pose_by_body[name] = {"pos": pos, "quat": quat}

    mass_by_geom = {}
    for geom in root.findall(".//geom"):
        name = geom.attrib.get("name")
        if name is None or "mass" not in geom.attrib:
            continue
        mass_by_geom[name] = _round_sigfigs(float(geom.attrib["mass"]))

    out = {}
    for old_name, pose in pose_by_body.items():
        new_name = BODY_NAMES_OLD2NEW.get(old_name, old_name)
        entry = dict(pose)
        if old_name in mass_by_geom:
            entry["mass"] = mass_by_geom[old_name]
        out[new_name] = entry
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    if not args:
        sys.exit(__doc__)
    out_path = None
    if "-o" in sys.argv:
        out_path = Path(sys.argv[sys.argv.index("-o") + 1])
    rigging = extract_rigging(Path(args[0]))
    text = json.dumps(rigging, indent=2)
    if out_path is None:
        print(text)
    else:
        out_path.write_text(text + "\n")
        print(f"wrote {out_path} ({len(rigging)} bodies)", file=sys.stderr)


if __name__ == "__main__":
    main()

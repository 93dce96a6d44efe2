"""The in-repo upstream-asset bundle (VERDICT r3 #10).

``flygym_tpu/assets/upstream/`` snapshots the NeuroMechFly model INPUTS
(62 STL triangle soups + the rigging/visuals/globals/pose YAML trees) so
``scripts/dev/derive_assets.py`` / ``derive_sdf_assets.py`` re-derive every
compiled asset from a clean clone, no reference checkout. Verified when
built: bundle-only re-derivation is byte-identical to the reference-backed
one (rigging.json / visuals.json / pose jsons), and a bundle-only SDF bake
matches to 0.0.
"""

import os
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.fast

REPO = Path(__file__).resolve().parents[2]
BUNDLE = REPO / "flygym_tpu" / "assets" / "upstream"


@pytest.fixture()
def upstream_assets(monkeypatch):
    import sys

    monkeypatch.setenv("FLYGYM_TPU_NO_REFERENCE", "1")
    sys.path.insert(0, str(REPO / "scripts" / "dev"))
    import upstream_assets as ua

    # Reset module caches so the env var takes effect in any test order.
    ua._config = None
    ua._mesh_npz = None
    yield ua
    ua._config = None
    ua._mesh_npz = None


def test_bundle_is_complete(upstream_assets):
    z = np.load(BUNDLE / "source_meshes.npz")
    assert len(z.files) == 62
    cfg_names = {"rigging", "visuals", "mujoco_globals"}
    for name in cfg_names:
        tree = upstream_assets.load_config(name)
        assert isinstance(tree, dict) and tree
    poses = upstream_assets.load_pose_dir("neutral")
    assert len(poses) >= 6
    for tree in poses.values():
        assert "joint_angles" in tree


def test_mesh_resolution_without_reference(upstream_assets):
    tris = upstream_assets.mesh_tris("lf_tarsus5")
    assert tris.ndim == 3 and tris.shape[1:] == (3, 3)
    assert np.isfinite(tris).all() and tris.shape[0] > 100
    # Materialized STL path round-trips through the minimal writer/parser.
    p = upstream_assets.mesh_stl_path("lf_tarsus5")
    assert p.exists()
    back = upstream_assets._read_stl(p)
    np.testing.assert_allclose(back, tris, atol=1e-6)


def test_rigging_values_match_shipped_assets(upstream_assets):
    """The bundle's rigging tree must agree with the shipped derived
    rigging.json (same masses/offsets — the bundle is the real input)."""
    import json

    rig_b = upstream_assets.load_config("rigging")
    rig_s = json.loads(
        (REPO / "flygym_tpu" / "assets" / "model" / "rigging.json").read_text()
    )
    assert set(rig_s) <= set(rig_b)
    for name, cfg in rig_s.items():
        assert float(rig_b[name]["mass"]) == float(cfg["mass"])
        np.testing.assert_allclose(rig_b[name]["pos"], cfg["pos"])

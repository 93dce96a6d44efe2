"""Runtime mesh-to-geometry derivation for user-supplied STL directories.

The reference accepts any ``mesh_basedir`` of per-segment STLs at compose
time (flygym ``compose/fly.py:507-543``: subdirectories per mesh type,
left-side meshes mirrored to the right via a negative-y scale). Here the
same directory layout is accepted and each mesh is reduced AT COMPOSE TIME
to what the TPU engine consumes — mesh inertials, a capsule fit, and the
capsule's analytic inertia — using the native mesh toolchain
(``native/meshtools.py``: C++ via ctypes with a cross-validated numpy
fallback). The bundled ``derived_geometry.json`` asset is exactly this
derivation precomputed for the NeuroMechFly meshes.

Note: the capsule fit is a PCA axis + enclosing radius (meshtools), which
can differ slightly from MuJoCo's mesh→capsule fit used to precompute the
bundled asset; for the bundled fly model prefer the default asset path.
"""

from pathlib import Path

import numpy as np

from flygym_tpu.native.meshtools import capsule_fit, load_stl, mass_properties

__all__ = ["derive_geometry_from_meshes"]

#: Model works in mm; reference meshes are meters (flygym fly.py:510-512).
DEFAULT_SCALE = 1000.0


def _mat_to_quat_wxyz(R):
    """Rotation matrix → unit quaternion (w, x, y, z)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array(
            [0.25 * s, (R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s,
             (R[1, 0] - R[0, 1]) / s]
        )
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(max(R[i, i] - R[j, j] - R[k, k] + 1.0, 1e-12)) * 2
    q = np.empty(4)
    q[0] = (R[k, j] - R[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (R[j, i] + R[i, j]) / s
    q[1 + k] = (R[k, i] + R[i, k]) / s
    return q / np.linalg.norm(q)


def _principal(inertia, com, mass):
    """Full inertia tensor (about com) → ipos/iquat/diag dict at ``mass``."""
    w, V = np.linalg.eigh(inertia)
    if np.linalg.det(V) < 0:
        V = V * np.array([1.0, 1.0, -1.0])
        w = w.copy()
    order = np.argsort(w)[::-1]
    w, V = w[order], V[:, order]
    if np.linalg.det(V) < 0:
        V[:, 2] = -V[:, 2]
    return {
        "ipos": [float(x) for x in com],
        "iquat": [float(x) for x in _mat_to_quat_wxyz(V)],
        "diag": [float(max(x, 1e-12)) for x in w],
        "mass": float(mass),
    }


def _capsule_inertia(pos, quat, radius, halflen, mass):
    """Analytic inertia of a capsule (cylinder + two hemispheres) at mass."""
    r, h = float(radius), 2.0 * float(halflen)
    v_cyl = np.pi * r * r * h
    v_sph = 4.0 / 3.0 * np.pi * r**3
    rho = mass / max(v_cyl + v_sph, 1e-12)
    m_c, m_s = rho * v_cyl, rho * v_sph
    # About the capsule center, axis = local z.
    iz = 0.5 * m_c * r * r + 0.4 * m_s * r * r
    ixy = (
        m_c * (h * h / 12.0 + r * r / 4.0)
        + m_s * (0.4 * r * r + 0.25 * h * h + 0.375 * r * h)
    )
    return {
        "ipos": [float(x) for x in pos],
        "iquat": [float(x) for x in quat],
        "diag": [float(ixy), float(ixy), float(iz)],
        "mass": float(mass),
    }


def _find_mesh(mesh_basedir: Path, mesh_type: str, name: str) -> Path:
    """Reference lookup order (fly.py:515-536): mesh-type subdir, then the
    fullsize fallback subdir; a flat directory of STLs is also accepted."""
    candidates = [
        mesh_basedir / mesh_type / f"{name}.stl",
        mesh_basedir / "fullsize" / f"{name}.stl",
        mesh_basedir / f"{name}.stl",
    ]
    for c in candidates:
        if c.exists():
            return c
    raise FileNotFoundError(
        f"Mesh file not found for segment {name}: tried "
        + ", ".join(str(c) for c in candidates)
    )


def derive_geometry_from_meshes(
    mesh_basedir,
    rigging: dict,
    *,
    mesh_type: str = "simplified_max2000faces",
    mirror_left2right: bool = True,
    scale: float = DEFAULT_SCALE,
) -> dict:
    """Build the derived-geometry table from a directory of STLs.

    Args:
        mesh_basedir: directory containing ``{mesh_type}/{segment}.stl``
            (with optional ``fullsize/`` fallback) or flat
            ``{segment}.stl`` files.
        rigging: per-segment dict with at least ``mass`` (the rigging.json
            schema) — segment names define which meshes to load.
        mesh_type: subdirectory to prefer, as in the reference's MeshType.
        mirror_left2right: load left-side meshes for right-side segments
            and mirror them across y (reference fly.py:521-527).
        scale: mesh-unit → model-unit scale (1000 = meters → mm).

    Returns:
        ``{segment: {mesh_inertia, capsule_inertia, capsule}}`` in the
        ``derived_geometry.json`` schema that :class:`~flygym_tpu.compose.Fly`
        consumes.
    """
    mesh_basedir = Path(mesh_basedir)
    out = {}
    cache: dict[str, np.ndarray] = {}
    for name, cfg in rigging.items():
        mass = float(cfg["mass"])
        if mirror_left2right and name[0] == "r":
            src = f"l{name[1:]}"
            mirror = True
        else:
            src = name
            mirror = False
        if src not in cache:
            cache[src] = load_stl(_find_mesh(mesh_basedir, mesh_type, src))
        tris = cache[src]
        if mirror:
            # Mirror across y and reverse the vertex order so triangle
            # winding (and hence signed volumes) stays outward.
            tris = (tris * np.array([1.0, -1.0, 1.0]))[:, ::-1, :]
        sc = (scale, scale, scale)
        vol, com, inertia_unit = mass_properties(tris, sc)
        vol = abs(float(vol))
        density = mass / max(vol, 1e-18)
        out_mesh = _principal(np.asarray(inertia_unit) * density, com, mass)

        cpos, cquat, radius, halflen = capsule_fit(tris, sc)
        out[name] = {
            "mesh_inertia": out_mesh,
            "capsule_inertia": _capsule_inertia(
                cpos, cquat, radius, halflen, mass
            ),
            "capsule": {
                "pos": [float(x) for x in cpos],
                "quat": [float(x) for x in cquat],
                "size": [float(radius), float(halflen)],
            },
        }
    return out

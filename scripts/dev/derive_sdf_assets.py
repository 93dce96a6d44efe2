"""Derive per-segment signed-distance grids from the anatomical meshes.

The reference renders the fly's 62 anatomical STL meshes through MuJoCo GL
(`rendering.py:16-268`); our XLA raycaster renders the capsule collision
proxies. This script bakes each segment's mesh into a small body-frame
signed-distance grid so the raycaster can sphere-trace the TRUE body
shapes (capsule broad-phase + per-ray SDF refine — render/sdf.py), a
TPU-friendly replacement for triangle BVHs: fixed-iteration marches and
gathers instead of data-dependent tree traversal.

Frames follow scripts/dev/derive_assets.py: STL vertices are meters in the
segment's body frame → ×1000 to mm; right-side segments mirror the left
mesh with y → -y. Output: flygym_tpu/assets/model/sdf_meshes.npz with, per
segment, `<name>:sdf` (f16, (nx, ny, nz)), `<name>:origin` (3,) and
`<name>:spacing` (scalar, isotropic voxel size in mm).

Run:  python scripts/dev/derive_sdf_assets.py  (~1-2 min, host CPU only)
"""

import struct
import sys
from pathlib import Path

import numpy as np
from scipy import ndimage

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

REFERENCE = Path("/root/reference/src/flygym/assets/model")

sys.path.insert(0, str(Path(__file__).resolve().parent))
import upstream_assets  # noqa: E402  (reference checkout OR in-repo bundle)
OUT = (
    Path(__file__).resolve().parents[2]
    / "flygym_tpu"
    / "assets"
    / "model"
    / "sdf_meshes.npz"
)
SCALE = 1000.0  # meshes are meters; the model works in mm
FINE = 96  # fine-grid max dimension (EDT + parity)
COARSE = 48  # stored-grid max dimension


def mesh_path_for(segment: str):
    """Mesh file + y-scale sign (right-side segments mirror the left mesh).

    Same convention as derive_assets.py:77-90.
    """
    mesh_name, y_sign = segment, 1.0
    if segment.startswith("r") and not segment.startswith("rostrum"):
        mesh_name, y_sign = "l" + segment[1:], -1.0
    return upstream_assets.mesh_stl_path(mesh_name), y_sign


def load_stl(path: Path) -> np.ndarray:
    """Binary STL → (T, 3, 3) float64 vertices."""
    data = path.read_bytes()
    if data[:5] == b"solid" and b"facet" in data[:200]:
        # ASCII STL (none in the reference set, but be safe).
        verts = []
        for line in data.decode().splitlines():
            line = line.strip()
            if line.startswith("vertex"):
                verts.append([float(x) for x in line.split()[1:4]])
        return np.asarray(verts, np.float64).reshape(-1, 3, 3)
    (ntri,) = struct.unpack("<I", data[80:84])
    rec = np.frombuffer(data, np.uint8, count=ntri * 50, offset=84)
    rec = rec.reshape(ntri, 50)
    floats = rec[:, :48].copy().view("<f4").reshape(ntri, 4, 3)
    return floats[:, 1:4, :].astype(np.float64)  # drop the normal row


def surface_mask(tris, origin, spacing, dims):
    """Boolean voxel mask of triangle-surface samples."""
    mask = np.zeros(dims, bool)
    # Subdivide each triangle into ~spacing/2-spaced barycentric samples.
    e1 = np.linalg.norm(tris[:, 1] - tris[:, 0], axis=1)
    e2 = np.linalg.norm(tris[:, 2] - tris[:, 0], axis=1)
    e3 = np.linalg.norm(tris[:, 2] - tris[:, 1], axis=1)
    nsub = np.clip(
        np.ceil(np.max([e1, e2, e3], axis=0) / (spacing * 0.5)), 1, 64
    ).astype(int)
    for n in np.unique(nsub):
        sel = tris[nsub == n]
        ij = np.array(
            [(i, j) for i in range(n + 1) for j in range(n + 1 - i)], float
        )
        u = ij[:, 0] / n
        v = ij[:, 1] / n
        w = 1.0 - u - v
        pts = (
            u[None, :, None] * sel[:, None, 0]
            + v[None, :, None] * sel[:, None, 1]
            + w[None, :, None] * sel[:, None, 2]
        ).reshape(-1, 3)
        idx = np.round((pts - origin) / spacing).astype(int)
        idx = np.clip(idx, 0, np.asarray(dims) - 1)
        mask[idx[:, 0], idx[:, 1], idx[:, 2]] = True
    return mask


def parity_inside(tris, xs, ys, zs):
    """Inside mask on the coarse grid via +x ray parity per (y, z) column."""
    ny, nz = len(ys), len(zs)
    yz = np.stack(np.meshgrid(ys, zs, indexing="ij"), -1).reshape(-1, 2)
    # Tiny jitter avoids exact edge/vertex hits.
    yz = yz + np.array([1.3e-5, 2.7e-5])
    a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
    # 2D barycentric in the yz-plane, per (triangle, column).
    d0 = (b - a)[:, 1:]  # (T, 2)
    d1 = (c - a)[:, 1:]
    den = d0[:, 0] * d1[:, 1] - d0[:, 1] * d1[:, 0]  # (T,)
    ok = np.abs(den) > 1e-18
    p = yz[None, :, :] - a[:, None, 1:]  # (T, C, 2)
    u = (p[..., 0] * d1[:, None, 1] - p[..., 1] * d1[:, None, 0]) / np.where(
        ok, den, 1.0
    )[:, None]
    v = (p[..., 1] * d0[:, None, 0] - p[..., 0] * d0[:, None, 1]) / np.where(
        ok, den, 1.0
    )[:, None]
    hit = ok[:, None] & (u >= 0) & (v >= 0) & (u + v <= 1)  # (T, C)
    xhit = (
        a[:, None, 0]
        + u * (b[:, None, 0] - a[:, None, 0])
        + v * (c[:, None, 0] - a[:, None, 0])
    )
    # Crossings to the +x side of each voxel center, per column.
    inside = np.empty((len(xs), ny * nz), bool)
    xhit = np.where(hit, xhit, np.inf)
    for xi, x in enumerate(xs):
        # Odd number of surface crossings on the +x side → inside.
        greater = (xhit > x).sum(axis=0) - np.isinf(xhit).sum(axis=0)
        inside[xi] = (greater % 2) == 1
    return inside.reshape(len(xs), ny, nz)


def bake(segment: str):
    path, y_sign = mesh_path_for(segment)
    tris = load_stl(path) * SCALE
    tris[:, :, 1] *= y_sign
    lo = tris.reshape(-1, 3).min(axis=0)
    hi = tris.reshape(-1, 3).max(axis=0)
    ext = hi - lo
    margin = max(0.06 * ext.max(), 0.08)
    lo -= margin
    hi += margin
    ext = hi - lo
    h_f = ext.max() / (FINE - 1)
    dims_f = np.maximum(np.ceil(ext / h_f).astype(int) + 1, 4)
    mask = surface_mask(tris, lo, h_f, tuple(dims_f))
    # Unsigned distance (mm) to the sampled surface.
    dist_f = ndimage.distance_transform_edt(~mask, sampling=h_f)
    # Coarse grid (isotropic, max dim COARSE).
    h_c = ext.max() / (COARSE - 1)
    dims_c = np.maximum(np.ceil(ext / h_c).astype(int) + 1, 3)
    xs = lo[0] + h_c * np.arange(dims_c[0])
    ys = lo[1] + h_c * np.arange(dims_c[1])
    zs = lo[2] + h_c * np.arange(dims_c[2])
    # Trilinear sample of the fine EDT at coarse centers.
    gx = np.clip((xs - lo[0]) / h_f, 0, dims_f[0] - 1.001)
    gy = np.clip((ys - lo[1]) / h_f, 0, dims_f[1] - 1.001)
    gz = np.clip((zs - lo[2]) / h_f, 0, dims_f[2] - 1.001)
    GX, GY, GZ = np.meshgrid(gx, gy, gz, indexing="ij")
    coords = np.stack([GX.ravel(), GY.ravel(), GZ.ravel()])
    unsigned = ndimage.map_coordinates(dist_f, coords, order=1).reshape(
        tuple(dims_c)
    )
    inside = parity_inside(tris, xs, ys, zs)
    sdf = np.where(inside, -unsigned, unsigned).astype(np.float16)
    return sdf, lo.astype(np.float32), np.float32(h_c), tris


def main():
    from flygym_tpu.anatomy import ALL_SEGMENT_NAMES

    out = {}
    report = []
    for mesh_key in ALL_SEGMENT_NAMES:
        try:
            sdf, origin, spacing, tris = bake(mesh_key)
        except FileNotFoundError:
            report.append(f"{mesh_key}: NO MESH")
            continue
        # Sanity: surface vertices should read |sdf| ~ voxel size.
        verts = tris.reshape(-1, 3)[::7]
        idx = np.clip(
            np.round((verts - origin) / spacing).astype(int),
            0,
            np.asarray(sdf.shape) - 1,
        )
        surf_err = np.abs(
            sdf[idx[:, 0], idx[:, 1], idx[:, 2]].astype(np.float32)
        ).mean()
        frac_inside = float((sdf < 0).mean())
        report.append(
            f"{mesh_key}: dims={sdf.shape} h={spacing:.4f}mm "
            f"surf_err={surf_err:.4f}mm inside={frac_inside:.2%}"
        )
        out[f"{mesh_key}:sdf"] = sdf
        out[f"{mesh_key}:origin"] = origin
        out[f"{mesh_key}:spacing"] = spacing
    np.savez_compressed(OUT, **out)
    print("\n".join(report))
    print(f"wrote {OUT} ({OUT.stat().st_size / 1e6:.1f} MB, "
          f"{len(out) // 3} segments)")


if __name__ == "__main__":
    main()

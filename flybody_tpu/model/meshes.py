"""Synthesis of replacement meshes for assets missing from the reference.

The fly model (vendored at flybody_tpu/model/assets/fruitfly.xml, from the
reference's flybody/fruitfly/assets snapshot) references six mesh files that
are not shipped with the repository snapshot:
head_body.obj, head_red.obj, head_ocelli.obj, head_black.obj,
thorax_body.obj, thorax_black.obj.

These are cosmetic (group-1, non-colliding) geoms, but they carry mass: the
thorax mesh geom has an explicit mass (fruitfly.xml:322, mass=0.00034) while
the head meshes get their mass from the `head` default-class density 0.713
(fruitfly.xml:35-38). We synthesize ellipsoid meshes shaped and positioned
like the corresponding *collision* geoms (which are shipped in the XML,
fruitfly.xml:323,331) and calibrate the head mesh volume so the compiled
head subtree mass matches the documented empirical value
(reference tests/test_flybare.py:29, head subtree = 1.499089219064366e-4 g).

This module is host-side, build-time only.
"""

from __future__ import annotations

import numpy as np

# Documented empirical masses (reference tests/test_flybare.py:27-36).
HEAD_SUBTREE_MASS = 0.0001499089219064366  # grams
FLY_MASS = 0.0009846214672177625  # grams

# Default mesh scale in fruitfly.xml is 0.1, so OBJ vertices are in units of
# 0.1 cm ("pre-scale" units).
MESH_SCALE = 0.1

MISSING_MESHES = (
    'head_body.obj',
    'head_red.obj',
    'head_ocelli.obj',
    'head_black.obj',
    'thorax_body.obj',
    'thorax_black.obj',
)


def _quat_to_mat(q):
    w, x, y, z = q / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _icosphere(subdiv: int = 2) -> tuple[np.ndarray, np.ndarray]:
    """Unit icosphere (vertices, triangle faces)."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
    ], dtype=np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
    ], dtype=np.int64)

    for _ in range(subdiv):
        verts = list(verts)
        midpoint_cache: dict[tuple[int, int], int] = {}

        def midpoint(i, j):
            key = (min(i, j), max(i, j))
            if key not in midpoint_cache:
                v = verts[i] + verts[j]
                v = v / np.linalg.norm(v)
                midpoint_cache[key] = len(verts)
                verts.append(v)
            return midpoint_cache[key]

        new_faces = []
        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        verts = np.array(verts)
        faces = np.array(new_faces, dtype=np.int64)
    return verts, faces


def ellipsoid_obj(center: np.ndarray,
                  radii: np.ndarray,
                  quat: np.ndarray | None = None,
                  subdiv: int = 2,
                  scale: float = 1.0) -> str:
    """OBJ text for an ellipsoid mesh.

    Args:
        center: center in pre-scale mesh units.
        radii: semi-axes in pre-scale mesh units.
        quat: orientation of the ellipsoid axes (wxyz).
        subdiv: icosphere subdivision level.
        scale: uniform volume-calibration factor applied to the radii.
    """
    verts, faces = _icosphere(subdiv)
    verts = verts * (np.asarray(radii) * scale)
    if quat is not None:
        verts = verts @ _quat_to_mat(np.asarray(quat)).T
    verts = verts + np.asarray(center)
    lines = [f'v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}' for v in verts]
    lines += [f'f {f[0]+1} {f[1]+1} {f[2]+1}' for f in faces]
    return '\n'.join(lines) + '\n'


def _head_frames():
    """Frames for placing synthetic head meshes.

    The head mesh geoms are positioned in the head body frame at
    pos=(4.11e-07, -0.0334, -0.132), quat=(0.702, 0.087, 0.087, -0.702)
    (fruitfly.xml:332). The head collision ellipsoid (fruitfly.xml:331) has
    size=(0.0455, 0.0262, 0.0324) at pos=(0, 0.0149, 0.000875),
    euler=(0.3, 0, 0). We generate the head mesh so that, once placed at the
    geom frame, it coincides with the collision ellipsoid.
    """
    geom_pos = np.array([4.11e-07, -0.0334, -0.132])
    geom_quat = np.array([0.702, 0.087, 0.087, -0.702])
    R = _quat_to_mat(geom_quat)
    target = np.array([0.0, 0.0149, 0.000875])
    center_cm = R.T @ (target - geom_pos)
    # euler 0.3 about x in the body frame -> rotation matrix in mesh frame.
    c, s = np.cos(0.3), np.sin(0.3)
    R_coll = np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
    R_mesh = R.T @ R_coll
    return center_cm / MESH_SCALE, R_mesh


def _mat_to_quat(R):
    w = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
    x = (R[2, 1] - R[1, 2]) / (4 * w)
    y = (R[0, 2] - R[2, 0]) / (4 * w)
    z = (R[1, 0] - R[0, 1]) / (4 * w)
    return np.array([w, x, y, z])


def synthesize_meshes(head_scale: float = 1.0) -> dict[str, bytes]:
    """Returns OBJ bytes for all six missing mesh files.

    `head_scale` is a uniform calibration factor for the three massful head
    meshes (head_body, head_red, head_ocelli); use `calibrated_head_scale`
    (or the cached value in compile.py) to hit the documented head mass.
    """
    assets: dict[str, bytes] = {}

    head_center, head_rot = _head_frames()
    head_quat = _mat_to_quat(head_rot)
    # Head ellipsoid ~ collision ellipsoid (cm -> pre-scale units: /0.1).
    head_radii = np.array([0.0455, 0.0262, 0.0324]) / MESH_SCALE
    assets['head_body.obj'] = ellipsoid_obj(
        head_center, head_radii, head_quat, subdiv=2,
        scale=head_scale).encode()
    # Eyes: small ellipsoid at the front of the head (mass contributes to
    # the head-mass calibration).
    assets['head_red.obj'] = ellipsoid_obj(
        head_center, 0.45 * head_radii, head_quat, subdiv=1,
        scale=head_scale).encode()
    # Ocelli: tiny sphere on top of the head.
    assets['head_ocelli.obj'] = ellipsoid_obj(
        head_center + np.array([0, 0, 0.1]), 0.1 * head_radii, head_quat,
        subdiv=1, scale=head_scale).encode()
    # Zero-mass cosmetic meshes (explicit mass="0" in the XML).
    assets['head_black.obj'] = ellipsoid_obj(
        head_center, 0.2 * head_radii, head_quat, subdiv=1).encode()

    # Thorax: geom pos=(-0.00791, 0, -0.123), quat=(0, 0, 0, -1)
    # (fruitfly.xml:322, explicit mass=0.00034); collision ellipsoid
    # size=(0.0437, 0.0437, 0.0551), pos=(0.00168, 0, -0.00262),
    # quat=(0, -0.479, 0, -0.878) (fruitfly.xml:323).
    tg_pos = np.array([-0.00791, 0, -0.123])
    tg_quat = np.array([0.0, 0, 0, -1])
    R = _quat_to_mat(tg_quat)
    t_target = np.array([0.00168, 0, -0.00262])
    t_center = R.T @ (t_target - tg_pos) / MESH_SCALE
    t_radii = np.array([0.0437, 0.0437, 0.0551]) / MESH_SCALE
    R_coll = _quat_to_mat(np.array([0.0, -0.479, 0, -0.878]))
    t_quat = _mat_to_quat(R.T @ R_coll)
    assets['thorax_body.obj'] = ellipsoid_obj(
        t_center, t_radii, t_quat, subdiv=2).encode()
    assets['thorax_black.obj'] = ellipsoid_obj(
        t_center, 0.2 * t_radii, t_quat, subdiv=1).encode()

    return assets

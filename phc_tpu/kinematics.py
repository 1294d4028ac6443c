"""Skeleton kinematics: tree structure, batched FK, and motion derivatives.

TPU-native re-design of the reference's poselib layer
(`/root/reference/puffer_phc/poselib_skeleton.py:147-1400`). Key differences
from the reference (which runs a per-joint Python loop of torch ops):

  * The skeleton tree is a *static* description (names, parent indices,
    local translations) captured at trace time; FK is evaluated level-by-level
    (joints at the same tree depth in one vectorized gather/scatter), so a
    24-joint SMPL skeleton costs ~7 fused steps instead of 24 sequential ones
    and vmaps cleanly over envs/frames.
  * Motion derivative estimation (global linear/angular velocity with
    Gaussian smoothing, reference poselib:1231-1251, and dof velocities,
    reference motion_lib.py:119-140) is host-side numpy — it runs once per
    motion-load, not in the training hot loop.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from phc_tpu import transforms as T


@dataclass(frozen=True)
class SkeletonTree:
    """Static rigid-skeleton description (a trace-time constant, not a pytree).

    Mirrors the information content of reference poselib `SkeletonTree`
    (`poselib_skeleton.py:147-270`): node names, parent indices (-1 = root),
    and the fixed translation from each joint to its parent's frame.
    """

    node_names: tuple
    parent_indices: np.ndarray  # (J,) int32, -1 for root
    local_translation: np.ndarray  # (J, 3) float32
    levels: tuple = field(default=())  # topological levels, each a np.ndarray of joint ids

    def __post_init__(self):
        if not self.levels:
            object.__setattr__(self, "levels", _compute_levels(self.parent_indices))

    def __len__(self):
        return len(self.node_names)

    @property
    def num_joints(self):
        return len(self.node_names)

    def index(self, name: str) -> int:
        return self.node_names.index(name)

    @classmethod
    def from_mjcf(cls, path: str) -> "SkeletonTree":
        """Build the tree from an MJCF body hierarchy (reference :276-318)."""
        root = ET.parse(path).getroot()
        worldbody = root.find("worldbody")
        if worldbody is None:
            raise ValueError(f"{path}: no <worldbody>")
        body_root = worldbody.find("body")
        if body_root is None:
            raise ValueError(f"{path}: no root <body>")

        names, parents, local_t = [], [], []

        def visit(node, parent_index):
            idx = len(names)
            names.append(node.attrib.get("name"))
            parents.append(parent_index)
            local_t.append(np.fromstring(node.attrib.get("pos", "0 0 0"), dtype=np.float64, sep=" "))
            for child in node.findall("body"):
                visit(child, idx)

        visit(body_root, -1)
        return cls(
            node_names=tuple(names),
            parent_indices=np.asarray(parents, dtype=np.int32),
            local_translation=np.asarray(local_t, dtype=np.float32),
        )

    def keep_nodes(self, names_to_keep) -> "SkeletonTree":
        """Subtree with only `names_to_keep`, folding dropped nodes' offsets
        into their children (reference `drop_nodes_by_names` :340-372)."""
        drop = [n for n in self.node_names if n not in names_to_keep]
        new_names, new_parents, new_local = [], [], []
        new_index = {}
        for i, name in enumerate(self.node_names):
            if name in drop:
                continue
            p = int(self.parent_indices[i])
            offset = self.local_translation[i].copy()
            while p != -1 and self.node_names[p] in drop:
                offset += self.local_translation[p]
                p = int(self.parent_indices[p])
            new_names.append(name)
            new_local.append(offset)
            new_parents.append(-1 if p == -1 else new_index[self.node_names[p]])
            new_index[name] = len(new_names) - 1
        return SkeletonTree(tuple(new_names), np.asarray(new_parents, np.int32), np.asarray(new_local, np.float32))


def _compute_levels(parents: np.ndarray) -> tuple:
    depth = np.zeros(len(parents), dtype=np.int32)
    for i, p in enumerate(parents):
        depth[i] = 0 if p < 0 else depth[p] + 1
    return tuple(np.where(depth == d)[0].astype(np.int32) for d in range(int(depth.max()) + 1))


# ---------------------------------------------------------------------------
# Forward / inverse kinematics (device, jit/vmap safe)
# ---------------------------------------------------------------------------


def forward_kinematics(tree: SkeletonTree, local_rot, root_trans):
    """Batched FK: local joint rotations + root translation -> global pose.

    Args:
      tree: static SkeletonTree.
      local_rot: (..., J, 4) xyzw local rotations (child->parent).
      root_trans: (..., 3) root position in world.

    Returns:
      (global_rot (..., J, 4), global_pos (..., J, 3)).

    Functional equivalent of reference poselib `global_transformation`
    (`poselib_skeleton.py:518-539`), evaluated by topological level.
    """
    J = tree.num_joints
    local_t = jnp.asarray(tree.local_translation)

    grot = jnp.zeros(local_rot.shape)
    gpos = jnp.zeros(local_rot.shape[:-1] + (3,))

    root_ids = jnp.asarray(tree.levels[0])
    grot = grot.at[..., root_ids, :].set(local_rot[..., root_ids, :])
    gpos = gpos.at[..., 0, :].set(root_trans)

    for level in tree.levels[1:]:
        ids = jnp.asarray(level)
        par = jnp.asarray(tree.parent_indices[level])
        parent_rot = grot[..., par, :]
        grot = grot.at[..., ids, :].set(T.quat_mul_norm(parent_rot, local_rot[..., ids, :]))
        gpos = gpos.at[..., ids, :].set(gpos[..., par, :] + T.quat_rotate(parent_rot, local_t[ids]))
    del J
    return grot, gpos


def global_to_local_rotations(tree: SkeletonTree, global_rot):
    """Inverse of FK rotation composition: local[i] = inv(g[parent]) * g[i].

    Fully parallel over joints (reference poselib computes this with a Python
    loop, `poselib_skeleton.py:575-592`).
    """
    parents = np.maximum(tree.parent_indices, 0)
    parent_rot = global_rot[..., jnp.asarray(parents), :]
    local = T.quat_mul_norm(T.quat_inverse(parent_rot), global_rot)
    is_root = jnp.asarray(tree.parent_indices < 0)
    return jnp.where(is_root[:, None], T.quat_normalize(global_rot), local)


# ---------------------------------------------------------------------------
# Host-side (numpy) FK — used by the motion loader, where frame counts vary
# between reloads and device compiles would retrace for every new shape.
# ---------------------------------------------------------------------------


def forward_kinematics_np(tree: SkeletonTree, local_rot: np.ndarray, root_trans: np.ndarray):
    """Numpy twin of `forward_kinematics` (identical semantics)."""
    grot = np.zeros_like(local_rot)
    gpos = np.zeros(local_rot.shape[:-1] + (3,), dtype=np.float32)
    local_t = tree.local_translation
    grot[..., 0, :] = local_rot[..., 0, :]
    gpos[..., 0, :] = root_trans
    for level in tree.levels[1:]:
        par = tree.parent_indices[level]
        parent_rot = grot[..., par, :]
        grot[..., level, :] = _np_quat_normalize(_np_quat_mul(parent_rot, local_rot[..., level, :]))
        gpos[..., level, :] = gpos[..., par, :] + _np_quat_rotate(parent_rot, local_t[level])
    return grot, gpos


def global_to_local_rotations_np(tree: SkeletonTree, global_rot: np.ndarray) -> np.ndarray:
    """Numpy twin of `global_to_local_rotations`."""
    parents = np.maximum(tree.parent_indices, 0)
    parent_rot = global_rot[..., parents, :]
    local = _np_quat_normalize(_np_quat_mul(_np_quat_conj(parent_rot), global_rot))
    is_root = tree.parent_indices < 0
    return np.where(is_root[:, None], _np_quat_normalize(global_rot), local)


def _np_quat_rotate(q, v):
    qw = q[..., 3:4]
    qv = q[..., :3]
    return (
        v * (2.0 * qw * qw - 1.0)
        + 2.0 * qw * np.cross(qv, v)
        + 2.0 * qv * np.sum(qv * v, axis=-1, keepdims=True)
    )


# ---------------------------------------------------------------------------
# Motion derivatives (host-side preprocessing, numpy)
# ---------------------------------------------------------------------------


def _gaussian_filter1d(x: np.ndarray, sigma: float, axis: int) -> np.ndarray:
    """scipy.ndimage.gaussian_filter1d(mode='nearest') — via scipy if present."""
    from scipy.ndimage import gaussian_filter1d

    return gaussian_filter1d(x, sigma, axis=axis, mode="nearest")


def compute_linear_velocity(pos: np.ndarray, dt: float, smooth: bool = True) -> np.ndarray:
    """Central-difference linear velocity with Gaussian smoothing.

    pos: (F, J, 3) global positions; matches reference poselib
    `_compute_velocity` (`poselib_skeleton.py:1231-1238`).
    """
    vel = np.gradient(pos, axis=0) / dt
    if smooth:
        vel = _gaussian_filter1d(vel, 2, axis=0)
    return vel.astype(np.float32)


def compute_angular_velocity(rot: np.ndarray, dt: float, smooth: bool = True) -> np.ndarray:
    """Frame-difference angular velocity with Gaussian smoothing.

    rot: (F, J, 4) xyzw global rotations; matches reference poselib
    `_compute_angular_velocity` (`poselib_skeleton.py:1241-1251`): the diff
    quat is q[t+1] * inv(q[t]) normalized, converted via the [0, pi]
    angle-axis, with the final frame's diff set to identity.
    """
    q0 = rot[:-1]
    q1 = rot[1:]
    dq = _np_quat_mul(q1, _np_quat_conj(q0))
    dq = _np_quat_normalize(dq)
    angle, axis = _np_quat_angle_axis(dq)
    avel = np.zeros_like(rot[..., :3])
    avel[:-1] = axis * angle[..., None] / dt
    if smooth:
        avel = _gaussian_filter1d(avel, 2, axis=0)
    return avel.astype(np.float32)


def compute_dof_velocities(local_rot: np.ndarray, fps: float) -> np.ndarray:
    """Per-joint exp-map finite differences -> dof velocities.

    local_rot: (F, J, 4); returns (F, J-1, 3) — joint 0 (root) excluded.
    Matches reference `compute_motion_dof_vels_jit`
    (`motion_lib.py:119-140`): diff = inv(q[t]) * q[t+1], wrapped angle-axis,
    last frame duplicated.
    """
    dt = 1.0 / fps
    q0 = local_rot[:-1]
    q1 = local_rot[1:]
    dq = _np_quat_mul(_np_quat_conj(q0), q1)
    angle, axis = _np_quat_to_angle_axis_wrapped(dq)
    dof_vel = axis * angle[..., None] / dt  # (F-1, J, 3)
    dof_vel = dof_vel[:, 1:, :]
    return np.concatenate([dof_vel, dof_vel[-1:]], axis=0).astype(np.float32)


# --- small numpy quat helpers for host preprocessing ---


def _np_quat_mul(a, b):
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return np.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def _np_quat_conj(q):
    return np.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def _np_quat_normalize(q):
    q = np.where(q[..., 3:4] < 0, -q, q)
    return q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-9)


def _np_quat_angle_axis(q):
    """Angle in [0, pi] (reference torch_utils.py:218-228)."""
    s = 2.0 * q[..., 3] ** 2 - 1.0
    angle = np.arccos(np.clip(s, -1.0, 1.0))
    axis = q[..., :3]
    axis = axis / np.maximum(np.linalg.norm(axis, axis=-1, keepdims=True), 1e-9)
    return angle, axis


def _np_quat_to_angle_axis_wrapped(q):
    """Angle wrapped to (-pi, pi] with z fallback (torch_utils.py:86-106)."""
    qw = np.clip(q[..., 3], -1.0, 1.0)
    sin_theta = np.sqrt(np.maximum(1.0 - qw * qw, 0.0))
    angle = 2.0 * np.arccos(qw)
    angle = np.arctan2(np.sin(angle), np.cos(angle))
    axis = q[..., :3] / np.maximum(sin_theta[..., None], 1e-12)
    mask = sin_theta > 1e-5
    default_axis = np.zeros_like(axis)
    default_axis[..., 2] = 1.0
    angle = np.where(mask, angle, 0.0)
    axis = np.where(mask[..., None], axis, default_axis)
    return angle, axis

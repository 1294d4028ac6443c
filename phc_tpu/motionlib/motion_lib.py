"""Device-resident motion library: packed mocap frames + fused state queries.

TPU-native re-design of the reference motion library
(`/root/reference/puffer_phc/motion_lib.py:180-825`). Differences in design:

  * The reference runs per-clip FK in CPU worker processes with torch, then
    concatenates per-clip tensors on the GPU. Here, clips are concatenated
    *first* and FK/velocity preprocessing runs once, vectorized over ALL
    frames of all clips (frames are independent for FK), so loading is a
    handful of large array ops instead of thousands of small ones.
  * Frame arrays are padded to a fixed capacity so that motion reloads
    (curriculum resampling every N epochs, reference `humanoid_phc.py:
    1361-1377`) swap device buffers without retracing any jitted program.
  * `get_motion_state` (reference :549-626) is a single fused gather+blend:
    two frame gathers, linear blends for positions/velocities and slerp for
    rotations — one jittable function used by reward, reset, and obs paths.
  * Sampling probabilities / PMCP termination history (reference :454-500)
    are plain numpy on the host: they only matter at reload boundaries.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from phc_tpu import transforms as T
from phc_tpu import kinematics as K


class MotionState(NamedTuple):
    """Time-interpolated reference state for a batch of (motion, time) queries.

    Field names follow the reference's `get_motion_state` result dict
    (`motion_lib.py:612-626`).
    """

    root_pos: jax.Array  # (B, 3)
    root_rot: jax.Array  # (B, 4)
    dof_pos: jax.Array  # (B, 69) exp-map joint coordinates
    root_vel: jax.Array  # (B, 3)
    root_ang_vel: jax.Array  # (B, 3)
    dof_vel: jax.Array  # (B, 69)
    rg_pos: jax.Array  # (B, 24, 3) global body positions
    rb_rot: jax.Array  # (B, 24, 4) global body rotations
    body_vel: jax.Array  # (B, 24, 3)
    body_ang_vel: jax.Array  # (B, 24, 3)
    motion_bodies: jax.Array  # (B, 17) gender+betas
    motion_limb_weights: jax.Array  # (B, 10)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MotionData:
    """Packed device arrays for the currently-loaded motion batch.

    Equivalent to the flat tensors the reference builds at load time
    (`motion_lib.py:407-420`) — but all six per-frame fields
    (gts/grs/lrs/gvs/gavs/dvs) live in ONE (F, 20J-3) array, frame-major.
    `get_motion_state` then needs exactly TWO row gathers per query
    instead of twelve: per-env dynamic gathers carry a fixed launch cost
    on TPU, and the state query runs ~3x per env step (reward reference,
    reset resampling, next-step obs), so gather count is the dominant term
    (measured ~38 ms/epoch per query set at 4096 envs). The field views
    are zero-cost static slices under jit. Frames are padded to a fixed
    capacity (shape-stable across reloads).
    """

    frames: jax.Array  # (F, 20J-3): [gts 3J | grs 4J | lrs 4J | gvs 3J | gavs 3J | dvs 3(J-1)]
    length_starts: jax.Array  # (M,) int32 first frame of each motion
    motion_lengths: jax.Array  # (M,) float32 seconds
    motion_dt: jax.Array  # (M,) float32 seconds/frame
    motion_num_frames: jax.Array  # (M,) int32
    motion_bodies: jax.Array  # (M, 17)
    motion_limb_weights: jax.Array  # (M, 10)

    @property
    def num_motions(self) -> int:
        return self.length_starts.shape[0]

    @property
    def num_bodies(self) -> int:
        return (self.frames.shape[-1] + 3) // 20

    # --- per-field views (static slices; zero-copy under jit) -------------

    def _slices(self):
        J = self.num_bodies
        o = np.cumsum([0, 3 * J, 4 * J, 4 * J, 3 * J, 3 * J, 3 * (J - 1)])
        return J, o

    @property
    def gts(self) -> jax.Array:
        J, o = self._slices()
        return self.frames[:, o[0] : o[1]].reshape(-1, J, 3)

    @property
    def grs(self) -> jax.Array:
        J, o = self._slices()
        return self.frames[:, o[1] : o[2]].reshape(-1, J, 4)

    @property
    def lrs(self) -> jax.Array:
        J, o = self._slices()
        return self.frames[:, o[2] : o[3]].reshape(-1, J, 4)

    @property
    def gvs(self) -> jax.Array:
        J, o = self._slices()
        return self.frames[:, o[3] : o[4]].reshape(-1, J, 3)

    @property
    def gavs(self) -> jax.Array:
        J, o = self._slices()
        return self.frames[:, o[4] : o[5]].reshape(-1, J, 3)

    @property
    def dvs(self) -> jax.Array:
        J, o = self._slices()
        return self.frames[:, o[5] : o[6]].reshape(-1, J - 1, 3)


def _calc_frame_blend(times, lengths, num_frames, dt):
    """Frame pair + blend weight for a time query (reference :655-665)."""
    phase = jnp.clip(times / lengths, 0.0, 1.0)
    times = jnp.maximum(times, 0.0)
    f0 = (phase * (num_frames - 1)).astype(jnp.int32)
    f1 = jnp.minimum(f0 + 1, num_frames - 1)
    blend = jnp.clip((times - f0.astype(times.dtype) * dt) / dt, 0.0, 1.0)
    return f0, f1, blend


def get_motion_state(
    data: MotionData,
    motion_ids: jax.Array,
    motion_times: jax.Array,
    offset: Optional[jax.Array] = None,
) -> MotionState:
    """Fused gather + blend reference-state query (reference :549-626).

    motion_ids: (B,) int32, motion_times: (B,) float32 seconds,
    offset: optional (B, 3) world-space position offset added to positions.
    """
    lengths = data.motion_lengths[motion_ids]
    num_frames = data.motion_num_frames[motion_ids]
    dt = data.motion_dt[motion_ids]

    f0, f1, blend = _calc_frame_blend(motion_times, lengths, num_frames, dt)
    f0l = f0 + data.length_starts[motion_ids]
    f1l = f1 + data.length_starts[motion_ids]

    # exactly TWO row gathers for all six fields (see MotionData docstring)
    row0 = data.frames[f0l]  # (B, 20J-3)
    row1 = data.frames[f1l]
    J, o = data._slices()
    B = row0.shape[0]

    def fld(row, i, shape):
        return row[:, o[i] : o[i + 1]].reshape((B,) + shape)

    b = blend[:, None, None]
    rg_pos = (1.0 - b) * fld(row0, 0, (J, 3)) + b * fld(row1, 0, (J, 3))
    if offset is not None:
        rg_pos = rg_pos + offset[:, None, :]
    body_vel = (1.0 - b) * fld(row0, 3, (J, 3)) + b * fld(row1, 3, (J, 3))
    body_ang_vel = (1.0 - b) * fld(row0, 4, (J, 3)) + b * fld(row1, 4, (J, 3))
    dof_vel = (1.0 - b) * fld(row0, 5, (J - 1, 3)) + b * fld(row1, 5, (J - 1, 3))

    local_rot = T.slerp(fld(row0, 2, (J, 4)), fld(row1, 2, (J, 4)), b)
    rb_rot = T.slerp(fld(row0, 1, (J, 4)), fld(row1, 1, (J, 4)), b)

    # exp-map dof coordinates of the non-root joints (reference :670-673)
    dof_pos = T.quat_to_exp_map(local_rot[:, 1:]).reshape(local_rot.shape[0], -1)

    return MotionState(
        root_pos=rg_pos[:, 0],
        root_rot=rb_rot[:, 0],
        dof_pos=dof_pos,
        root_vel=body_vel[:, 0],
        root_ang_vel=body_ang_vel[:, 0],
        dof_vel=dof_vel.reshape(dof_vel.shape[0], -1),
        rg_pos=rg_pos,
        rb_rot=rb_rot,
        body_vel=body_vel,
        body_ang_vel=body_ang_vel,
        motion_bodies=data.motion_bodies[motion_ids],
        motion_limb_weights=data.motion_limb_weights[motion_ids],
    )


def get_root_pos(data: MotionData, motion_ids: jax.Array, motion_times: jax.Array) -> jax.Array:
    """Root position only (reference `get_root_pos_smpl` :628-653)."""
    lengths = data.motion_lengths[motion_ids]
    num_frames = data.motion_num_frames[motion_ids]
    dt = data.motion_dt[motion_ids]
    f0, f1, blend = _calc_frame_blend(motion_times, lengths, num_frames, dt)
    f0l = f0 + data.length_starts[motion_ids]
    f1l = f1 + data.length_starts[motion_ids]
    b = blend[:, None]
    # root position = first 3 columns of the packed frame rows
    return (1.0 - b) * data.frames[f0l, 0:3] + b * data.frames[f1l, 0:3]


def sample_time_interval(
    data: MotionData, rng: jax.Array, motion_ids: jax.Array, interval_fps: float = 30.0
) -> jax.Array:
    """Random start time snapped to the control-frame grid (reference :526-535)."""
    phase = jax.random.uniform(rng, motion_ids.shape)
    lengths = data.motion_lengths[motion_ids]
    dt = 1.0 / interval_fps
    return jnp.floor(phase * lengths / dt) * dt


# ---------------------------------------------------------------------------
# Host-side loading / curriculum
# ---------------------------------------------------------------------------


class MotionLib:
    """Host-side motion dataset manager + device-array builder.

    Mirrors the role of reference `MotionLibBase`/`MotionLibSMPL`
    (`motion_lib.py:180-825`): owns the full unique-motion dataset, the
    adaptive sampling distribution (PMCP), and builds `MotionData` device
    pytrees for a sampled batch of motions.
    """

    def __init__(
        self,
        motion_file: str,
        skeleton_tree=None,
        min_length: int = -1,
        max_length: int = -1,
        im_eval: bool = False,
        fix_height: bool = True,
        is_deterministic: bool = False,
        step_dt: float = 1.0 / 30.0,
        frame_capacity: Optional[int] = None,
        seed: int = 0,
    ):
        from phc_tpu.assets import smpl_humanoid as H

        self.tree = skeleton_tree if skeleton_tree is not None else H.skeleton_tree()
        self.max_length = max_length
        self.im_eval = im_eval
        self.fix_height = fix_height
        self.is_deterministic = is_deterministic
        self.step_dt = step_dt
        self._rng = np.random.default_rng(seed)

        self._load_dataset(motion_file, min_length=min_length, im_eval=im_eval)

        n = self.num_unique_motions
        self._sampling_prob = np.ones(n) / n
        self._termination_history = np.zeros(n)
        self._success_rate = np.zeros(n)
        self.curr_motion_ids: Optional[np.ndarray] = None
        self.frame_capacity = frame_capacity

    # -- dataset ---------------------------------------------------------

    def _load_dataset(self, motion_file: str, min_length: int, im_eval: bool):
        """Load the pickled {key: clip} dataset (reference :192-231).

        Filters short clips (min_length) or length-sorts for eval batching
        (im_eval, longest first so batches retire together).
        """
        import os.path as osp
        import glob

        import joblib

        if osp.isfile(motion_file):
            raw = joblib.load(motion_file)
        else:
            files = sorted(glob.glob(osp.join(motion_file, "*.pkl")))
            assert files, f"no motion pkls under {motion_file}"
            raw = {}
            for f in files:
                raw.update(joblib.load(f))

        items = list(raw.items())
        if min_length != -1:
            items = [(k, v) for k, v in items if len(v["pose_quat_global"]) >= min_length]
        if im_eval:
            items = sorted(items, key=lambda kv: len(kv[1]["pose_quat_global"]), reverse=True)

        self._motion_keys = np.array([k for k, _ in items])
        self._motion_clips = [v for _, v in items]
        self.num_unique_motions = len(items)
        assert self.num_unique_motions > 0, "empty motion dataset"

    @property
    def motion_keys(self) -> np.ndarray:
        return self._motion_keys

    @property
    def unique_motion_frames(self) -> np.ndarray:
        """Frame count of every unique clip in the dataset (pre-crop) — the
        public accessor behind eval batch planning (plan_eval_capacity)."""
        return np.array([len(c["pose_quat_global"]) for c in self._motion_clips])

    # -- sampling / curriculum (PMCP) ------------------------------------

    def sample_indices(self, n: int, random_sample: bool = True, start_idx: int = 0) -> np.ndarray:
        """Choose which unique motions to load (reference :303-312)."""
        if random_sample and not self.is_deterministic:
            return self._rng.choice(
                self.num_unique_motions, size=n, replace=True, p=self._sampling_prob
            ).astype(np.int64)
        return ((np.arange(n) + start_idx) % self.num_unique_motions).astype(np.int64)

    def even_sample_indices(self, n: int) -> np.ndarray:
        """Even coverage for the very first load (reference `humanoid_phc.py:642-646`)."""
        interval = self.num_unique_motions / (n + 50)
        idx = np.floor(np.arange(0, self.num_unique_motions, interval)).astype(np.int64)[:n]
        if len(idx) < n:  # tiny datasets wrap around
            idx = np.resize(idx, n)
        return idx

    def update_hard_sampling_weight(self, failed_keys):
        """Train only on failed sequences (reference :454-470)."""
        if len(failed_keys) > 0:
            all_keys = self._motion_keys.tolist()
            idx = [all_keys.index(k) for k in failed_keys]
            self._sampling_prob[:] = 0.0
            self._sampling_prob[idx] = 1.0 / len(idx)
        else:
            self._sampling_prob[:] = 1.0 / self.num_unique_motions

    def update_soft_sampling_weight(self, failed_keys):
        """Bias towards failed sequences, keep history (reference :472-500)."""
        if len(failed_keys) > 0:
            all_keys = self._motion_keys.tolist()
            idx = [all_keys.index(k) for k in failed_keys]
            self._termination_history[idx] += 1
            if self._termination_history.sum() > 0:
                self._sampling_prob[:] = self._termination_history / self._termination_history.sum()
        else:
            self._sampling_prob[:] = 1.0 / self.num_unique_motions

    @property
    def sampling_prob(self) -> np.ndarray:
        return self._sampling_prob.copy()

    @property
    def termination_history(self) -> np.ndarray:
        return self._termination_history.copy()

    def set_termination_history(self, hist: np.ndarray) -> bool:
        if len(hist) == len(self._termination_history) and hist.sum() > 0:
            self._sampling_prob[:] = hist / hist.sum()
            self._termination_history = np.asarray(hist, dtype=np.float64)
            return True
        return False

    # -- packing to device ------------------------------------------------

    def load_motions(
        self,
        num_motions: int,
        random_sample: bool = True,
        start_idx: int = 0,
        sample_idxes: Optional[np.ndarray] = None,
        randomize_heading: Optional[bool] = None,
        limb_weights: Optional[np.ndarray] = None,
        gender_betas: Optional[np.ndarray] = None,
        max_length: Optional[int] = None,
        deterministic_crop: Optional[bool] = None,
        frame_capacity: Optional[int] = None,
    ) -> MotionData:
        """Sample clips, preprocess (FK + velocities), pack into device arrays.

        Replaces the reference's multiprocess torch loader
        (`motion_lib.py:257-429` + `load_motion_with_skeleton` :744-825)
        with one vectorized pass over the concatenated frames.

        max_length / deterministic_crop / frame_capacity override the
        instance settings per call (the eval harness loads longer clips with
        deterministic start-at-0 crops into its own capacity — reference
        `config.py:122-123` motivation).
        """
        if sample_idxes is None:
            sample_idxes = self.sample_indices(num_motions, random_sample, start_idx)
        sample_idxes = np.asarray(sample_idxes)
        self.curr_motion_ids = sample_idxes
        max_length = self.max_length if max_length is None else max_length
        deterministic_crop = (
            self.is_deterministic if deterministic_crop is None else deterministic_crop
        )
        frame_capacity = self.frame_capacity if frame_capacity is None else frame_capacity

        if randomize_heading is None:
            randomize_heading = not (self.is_deterministic or self.im_eval)

        clips, fpss = [], []
        for i in sample_idxes:
            clip = self._motion_clips[int(i)]
            clips.append(clip)
            fpss.append(float(clip.get("fps", 30)))

        # --- crop and gather raw global poses -------------------------------
        all_grot, all_trans, clip_lens = [], [], []
        for clip in clips:
            grot = np.asarray(clip["pose_quat_global"], dtype=np.float32)
            trans = np.asarray(clip["root_trans_offset"], dtype=np.float32)
            F = grot.shape[0]
            if max_length != -1 and F >= max_length:
                start = 0 if deterministic_crop else int(self._rng.integers(0, F - max_length + 1))
                grot = grot[start : start + max_length]
                trans = trans[start : start + max_length]
                F = max_length
            all_grot.append(grot)
            all_trans.append(trans)
            clip_lens.append(F)

        num_frames = np.asarray(clip_lens, dtype=np.int32)
        starts = np.concatenate([[0], np.cumsum(num_frames)[:-1]]).astype(np.int32)
        Ftot = int(num_frames.sum())

        grot = np.concatenate(all_grot, axis=0)  # (Ftot, 24, 4)
        trans = np.concatenate(all_trans, axis=0)  # (Ftot, 3)

        # --- per-clip random heading rotation (reference :791-800) ---------
        if randomize_heading:
            yaw = self._rng.uniform(-np.pi, np.pi, size=len(clips)).astype(np.float32)
            yaw_f = np.repeat(yaw, num_frames)
            half = 0.5 * yaw_f
            qz = np.stack(
                [np.zeros_like(half), np.zeros_like(half), np.sin(half), np.cos(half)], axis=-1
            )
            grot = K._np_quat_mul(qz[:, None, :], grot)
            cos, sin = np.cos(yaw_f), np.sin(yaw_f)
            x, y = trans[:, 0].copy(), trans[:, 1].copy()
            trans[:, 0] = cos * x - sin * y
            trans[:, 1] = sin * x + cos * y

        # --- FK over all frames at once (host-side: frame counts vary per
        # reload, so a device FK would retrace for every new shape). Uses the
        # threaded C++ kernel when built (phc_tpu/native, the role of the
        # reference's multiprocess torch workers), numpy otherwise. ----------
        from phc_tpu import native

        lrs = K.global_to_local_rotations_np(self.tree, grot)
        fk_out = native.fk(lrs, trans, self.tree.parent_indices, self.tree.local_translation)
        if fk_out is not None:
            grs, gts = fk_out
        else:
            grs, gts = K.forward_kinematics_np(self.tree, lrs, trans)

        # --- ground-height fix (geometry-based) -----------------------------
        # The reference lowers clips so the SMPL *mesh* touches the ground
        # over the first 30 frames (`motion_lib.py:698-742`); without SMPL
        # model files we use the collision geometry's lowest point instead.
        if self.fix_height:
            from phc_tpu.assets import smpl_humanoid as H

            radii = np.array(
                [g[1][-1] if g[0] != "box" else g[1][2] for g in H.geoms()], dtype=np.float32
            )
            for i in range(len(clips)):
                s, f = starts[i], num_frames[i]
                check = min(30, int(f))
                zmin = (gts[s : s + check, :, 2] - radii[None, :]).min()
                gts[s : s + f, :, 2] -= zmin
                trans_slice = slice(s, s + f)
                trans[trans_slice, 2] -= zmin

        # --- velocities (per clip to respect boundaries) --------------------
        gvs = np.zeros_like(gts)
        gavs = np.zeros((Ftot, len(self.tree), 3), np.float32)
        dvs = np.zeros((Ftot, len(self.tree) - 1, 3), np.float32)
        use_native = native.available()
        for i in range(len(clips)):
            s, f = int(starts[i]), int(num_frames[i])
            if use_native:
                out = native.motion_derivatives(gts[s : s + f], grs[s : s + f], lrs[s : s + f], fpss[i])
                gvs[s : s + f], gavs[s : s + f], dvs[s : s + f] = out
            else:
                dt = 1.0 / fpss[i]
                gvs[s : s + f] = K.compute_linear_velocity(gts[s : s + f], dt)
                gavs[s : s + f] = K.compute_angular_velocity(grs[s : s + f], dt)
                dvs[s : s + f] = K.compute_dof_velocities(lrs[s : s + f], fpss[i])

        # --- pad to capacity so reloads never retrace -----------------------
        cap = frame_capacity or Ftot
        if Ftot > cap:
            raise ValueError(f"motion batch needs {Ftot} frames > capacity {cap}")
        pad = cap - Ftot

        def padf(x):
            if pad == 0:
                return x
            return np.concatenate([x, np.repeat(x[-1:], pad, axis=0)], axis=0)

        fps_arr = np.asarray(fpss, dtype=np.float32)
        if gender_betas is not None:
            bodies = np.asarray(gender_betas, np.float32)
        else:
            # per-clip [gender_number, betas(16)] from the dataset (reference
            # `motion_lib.py:381-398` gender_beta; feeds shape-conditioned
            # obs when has_shape_obs is on)
            gender_num = {"neutral": 0.0, "male": 1.0, "female": 2.0}
            bodies = np.zeros((len(clips), 17), np.float32)
            for i, clip in enumerate(clips):
                if "beta" in clip:
                    b = np.asarray(clip["beta"], np.float32).ravel()[:16]
                    bodies[i, 0] = gender_num.get(str(clip.get("gender", "neutral")), 0.0)
                    bodies[i, 1 : 1 + len(b)] = b
        limbw = (
            np.asarray(limb_weights, np.float32)
            if limb_weights is not None
            else np.zeros((len(clips), 10), np.float32)
        )

        F = gts.shape[0]
        packed = np.concatenate(
            [
                gts.reshape(F, -1),
                grs.reshape(F, -1),
                lrs.reshape(F, -1),
                gvs.reshape(F, -1),
                gavs.reshape(F, -1),
                dvs.reshape(F, -1),
            ],
            axis=1,
        )
        return MotionData(
            frames=jnp.asarray(padf(packed)),
            length_starts=jnp.asarray(starts),
            motion_lengths=jnp.asarray((num_frames - 1) / fps_arr, dtype=jnp.float32),
            motion_dt=jnp.asarray(1.0 / fps_arr, dtype=jnp.float32),
            motion_num_frames=jnp.asarray(num_frames),
            motion_bodies=jnp.asarray(bodies),
            motion_limb_weights=jnp.asarray(limbw),
        )

    def get_motion_num_steps(self, data: MotionData) -> np.ndarray:
        """Control steps each loaded motion lasts (reference :543-547)."""
        nf = np.asarray(data.motion_num_frames)
        dt = np.asarray(data.motion_dt)
        fps = 1.0 / dt
        return np.ceil(nf * (1.0 / self.step_dt) / fps).astype(np.int32)

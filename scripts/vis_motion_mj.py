"""Motion / rollout inspector using MuJoCo (viewer or offscreen render).

Port of the reference's `scripts/vis_motion_mj.py` (FK sanity check of a
converted pkl in the MuJoCo viewer) extended to also replay `mode play`
rollout dumps (`play_rollout.npz`). Without a display it renders frames to
PNG/mp4 offscreen.

Usage:
  python scripts/vis_motion_mj.py --motion-file sample.pkl [--render out.mp4]
  python scripts/vis_motion_mj.py --rollout experiments/exp/play_rollout.npz --render out.mp4
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse

import numpy as np


def motion_qpos_sequence(motion_file: str):
    import joblib

    from phc_tpu.assets import smpl_humanoid as H
    from phc_tpu import kinematics as K

    data = joblib.load(motion_file)
    entry = next(iter(data.values()))
    grot = np.asarray(entry["pose_quat_global"], np.float32)
    trans = np.asarray(entry["root_trans_offset"], np.float32)
    tree = H.skeleton_tree()
    local = K.global_to_local_rotations_np(tree, grot)

    def to_wxyz(q):
        return np.concatenate([q[..., 3:4], q[..., :3]], -1)

    F = grot.shape[0]
    qpos = np.zeros((F, 3 + 4 * 24))
    qpos[:, :3] = trans
    qpos[:, 3:7] = to_wxyz(local[:, 0])
    for j in range(1, 24):
        qpos[:, 7 + 4 * (j - 1) : 7 + 4 * j] = to_wxyz(local[:, j])
    return qpos, float(entry.get("fps", 30))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--motion-file", default=None)
    ap.add_argument("--rollout", default=None, help="play_rollout.npz from mode play")
    ap.add_argument("--render", default=None, help="output mp4/png path (offscreen)")
    ap.add_argument("--max-frames", type=int, default=600)
    args = ap.parse_args()

    import mujoco

    from phc_tpu.assets import smpl_humanoid as H

    m = mujoco.MjModel.from_xml_string(H.to_mjcf(joint_type="ball"))
    d = mujoco.MjData(m)

    if args.motion_file:
        qpos_seq, fps = motion_qpos_sequence(args.motion_file)
    elif args.rollout:
        # body positions only: show root trajectory via a fixed T-pose root
        dump = np.load(args.rollout)
        body_pos = dump["body_pos"]
        if body_pos.ndim == 4:  # (T, n_envs, J, 3) gallery dump: show env 0
            body_pos = body_pos[:, 0]
        qpos_seq = np.zeros((len(body_pos), m.nq))
        qpos_seq[:, :3] = body_pos[:, 0]
        qpos_seq[:, 3] = 1.0
        for j in range(1, 24):
            qpos_seq[:, 7 + 4 * (j - 1)] = 1.0
        fps = 30.0
    else:
        raise SystemExit("pass --motion-file or --rollout")

    qpos_seq = qpos_seq[: args.max_frames]

    if args.render:
        renderer = mujoco.Renderer(m, height=480, width=640)
        frames = []
        for qpos in qpos_seq:
            d.qpos[:] = qpos
            mujoco.mj_kinematics(m, d)
            renderer.update_scene(d)
            frames.append(renderer.render().copy())
        out = Path(args.render)
        if out.suffix == ".mp4":
            try:
                import imageio

                imageio.mimsave(out, frames, fps=int(fps))
            except ImportError:
                out = out.with_suffix(".npz")
                np.savez(out, frames=np.stack(frames))
        else:
            np.savez(out, frames=np.stack(frames))
        print(f"rendered {len(frames)} frames -> {out}")
    else:
        import time

        import mujoco.viewer

        with mujoco.viewer.launch_passive(m, d) as viewer:
            t = 0
            while viewer.is_running():
                d.qpos[:] = qpos_seq[t % len(qpos_seq)]
                mujoco.mj_kinematics(m, d)
                viewer.sync()
                time.sleep(1.0 / fps)
                t += 1


if __name__ == "__main__":
    main()

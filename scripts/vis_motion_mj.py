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


def render_mpl(m, d, qpos_seq, ref_seq, out_path, fps):
    """GL-free offscreen rendering: stick-figure skeleton (+ ref ghost) via
    matplotlib 3D, stitched to mp4 (imageio) or saved as npz frames."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import mujoco

    from phc_tpu.assets import smpl_humanoid as H

    tree = H.skeleton_tree()
    parents = tree.parent_indices

    frames = []
    fig = plt.figure(figsize=(6.4, 4.8), dpi=100)
    ax = fig.add_subplot(111, projection="3d")
    for t, qpos in enumerate(qpos_seq):
        d.qpos[:] = qpos
        mujoco.mj_kinematics(m, d)
        xyz = d.xpos[1:25].copy()  # 24 body frames (skip world)
        ax.cla()
        root = qpos[:3]
        for j, p in enumerate(parents):
            if p < 0:
                continue
            ax.plot(*zip(xyz[j], xyz[p]), c="tab:blue", lw=2)
        if ref_seq is not None:
            ref = ref_seq[t]
            for j, p in enumerate(parents):
                if p >= 0:
                    ax.plot(*zip(ref[j], ref[p]), c="tab:red", lw=1, alpha=0.5)
        ax.set_xlim(root[0] - 1, root[0] + 1)
        ax.set_ylim(root[1] - 1, root[1] + 1)
        ax.set_zlim(0, 2)
        ax.set_title(f"frame {t}")
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        frames.append(buf.copy())
    plt.close(fig)

    out = Path(out_path)
    if out.suffix == ".mp4":
        try:
            import imageio

            imageio.mimsave(out, frames, fps=int(fps))
        except Exception:  # no imageio or no ffmpeg backend in this image
            out = out.with_suffix(".npz")
            np.savez(out, frames=np.stack(frames))
    else:
        np.savez(out, frames=np.stack(frames))
    print(f"rendered {len(frames)} frames -> {out} (matplotlib fallback)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--motion-file", default=None)
    ap.add_argument("--rollout", default=None, help="play_rollout.npz from mode play")
    ap.add_argument("--render", default=None, help="output mp4/png path (offscreen)")
    ap.add_argument("--max-frames", type=int, default=600)
    ap.add_argument("--env", type=int, default=0, help="which env of a gallery dump to replay")
    ap.add_argument("--no-follow", action="store_true", help="disable camera follow")
    ap.add_argument("--no-markers", action="store_true", help="hide ref-pose ghost markers")
    args = ap.parse_args()

    import mujoco

    from phc_tpu.assets import smpl_humanoid as H

    m = mujoco.MjModel.from_xml_string(H.to_mjcf(joint_type="ball"))
    d = mujoco.MjData(m)

    ref_seq = None  # (T, J, 3) reference body positions -> ghost markers
    if args.motion_file:
        qpos_seq, fps = motion_qpos_sequence(args.motion_file)
    elif args.rollout:
        from phc_tpu import kinematics as K

        dump = np.load(args.rollout)
        body_pos = dump["body_pos"]
        body_rot = dump["body_rot"] if "body_rot" in dump.files else None
        if body_pos.ndim == 4:  # (T, n_envs, J, 3) gallery dump
            e = min(args.env, body_pos.shape[1] - 1)
            body_pos = body_pos[:, e]
            body_rot = body_rot[:, e] if body_rot is not None else None
            if "ref_pos" in dump.files and not args.no_markers:
                ref_seq = dump["ref_pos"][:, e]
        elif "ref_pos" in dump.files and not args.no_markers:
            ref_seq = dump["ref_pos"]

        def to_wxyz(q):
            return np.concatenate([q[..., 3:4], q[..., :3]], -1)

        qpos_seq = np.zeros((len(body_pos), m.nq))
        qpos_seq[:, :3] = body_pos[:, 0]
        if body_rot is not None:
            # full pose: global body rotations -> tree-local -> ball qpos
            tree = H.skeleton_tree()
            local = K.global_to_local_rotations_np(tree, body_rot.astype(np.float32))
            qpos_seq[:, 3:7] = to_wxyz(local[:, 0])
            for j in range(1, 24):
                qpos_seq[:, 7 + 4 * (j - 1) : 7 + 4 * j] = to_wxyz(local[:, j])
        else:  # legacy dump: root trajectory only
            qpos_seq[:, 3] = 1.0
            for j in range(1, 24):
                qpos_seq[:, 7 + 4 * (j - 1)] = 1.0
        fps = 30.0
    else:
        raise SystemExit("pass --motion-file or --rollout")

    qpos_seq = qpos_seq[: args.max_frames]
    if ref_seq is not None:
        ref_seq = ref_seq[: args.max_frames]

    def add_ref_markers(scene, ref_frame):
        """Ghost spheres at the reference body positions (the reference
        viewer's traj_marker actors, render_env.py:306-335,416-450)."""
        for p in ref_frame:
            if scene.ngeom >= scene.maxgeom:
                break
            g = scene.geoms[scene.ngeom]
            mujoco.mjv_initGeom(
                g, mujoco.mjtGeom.mjGEOM_SPHERE, np.array([0.03, 0, 0]),
                np.asarray(p, np.float64), np.eye(3).ravel(),
                np.array([1.0, 0.3, 0.2, 0.5], np.float32),
            )
            scene.ngeom += 1

    if args.render:
        try:
            renderer = mujoco.Renderer(m, height=480, width=640)
        except Exception as e:  # no GL context (headless image without EGL/OSMesa)
            print(f"mujoco offscreen GL unavailable ({e}); matplotlib fallback")
            render_mpl(m, d, qpos_seq, ref_seq, args.render, fps)
            return
        cam = mujoco.MjvCamera()
        mujoco.mjv_defaultFreeCamera(m, cam)
        cam.distance = 3.5
        cam.elevation = -15.0
        frames = []
        for t, qpos in enumerate(qpos_seq):
            d.qpos[:] = qpos
            mujoco.mj_kinematics(m, d)
            if not args.no_follow:  # camera tracks the root (render_env.py:398-414)
                cam.lookat[:] = qpos[:3]
            renderer.update_scene(d, camera=cam)
            if ref_seq is not None:
                add_ref_markers(renderer.scene, ref_seq[t])
            frames.append(renderer.render().copy())
        out = Path(args.render)
        if out.suffix == ".mp4":
            try:
                import imageio

                imageio.mimsave(out, frames, fps=int(fps))
            except Exception:  # no imageio or no ffmpeg backend
                out = out.with_suffix(".npz")
                np.savez(out, frames=np.stack(frames))
        else:
            np.savez(out, frames=np.stack(frames))
        print(f"rendered {len(frames)} frames -> {out}")
    else:
        import time

        import mujoco.viewer

        # Live-viewer keyboard surface (the reference viewer's bindings,
        # render_env.py:186-205, mapped onto the replay loop; projectile
        # perturbations live in `mode play --perturb.interval N` instead,
        # since live physics runs on the TPU host, not in this viewer):
        #   Space pause/resume  ·  Right-arrow single-step while paused
        #   - / = slow down / speed up  ·  F toggle camera follow
        #   M toggle ref-ghost markers  ·  R rewind to frame 0
        ui = {
            "paused": False,
            "step_once": False,
            "speed": 1.0,
            "follow": not args.no_follow,
            "markers": ref_seq is not None,
            "rewind": False,
        }

        def key_callback(keycode):
            if keycode == ord(" "):
                ui["paused"] = not ui["paused"]
            elif keycode == 262:  # GLFW right arrow
                ui["step_once"] = True
            elif keycode == ord("-"):
                ui["speed"] = max(0.125, ui["speed"] * 0.5)
            elif keycode == ord("="):
                ui["speed"] = min(8.0, ui["speed"] * 2.0)
            elif keycode in (ord("f"), ord("F")):
                ui["follow"] = not ui["follow"]
            elif keycode in (ord("m"), ord("M")):
                ui["markers"] = not ui["markers"]
            elif keycode in (ord("r"), ord("R")):
                ui["rewind"] = True

        with mujoco.viewer.launch_passive(m, d, key_callback=key_callback) as viewer:
            t = 0
            while viewer.is_running():
                if ui["rewind"]:
                    t, ui["rewind"] = 0, False
                ti = t % len(qpos_seq)
                d.qpos[:] = qpos_seq[ti]
                mujoco.mj_kinematics(m, d)
                if ui["follow"]:
                    viewer.cam.lookat[:] = qpos_seq[ti][:3]
                with viewer.lock():
                    viewer.user_scn.ngeom = 0
                    if ref_seq is not None and ui["markers"]:
                        add_ref_markers(viewer.user_scn, ref_seq[ti])
                viewer.sync()
                time.sleep(1.0 / (fps * ui["speed"]))
                if not ui["paused"] or ui["step_once"]:
                    t += 1
                    ui["step_once"] = False


if __name__ == "__main__":
    main()

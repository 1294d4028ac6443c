"""Synthesize a multi-clip training corpus from one converted AMASS clip.

The real AMASS corpus (11,313 clips) is not available in this environment,
but the corpus-scale machinery — resample-every-N-epochs, PMCP reweighting,
full-corpus eval batching (reference `scripts/train.py:291-381`,
`motion_lib.py:454-500`) — needs a many-clip dataset to be exercised for
real. This script derives a deterministic >=64-clip corpus from the shipped
sample (`/root/reference/sample_data/cmu_mocap_05_06.pkl`) via motion-space
augmentations that produce genuinely distinct dynamics:

  * sliding-window crops (different segments of the clip),
  * left/right mirroring (conjugation of every global rotation by the
    y-reflection + L/R joint swap on the symmetric SMPL skeleton),
  * time warps (slerp-resampled 0.85x / 1.2x playback speed — harder and
    easier dynamics at the same 30 fps),
  * fixed heading rotations (distinct eval identities; training already
    randomizes heading per load).

Output schema matches the converter (`scripts/convert_amass_data.py`):
{key: {root_trans_offset, pose_quat_global, fps, ...}}.

Usage: python scripts/synth_corpus.py [--out data/synth_corpus.pkl]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import joblib
import numpy as np

from phc_tpu import body_sets

SAMPLE = "/root/reference/sample_data/cmu_mocap_05_06.pkl"


def _quat_nlerp(q0, q1, t):
    """Normalized lerp with hemisphere fix (adjacent mocap frames are close,
    nlerp == slerp to float precision)."""
    dot = (q0 * q1).sum(axis=-1, keepdims=True)
    q1 = np.where(dot < 0, -q1, q1)
    q = q0 * (1.0 - t) + q1 * t
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def mirror_clip(grot: np.ndarray, trans: np.ndarray):
    """Reflect the motion across the x-z plane (y -> -y).

    A rotation conjugated by the reflection M = diag(1,-1,1) flips the sign
    of the axis components M keeps: q' = (-qx, qy, -qz, qw); left/right
    joints swap roles on the symmetric SMPL skeleton."""
    names = body_sets.BODY_NAMES
    swap = []
    for n in names:
        if n.startswith("L_"):
            swap.append(names.index("R_" + n[2:]))
        elif n.startswith("R_"):
            swap.append(names.index("L_" + n[2:]))
        else:
            swap.append(names.index(n))
    g = grot[:, swap].copy()
    g[..., 0] *= -1.0
    g[..., 2] *= -1.0
    t = trans.copy()
    t[:, 1] *= -1.0
    return g, t


def timewarp_clip(grot: np.ndarray, trans: np.ndarray, speed: float):
    """Resample to `speed`x playback at the same fps (slerp/lerp between
    frames)."""
    F = grot.shape[0]
    n_out = max(int(np.floor((F - 1) / speed)) + 1, 8)
    src = np.minimum(np.arange(n_out) * speed, F - 1 - 1e-6)
    i0 = np.floor(src).astype(np.int64)
    i1 = np.minimum(i0 + 1, F - 1)
    t = (src - i0).astype(np.float32)
    g = _quat_nlerp(grot[i0], grot[i1], t[:, None, None])
    tr = trans[i0] * (1.0 - t[:, None]) + trans[i1] * t[:, None]
    return g.astype(np.float32), tr.astype(np.float32)


def rotate_heading(grot: np.ndarray, trans: np.ndarray, yaw: float):
    half = 0.5 * yaw
    qz = np.array([0.0, 0.0, np.sin(half), np.cos(half)], np.float32)
    x, y, z, w = grot[..., 0], grot[..., 1], grot[..., 2], grot[..., 3]
    qx, qy, qzz, qw = qz
    g = np.stack(
        [
            qw * x + qx * w + qy * z - qzz * y,
            qw * y - qx * z + qy * w + qzz * x,
            qw * z + qx * y - qy * x + qzz * w,
            qw * w - qx * x - qy * y - qzz * z,
        ],
        axis=-1,
    )
    c, s = np.cos(yaw), np.sin(yaw)
    t = trans.copy()
    t[:, 0] = c * trans[:, 0] - s * trans[:, 1]
    t[:, 1] = s * trans[:, 0] + c * trans[:, 1]
    return g.astype(np.float32), t


def main_graded(out_path: str = "data/synth_corpus_graded.pkl"):
    """Speed-graded curriculum corpus targeting the hard segment.

    The r3 capability finding (experiments/tpu_learn_r3/FINDINGS.md): the
    sample clip's full-speed kick resists single-clip training because the
    reference's 99% comes from a corpus where each skill exists across a
    dense difficulty gradient. This builds that gradient explicitly:
    full-clip time warps at 10 speeds from 0.5x to 1.0x (plus mirrors),
    and kick-window crops (the hard segment with lead-in) at the same
    grades — PMCP then walks the policy up the speed ladder.
    """
    raw = joblib.load(SAMPLE)
    (base_key, base), = list(raw.items())[:1]
    grot0 = np.asarray(base["pose_quat_global"], np.float32)
    trans0 = np.asarray(base["root_trans_offset"], np.float32)
    fps = float(base.get("fps", 30))
    F = grot0.shape[0]

    out = {}

    def add(key, g, t):
        out[key] = {
            "pose_quat_global": g,
            "root_trans_offset": t,
            "fps": fps,
            "beta": np.zeros(16, np.float32),
            "gender": "neutral",
        }

    # kick window: ref frames ~20..70 at 30 fps (lead-in + kick + recovery)
    kick = (max(0, 20), min(F, 75))
    speeds = np.linspace(0.5, 1.0, 10)
    for sp in speeds:
        for mirrored in (False, True):
            tag = f"s{sp:.2f}{'_mir' if mirrored else ''}"
            gs, ts = timewarp_clip(grot0, trans0, float(sp))
            if mirrored:
                gs, ts = mirror_clip(gs, ts)
            add(f"{base_key}_full_{tag}", gs, ts)
            gk, tk = timewarp_clip(
                grot0[kick[0] : kick[1]], trans0[kick[0] : kick[1]], float(sp)
            )
            if mirrored:
                gk, tk = mirror_clip(gk, tk)
            add(f"{base_key}_kick_{tag}", gk, tk)

    out_p = Path(out_path)
    out_p.parent.mkdir(parents=True, exist_ok=True)
    joblib.dump(out, out_p)
    print(f"wrote {len(out)} graded clips to {out_p}")
    return out_p


def main_ctx(out_path: str = "data/synth_corpus_ctx.pkl"):
    """Context-graded curriculum corpus: the segment->full-clip bridge.

    The r3 graded ladder taught the kick as a SEGMENT (reset at frame 20
    == the segment's own t=0) but every full clip still dies just before
    kick onset: the r4 eval_trace on `full_s0.50` shows the ARMS diverging
    (L_Hand 1.0 m) at original frames ~15-21 when the policy arrives there
    with ~9 cm of accumulated drift instead of a clean reset. The missing
    rungs are therefore graded CONTEXT: the same kick window with
    progressively longer lead-ins (so reaching the wind-up from flight is
    its own rung) and progressively longer tails (so the post-kick clip
    extends toward the full 223 frames). Keys for the kick/full windows
    match `main_graded` exactly, keeping eval TSVs comparable across
    rounds."""
    raw = joblib.load(SAMPLE)
    (base_key, base), = list(raw.items())[:1]
    grot0 = np.asarray(base["pose_quat_global"], np.float32)
    trans0 = np.asarray(base["root_trans_offset"], np.float32)
    fps = float(base.get("fps", 30))
    F = grot0.shape[0]

    out = {}

    def add(key, g, t):
        out[key] = {
            "pose_quat_global": g,
            "root_trans_offset": t,
            "fps": fps,
            "beta": np.zeros(16, np.float32),
            "gender": "neutral",
        }

    # windows in original-frame coordinates: the r3 kick segment, two
    # lead-in extensions back to the clip start, two tail extensions, and
    # the full clip
    windows = [
        ("kick", 20, 75),
        ("lead10", 10, 75),
        ("lead0", 0, 75),
        ("ext110", 0, 110),
        ("ext150", 0, 150),
        ("full", 0, F),
    ]
    speeds = np.linspace(0.5, 1.0, 10)
    for wname, a, b in windows:
        b = min(b, F)
        for sp in speeds:
            for mirrored in (False, True):
                tag = f"s{sp:.2f}{'_mir' if mirrored else ''}"
                g, t = timewarp_clip(grot0[a:b], trans0[a:b], float(sp))
                if mirrored:
                    g, t = mirror_clip(g, t)
                add(f"{base_key}_{wname}_{tag}", g, t)

    out_p = Path(out_path)
    out_p.parent.mkdir(parents=True, exist_ok=True)
    joblib.dump(out, out_p)
    print(f"wrote {len(out)} context-graded clips to {out_p}")
    return out_p


def main_ctx2(out_path: str = "data/synth_corpus_ctx2.pkl"):
    """Round-5 frontier corpus: ctx ladder + fine + overspeed rungs.

    The r4 production run (experiments/tpu_ctx2_r4) closed every kick rung
    through s0.89 but left s0.94 and s1.00 open — and 1.0x is the TERMINAL
    rung of the ladder, so PMCP has no gradient past it. Two fixes, per the
    r4 verdict: (a) densify the ladder around the frontier (0.92/0.96/0.98
    on the kick/lead windows, making the 0.89->0.94->1.00 jumps ~2-4%
    instead of ~5.5%), (b) add overspeed rungs (1.05/1.10/1.15 kick/lead,
    1.05/1.10 full) so the 1.0x target sits INSIDE the graded range.
    All 120 ctx keys are kept verbatim so eval TSVs remain comparable with
    tpu_ctx2_r4's ladder history. 166 clips total."""
    raw = joblib.load(SAMPLE)
    (base_key, base), = list(raw.items())[:1]
    grot0 = np.asarray(base["pose_quat_global"], np.float32)
    trans0 = np.asarray(base["root_trans_offset"], np.float32)
    fps = float(base.get("fps", 30))
    F = grot0.shape[0]

    out = {}

    def add(key, g, t):
        out[key] = {
            "pose_quat_global": g,
            "root_trans_offset": t,
            "fps": fps,
            "beta": np.zeros(16, np.float32),
            "gender": "neutral",
        }

    windows = [
        ("kick", 20, 75),
        ("lead10", 10, 75),
        ("lead0", 0, 75),
        ("ext110", 0, 110),
        ("ext150", 0, 150),
        ("full", 0, F),
    ]
    base_speeds = list(np.linspace(0.5, 1.0, 10))
    fine = [0.92, 0.96, 0.98]          # densify the open 0.89->1.00 gap
    over = [1.05, 1.10, 1.15]          # make 1.0x interior, not terminal
    for wname, a, b in windows:
        b = min(b, F)
        speeds = list(base_speeds)
        if wname in ("kick", "lead10", "lead0"):
            speeds += fine + over
        elif wname == "full":
            speeds += [1.05, 1.10]
        for sp in speeds:
            for mirrored in (False, True):
                tag = f"s{sp:.2f}{'_mir' if mirrored else ''}"
                g, t = timewarp_clip(grot0[a:b], trans0[a:b], float(sp))
                if mirrored:
                    g, t = mirror_clip(g, t)
                add(f"{base_key}_{wname}_{tag}", g, t)

    out_p = Path(out_path)
    out_p.parent.mkdir(parents=True, exist_ok=True)
    joblib.dump(out, out_p)
    print(f"wrote {len(out)} frontier-graded clips to {out_p}")
    return out_p


def main_big(out_path: str = "data/synth_corpus_1k.pkl", target: int = 1280):
    """>=1k-clip corpus for corpus-scale eval demonstration (r3 VERDICT #6:
    the streaming eval harness is sized for the 11,313-motion AMASS sweep,
    `runtime/eval_harness.py`, but had only ever been exercised at 72-120
    clips). Crops x speeds x mirrors x headings of the sample clip produce
    `target` distinct eval identities with the converter's schema."""
    raw = joblib.load(SAMPLE)
    (base_key, base), = list(raw.items())[:1]
    grot0 = np.asarray(base["pose_quat_global"], np.float32)
    trans0 = np.asarray(base["root_trans_offset"], np.float32)
    fps = float(base.get("fps", 30))
    F = grot0.shape[0]

    out = {}

    def add(key, g, t):
        out[key] = {
            "pose_quat_global": g,
            "root_trans_offset": t,
            "fps": fps,
            "beta": np.zeros(16, np.float32),
            "gender": "neutral",
        }

    win = 110
    n_windows = 10
    speeds = np.linspace(0.55, 1.15, 8)
    yaws = np.linspace(0.0, 2.0 * np.pi, 8, endpoint=False)
    starts = np.linspace(0, max(F - win, 0), n_windows).astype(int)
    for wi, start in enumerate(starts):
        gw, tw = grot0[start : start + win], trans0[start : start + win]
        for sp in speeds:
            gs, ts = timewarp_clip(gw, tw, float(sp))
            for mirrored in (False, True):
                gm, tm = mirror_clip(gs, ts) if mirrored else (gs, ts)
                for yi, yaw in enumerate(yaws):
                    gy, ty = rotate_heading(gm, tm, float(yaw)) if yaw else (gm, tm)
                    key = f"{base_key}_w{wi}_s{sp:.2f}{'_mir' if mirrored else ''}_y{yi}"
                    add(key, gy, ty)
                    if len(out) >= target:
                        break
                if len(out) >= target:
                    break
            if len(out) >= target:
                break
        if len(out) >= target:
            break

    out_p = Path(out_path)
    out_p.parent.mkdir(parents=True, exist_ok=True)
    joblib.dump(out, out_p)
    total_frames = sum(v["pose_quat_global"].shape[0] for v in out.values())
    print(f"wrote {len(out)} clips ({total_frames} frames) to {out_p}")
    return out_p


def main_11k(out_path: str = "data/synth_corpus_11k.pkl", target: int = 11313):
    """AMASS-scale corpus: 11,313 distinct eval identities (the reference's
    headline count, `/root/reference/README.md:14-17`), derived like
    main_big but with denser window/speed/heading grids. Exists to MEASURE
    the 11k eval design point (r4 verdict #9: the 11k wall-time/memory
    numbers were extrapolated from 1280, never measured)."""
    raw = joblib.load(SAMPLE)
    (base_key, base), = list(raw.items())[:1]
    grot0 = np.asarray(base["pose_quat_global"], np.float32)
    trans0 = np.asarray(base["root_trans_offset"], np.float32)
    fps = float(base.get("fps", 30))
    F = grot0.shape[0]

    out = {}

    def add(key, g, t):
        out[key] = {
            "pose_quat_global": g,
            "root_trans_offset": t,
            "fps": fps,
            "beta": np.zeros(16, np.float32),
            "gender": "neutral",
        }

    win = 110
    speeds = np.linspace(0.55, 1.15, 18)
    yaws = np.linspace(0.0, 2.0 * np.pi, 16, endpoint=False)
    starts = np.linspace(0, max(F - win, 0), 20).astype(int)
    done = False
    for wi, start in enumerate(starts):
        gw, tw = grot0[start : start + win], trans0[start : start + win]
        for sp in speeds:
            gs, ts = timewarp_clip(gw, tw, float(sp))
            for mirrored in (False, True):
                gm, tm = mirror_clip(gs, ts) if mirrored else (gs, ts)
                for yi, yaw in enumerate(yaws):
                    gy, ty = rotate_heading(gm, tm, float(yaw)) if yaw else (gm, tm)
                    key = f"{base_key}_w{wi}_s{sp:.3f}{'_mir' if mirrored else ''}_y{yi}"
                    add(key, gy, ty)
                    done = len(out) >= target
                    if done:
                        break
                if done:
                    break
            if done:
                break
        if done:
            break

    out_p = Path(out_path)
    out_p.parent.mkdir(parents=True, exist_ok=True)
    joblib.dump(out, out_p)
    total_frames = sum(v["pose_quat_global"].shape[0] for v in out.values())
    print(f"wrote {len(out)} clips ({total_frames} frames) to {out_p}")
    return out_p


def main(out_path: str = "data/synth_corpus.pkl"):
    raw = joblib.load(SAMPLE)
    (base_key, base), = list(raw.items())[:1]
    grot0 = np.asarray(base["pose_quat_global"], np.float32)
    trans0 = np.asarray(base["root_trans_offset"], np.float32)
    fps = float(base.get("fps", 30))
    F = grot0.shape[0]

    out = {}

    def add(key, g, t):
        clip = {
            "pose_quat_global": g,
            "root_trans_offset": t,
            "fps": fps,
            "beta": np.zeros(16, np.float32),
            "gender": "neutral",
        }
        out[key] = clip

    # windows: full clip + 3 sliding 120-frame crops (linspace over starts)
    windows = [("full", grot0, trans0)]
    win = 120
    for wi, start in enumerate(np.linspace(0, max(F - win, 0), 3).astype(int)):
        windows.append((f"w{wi}", grot0[start : start + win], trans0[start : start + win]))

    speeds = [1.0, 0.85, 1.2]
    yaws = [0.0, 2.0 * np.pi / 3.0, -2.0 * np.pi / 3.0]
    for wname, g0, t0 in windows:
        for sp in speeds:
            gs, ts = (g0, t0) if sp == 1.0 else timewarp_clip(g0, t0, sp)
            for mirrored in (False, True):
                gm, tm = mirror_clip(gs, ts) if mirrored else (gs, ts)
                for yi, yaw in enumerate(yaws):
                    gy, ty = rotate_heading(gm, tm, yaw) if yaw != 0.0 else (gm, tm)
                    key = f"{base_key}_{wname}_s{sp:g}{'_mir' if mirrored else ''}_y{yi}"
                    add(key, gy, ty)

    out_p = Path(out_path)
    out_p.parent.mkdir(parents=True, exist_ok=True)
    joblib.dump(out, out_p)
    print(f"wrote {len(out)} clips to {out_p}")
    return out_p


if __name__ == "__main__":
    if "--graded" in sys.argv:
        main_graded(
            sys.argv[sys.argv.index("--out") + 1]
            if "--out" in sys.argv
            else "data/synth_corpus_graded.pkl"
        )
    elif "--ctx" in sys.argv:
        main_ctx(
            sys.argv[sys.argv.index("--out") + 1]
            if "--out" in sys.argv
            else "data/synth_corpus_ctx.pkl"
        )
    elif "--ctx2" in sys.argv:
        main_ctx2(
            sys.argv[sys.argv.index("--out") + 1]
            if "--out" in sys.argv
            else "data/synth_corpus_ctx2.pkl"
        )
    elif "--big" in sys.argv:
        main_big(
            sys.argv[sys.argv.index("--out") + 1]
            if "--out" in sys.argv
            else "data/synth_corpus_1k.pkl"
        )
    elif "--amass11k" in sys.argv:
        main_11k(
            sys.argv[sys.argv.index("--out") + 1]
            if "--out" in sys.argv
            else "data/synth_corpus_11k.pkl"
        )
    else:
        main(sys.argv[sys.argv.index("--out") + 1] if "--out" in sys.argv else "data/synth_corpus.pkl")

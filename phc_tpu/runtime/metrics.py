"""Motion-imitation evaluation metrics + training stats aggregation.

`compute_metrics_lite` re-implements the metric suite the reference imports
from `smpl_sim` (`scripts/train.py:20,201-202`): global/root-relative/
procrustes-aligned MPJPE (mm), and acceleration/velocity distance between
predicted and ground-truth body trajectories.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List

import numpy as np


def _procrustes_align(pred: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """Per-frame similarity alignment (rotation+scale+translation) of pred
    onto gt. pred/gt: (F, J, 3)."""
    mu_p = pred.mean(axis=1, keepdims=True)
    mu_g = gt.mean(axis=1, keepdims=True)
    p = pred - mu_p
    g = gt - mu_g
    # correlation (F, 3, 3)
    H = np.einsum("fji,fjk->fik", p, g)
    U, S, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(np.einsum("fij,fjk->fik", np.transpose(Vt, (0, 2, 1)), np.transpose(U, (0, 2, 1)))))
    D = np.zeros_like(H)
    D[:, 0, 0] = 1.0
    D[:, 1, 1] = 1.0
    D[:, 2, 2] = d
    R = np.einsum("fij,fjk,fkl->fil", np.transpose(Vt, (0, 2, 1)), D, np.transpose(U, (0, 2, 1)))
    var_p = (p**2).sum(axis=(1, 2))
    scale = (S.sum(axis=1) * np.where(d < 0, -1.0, 1.0) * 0 + (S * np.stack([np.ones_like(d), np.ones_like(d), d], -1)).sum(axis=1)) / np.maximum(var_p, 1e-8)
    aligned = scale[:, None, None] * np.einsum("fij,fkj->fki", R, p) + mu_g
    return aligned


def compute_metrics_lite(pred_pos_all: List[np.ndarray], gt_pos_all: List[np.ndarray], dt: float = 1 / 30) -> Dict[str, np.ndarray]:
    """Per-motion metric arrays (units: mm for mpjpe, mm/frame for dists).

    pred/gt entries: (F_i, J, 3) world-space body positions.
    """
    out = defaultdict(list)
    for pred, gt in zip(pred_pos_all, gt_pos_all):
        if len(pred) == 0:
            continue
        pred = np.asarray(pred, np.float64)
        gt = np.asarray(gt, np.float64)

        mpjpe_g = np.linalg.norm(pred - gt, axis=-1).mean() * 1000.0

        pred_l = pred - pred[:, :1]
        gt_l = gt - gt[:, :1]
        mpjpe_l = np.linalg.norm(pred_l - gt_l, axis=-1).mean() * 1000.0

        pa = _procrustes_align(pred, gt)
        mpjpe_pa = np.linalg.norm(pa - gt, axis=-1).mean() * 1000.0

        if len(pred) > 2:
            accel_pred = pred[:-2] - 2 * pred[1:-1] + pred[2:]
            accel_gt = gt[:-2] - 2 * gt[1:-1] + gt[2:]
            accel_dist = np.linalg.norm(accel_pred - accel_gt, axis=-1).mean() * 1000.0
        else:
            accel_dist = 0.0
        if len(pred) > 1:
            vel_pred = pred[1:] - pred[:-1]
            vel_gt = gt[1:] - gt[:-1]
            vel_dist = np.linalg.norm(vel_pred - vel_gt, axis=-1).mean() * 1000.0
        else:
            vel_dist = 0.0

        out["mpjpe_g"].append(mpjpe_g)
        out["mpjpe_l"].append(mpjpe_l)
        out["mpjpe_pa"].append(mpjpe_pa)
        out["accel_dist"].append(accel_dist)
        out["vel_dist"].append(vel_dist)
    return {k: np.asarray(v) for k, v in out.items()}


class UtilizationMonitor:
    """Background 1 Hz CPU/memory sampler (port of the reference's
    `Utilization` daemon thread, `clean_pufferl/structs.py:393-420`; the
    GPU fields become N/A — TPU device stats are not host-visible here, the
    device-side picture comes from the jax profiler / PhaseProfiler)."""

    def __init__(self, interval: float = 1.0, maxlen: int = 600):
        import threading
        from collections import deque

        self.interval = interval
        self.cpu_util = deque(maxlen=maxlen)
        self.mem_util = deque(maxlen=maxlen)
        self._stop = threading.Event()
        try:
            import psutil  # noqa: F401

            self._psutil = psutil
        except ImportError:  # pragma: no cover
            self._psutil = None
            return
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        ps = self._psutil
        while not self._stop.is_set():
            self.cpu_util.append(ps.cpu_percent(interval=None))
            self.mem_util.append(ps.virtual_memory().percent)
            self._stop.wait(self.interval)

    def snapshot(self) -> dict:
        import numpy as _np

        if self._psutil is None or not self.cpu_util:
            return {}
        return {
            "cpu_util": float(_np.mean(self.cpu_util)),
            "mem_util": float(_np.mean(self.mem_util)),
        }

    def stop(self):
        self._stop.set()


class MetricsLogger:
    """Append-only jsonl run log — the wandb-role artifact (reference logs
    to wandb under 0verview/environment/losses/performance namespaces,
    `clean_pufferl/structs.py:286-303`; here every epoch's record persists
    machine-readably under the experiment directory)."""

    def __init__(self, path):
        import io
        import os

        d = os.path.dirname(str(path))
        if d:  # bare relative filenames have no dir to create
            os.makedirs(d, exist_ok=True)
        self._f: io.TextIOBase = open(path, "a", buffering=1)

    def log(self, record: dict):
        import json
        import time as _time

        rec = {"wall_time": _time.time()}
        for k, v in record.items():
            v = np.asarray(v) if not isinstance(v, (int, float, str, bool)) else v
            if isinstance(v, np.ndarray):
                if v.ndim == 0:
                    v = float(v)
                else:
                    v = v.tolist()
            rec[k] = v
        self._f.write(json.dumps(rec) + "\n")

    def close(self):
        self._f.close()


class StatsAggregator:
    """Rolling scalar-stat aggregation for the dashboard / wandb
    (role of reference `StatsData`, `clean_pufferl/structs.py:199-304`)."""

    def __init__(self):
        self._data = defaultdict(list)

    def add(self, key: str, value):
        self._data[key].append(float(value))

    def add_dict(self, d: dict, prefix: str = ""):
        for k, v in d.items():
            try:
                v = np.asarray(v, dtype=np.float64)
            except (TypeError, ValueError):
                continue  # non-numeric payloads (e.g. pmcp/top_clips) are jsonl-only
            if v.ndim == 0:
                self.add(prefix + k, float(v))
            else:
                for i, vi in enumerate(v.ravel()):
                    self.add(f"{prefix}{k}_{i}", float(vi))

    def means(self) -> dict:
        return {k: float(np.mean(v)) for k, v in self._data.items() if v}

    def clear(self):
        self._data.clear()

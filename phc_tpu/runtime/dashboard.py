"""Rich terminal dashboard + phase profiling.

Role of the reference's rich TUI and profile struct
(`/root/reference/puffer_phc/clean_pufferl/utils.py:108-207`,
`structs.py:317-420`): live SPS, per-phase timings, losses, env stats, and a
background utilization sampler.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict, Optional


class PhaseProfiler:
    """Wall-time per phase with honest device sync (reference
    `structs.py:333-368` + the explicit cuda.synchronize calls in core.py)."""

    def __init__(self):
        self.times = defaultdict(float)
        self.counts = defaultdict(int)
        self.start_time = time.time()
        self.total_steps = 0

    @contextmanager
    def phase(self, name: str, sync_tree=None):
        t0 = time.time()
        try:
            yield
        finally:
            if sync_tree is not None:
                import jax

                jax.block_until_ready(sync_tree)
            self.times[name] += time.time() - t0
            self.counts[name] += 1

    @property
    def elapsed(self) -> float:
        return time.time() - self.start_time

    def sps(self) -> float:
        return self.total_steps / max(self.elapsed, 1e-9)

    def fractions(self) -> Dict[str, float]:
        total = sum(self.times.values()) or 1.0
        return {k: v / total for k, v in self.times.items()}


def abbreviate(n: float) -> str:
    for div, unit in ((1e9, "B"), (1e6, "M"), (1e3, "K")):
        if abs(n) >= div:
            return f"{n / div:.2f}{unit}"
    return f"{n:.0f}"


def print_dashboard(
    env_name: str,
    global_step: float,
    epoch: int,
    profile: PhaseProfiler,
    losses: Dict[str, float],
    stats: Dict[str, float],
    msg: str = "",
    use_rich: bool = True,
):
    if not use_rich:
        loss_str = " ".join(f"{k}={v:.4f}" for k, v in list(losses.items())[:6])
        print(
            f"[{env_name}] step {abbreviate(global_step)} epoch {epoch} "
            f"SPS {abbreviate(profile.sps())} | {loss_str} | {msg}",
            flush=True,
        )
        return

    from rich.console import Console
    from rich.table import Table

    console = Console()
    table = Table(title=f"{env_name} — epoch {epoch}", show_header=True, header_style="bold")
    table.add_column("metric")
    table.add_column("value", justify="right")
    table.add_row("agent steps", abbreviate(global_step))
    table.add_row("SPS", abbreviate(profile.sps()))
    table.add_row("uptime", f"{profile.elapsed:.0f}s")
    for k, v in profile.fractions().items():
        table.add_row(f"time% {k}", f"{100 * v:.1f}%")
    for k, v in losses.items():
        table.add_row(k, f"{v:.5f}")
    for k, v in list(stats.items())[:12]:
        table.add_row(k, f"{v:.4f}")
    if msg:
        table.add_row("msg", msg)
    console.print(table)

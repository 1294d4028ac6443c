"""phc_tpu — a TPU-native Perpetual Humanoid Control framework.

Brand-new JAX/XLA/Pallas/pjit implementation with the capabilities of the
reference `howird/puffer-phc` (Isaac Gym + PufferLib PPO), re-designed
TPU-first: a batched articulated rigid-body simulator, a device-resident
motion library, pure-functional imitation environments, a scan-based PPO
trainer, and a mesh/collective layer for multi-chip scaling.
"""

from pathlib import Path

ROOT_DIR = Path(__file__).resolve().parent.parent
ASSET_DIR = ROOT_DIR / "assets"

__version__ = "0.1.0"

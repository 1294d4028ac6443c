from phc_tpu.env.humanoid_env import (
    EnvState,
    HumanoidEnv,
    StepOutput,
    make_env,
    reset_all,
    step,
    fetch_amp_obs_demo,
)
from phc_tpu.env import kernels

__all__ = [
    "EnvState",
    "HumanoidEnv",
    "StepOutput",
    "make_env",
    "reset_all",
    "step",
    "fetch_amp_obs_demo",
    "kernels",
]

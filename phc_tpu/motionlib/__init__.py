from phc_tpu.motionlib.motion_lib import (
    MotionData,
    MotionLib,
    MotionState,
    get_motion_state,
    get_root_pos,
    sample_time_interval,
)

__all__ = [
    "MotionData",
    "MotionLib",
    "MotionState",
    "get_motion_state",
    "get_root_pos",
    "sample_time_interval",
]

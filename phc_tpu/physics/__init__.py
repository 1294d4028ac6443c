from phc_tpu.physics.model import PhysicsModel, build_smpl_model, build_pd_action_offset_scale
from phc_tpu.physics.engine import (
    PhysicsState,
    BodyFrame,
    forward_kinematics,
    mass_matrix,
    bias_forces,
    contact_kinematics,
    step,
    state_from_parts,
    default_state,
    dof_positions,
    dof_velocities,
)

__all__ = [
    "PhysicsModel",
    "build_smpl_model",
    "build_pd_action_offset_scale",
    "PhysicsState",
    "BodyFrame",
    "forward_kinematics",
    "mass_matrix",
    "bias_forces",
    "contact_kinematics",
    "step",
    "state_from_parts",
    "default_state",
    "dof_positions",
    "dof_velocities",
]

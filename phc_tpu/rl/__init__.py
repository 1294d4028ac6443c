from phc_tpu.rl import gae, policies, ppo, running_norm

__all__ = ["gae", "policies", "ppo", "running_norm"]

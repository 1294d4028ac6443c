from phc_tpu.runtime import checkpoint, dashboard, eval_harness, metrics

__all__ = ["checkpoint", "dashboard", "eval_harness", "metrics"]

"""Sweep mode: random search runs trials and ranks them (the reference
declares this mode but has no implementation — scripts/train.py:458-481)."""

import json
import dataclasses

import numpy as np


def test_mode_sweep_tiny(tmp_path):
    # (The r1-r4 order-dependent FileNotFoundError('') here was
    # test_parallel importing __graft_entry__, which set
    # JAX_COMPILATION_CACHE_DIR="" process-wide; setup_cache then ran
    # makedirs(''). Fixed at the source — __graft_entry__ uses the
    # JAX_ENABLE_COMPILATION_CACHE kill switch and setup_cache treats an
    # empty env var as unset.)
    import scripts.train as train_cli
    from phc_tpu.config import AppConfig

    cfg = AppConfig()
    cfg.exp_name = "sweep_test"
    cfg.env.num_envs = 8
    cfg.env.motion_file = "/root/reference/sample_data/cmu_mocap_05_06.pkl"
    cfg.policy = dataclasses.replace(cfg.policy, hidden_size=16, layer_sizes=(32, 16))
    cfg.train = dataclasses.replace(
        cfg.train, batch_size=64, minibatch_size=32, data_dir=str(tmp_path)
    )
    cfg.sweep = dataclasses.replace(
        cfg.sweep, num_trials=2, steps_per_trial=128
    )

    train_cli.mode_sweep(cfg)

    out = tmp_path / "sweep_test" / "sweep_results.json"
    results = json.loads(out.read_text())
    assert len(results) == 2
    assert results[0]["score"] >= results[1]["score"]
    for r in results:
        assert np.isfinite(r["score"])
        assert 1e-5 <= r["learning_rate"] <= 1e-3
        assert 0.95 <= r["gamma"] < 1.0

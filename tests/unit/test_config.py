"""Config system (SURVEY.md §5.6): overrides, hashing, YAML round-trip."""

import numpy as np
import pytest

from sfm_tpu.config import (
    PipelineConfig, apply_overrides, config_hash, config_to_dict, config_from_dict,
    load_config, save_config,
)


def test_overrides_and_hash():
    cfg = PipelineConfig()
    cfg2 = apply_overrides(cfg, {"sift.max_keypoints": 8192, "pair_mode": "vocab_tree"})
    assert cfg2.sift.max_keypoints == 8192
    assert cfg2.pair_mode == "vocab_tree"
    assert cfg.sift.max_keypoints == 4096  # original untouched (frozen)
    assert config_hash(cfg) != config_hash(cfg2)
    assert config_hash(cfg) == config_hash(PipelineConfig())


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        apply_overrides(PipelineConfig(), {"sift.nope": 1})


def test_dict_roundtrip():
    cfg = apply_overrides(PipelineConfig(), {"ba.robust_loss": "cauchy", "shard.num_devices": 4})
    cfg2 = config_from_dict(PipelineConfig, config_to_dict(cfg))
    assert cfg2 == cfg


def test_yaml_roundtrip(tmp_path):
    pytest.importorskip("yaml")
    cfg = apply_overrides(PipelineConfig(), {"engine.max_images": 128, "seed": 7})
    p = tmp_path / "cfg.yaml"
    save_config(cfg, str(p))
    cfg2 = load_config(str(p), overrides={"seed": 9})
    assert cfg2.engine.max_images == 128
    assert cfg2.seed == 9
    assert config_hash(cfg2) == config_hash(apply_overrides(cfg, {"seed": 9}))


def test_summary_report_fields():
    from tests.unit.test_ba import scene_to_reconstruction
    from sfm_tpu.utils.synthetic import make_orbit_scene

    rec = scene_to_reconstruction(make_orbit_scene(num_cameras=4, num_points=30))
    s = rec.summary()
    for k in ["num_registered", "num_points", "mean_reproj_error_px",
              "median_reproj_error_px", "mean_track_length", "track_length_hist"]:
        assert k in s
    assert s["track_length_hist"][">=2"] >= 0
    assert s["mean_reproj_error_px"] < 1e-2  # unperturbed scene


def test_stage_config_hash_scoping():
    """Stage-scoped artifact keys (run.py): downstream-config edits must not
    invalidate upstream stage artifacts, and cosmetic fields must not
    invalidate anything."""
    import dataclasses
    from sfm_tpu.config import stage_config_hash, BAConfig, SiftConfig

    cfg = PipelineConfig()
    tweaked_ba = dataclasses.replace(cfg, ba=BAConfig(max_iterations=3))
    assert stage_config_hash(cfg, "features") == stage_config_hash(tweaked_ba, "features")
    assert stage_config_hash(cfg, "matches") == stage_config_hash(tweaked_ba, "matches")
    assert stage_config_hash(cfg, "reconstruction") != stage_config_hash(tweaked_ba, "reconstruction")

    tweaked_sift = dataclasses.replace(cfg, sift=SiftConfig(max_keypoints=123))
    assert stage_config_hash(cfg, "features") != stage_config_hash(tweaked_sift, "features")
    assert stage_config_hash(cfg, "matches") != stage_config_hash(tweaked_sift, "matches")

    cosmetic = dataclasses.replace(cfg, verbose=not cfg.verbose, artifact_dir="/tmp/x")
    for stage in ("features", "matches", "reconstruction"):
        assert stage_config_hash(cfg, stage) == stage_config_hash(cosmetic, stage)

    # engine_mode MUST key the reconstruction artifact: a global and an
    # incremental run sharing an artifact dir would otherwise serve each
    # other's cached reconstruction (r5 regression — the 512 A/B's
    # incremental row came back bit-identical to the global row's).
    global_mode = dataclasses.replace(cfg, engine_mode="global")
    assert stage_config_hash(cfg, "matches") == stage_config_hash(global_mode, "matches")
    assert stage_config_hash(cfg, "reconstruction") != stage_config_hash(global_mode, "reconstruction")

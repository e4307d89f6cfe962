"""YAML loader tests: our configs AND the reference's must load identically."""

import pathlib

import pytest

from swarmacb_tpu.config.loader import load_config

OUR_CONFIGS = pathlib.Path(__file__).resolve().parents[1] / "configs"
REF_CONFIGS = pathlib.Path("/root/reference/configs")

VARIANTS = ["dandelion", "daisy", "lily", "tulip", "cyclamen"]


@pytest.mark.parametrize("variant", VARIANTS)
def test_our_configs_load(variant):
    run, var, cfg, ov = load_config(OUR_CONFIGS / f"DirGate_{variant}.yaml")
    assert run == f"DirGate_{variant}"
    assert var == variant
    assert cfg.mini_batch_size == 2048
    assert cfg.buffer_size_hint == 20480
    assert cfg.total_timesteps == 120_000_000
    assert cfg.horizon == 1000
    assert cfg.lr_schedule == "linear"
    assert ov == {"num_envs": 5, "episode_length_s": 120.0}
    assert cfg.recurrent == (variant == "cyclamen")
    if variant == "cyclamen":
        assert cfg.memory_size == 128 and cfg.sequence_length == 64
    if variant in ("tulip", "cyclamen"):
        assert cfg.hidden_dim == 128 and cfg.num_layers == 1
    else:
        assert cfg.hidden_dim == 512 and cfg.num_layers == 2
    assert cfg.lr == (0.0005 if variant == "tulip" else 0.0003)


@pytest.mark.parametrize("variant", VARIANTS)
def test_reference_configs_load_identically(variant):
    """The reference's own YAML files must load unmodified and produce the
    same trainer config as ours (schema compatibility)."""
    if not REF_CONFIGS.exists():
        pytest.skip("reference repo not mounted")
    run_r, var_r, cfg_r, ov_r = load_config(REF_CONFIGS / f"DirGate_{variant}.yaml")
    run_o, var_o, cfg_o, ov_o = load_config(OUR_CONFIGS / f"DirGate_{variant}.yaml")
    assert (run_r, var_r, ov_r) == (run_o, var_o, ov_o)
    assert vars(cfg_r) == vars(cfg_o)


def test_missing_config_raises():
    with pytest.raises(FileNotFoundError):
        load_config("configs/nope.yaml")

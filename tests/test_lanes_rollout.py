"""Trainer rollout over the fused env step (POCAConfig.fused_env_step):
the lanes-path rollout must train end-to-end with the same interface as
the composed rollout (VERDICT r4 #2). Pallas runs in interpret mode on
CPU, so shapes are kept tiny.
"""

import jax
import numpy as np
import pytest

from swarmacb_tpu.agents import POCAConfig, POCATrainer
from swarmacb_tpu.env import make_env


def tiny_cfg(**kw):
    base = dict(horizon=4, total_timesteps=10**9, hidden_dim=16, num_layers=1,
                buffer_size_hint=32, mini_batch_size=8, summary_freq=10**9,
                checkpoint_interval=10**9, split_update_groups=0,
                fused_env_step=True)
    base.update(kw)
    return POCAConfig(**base)


def one_iteration(variant, **cfg_kw):
    env = make_env("SwarmACB-DirectionalGate-v0", variant=variant,
                   num_envs=2, use_pallas=False)
    t = POCATrainer(env, tiny_cfg(**cfg_kw))
    assert t._use_lanes
    key_reset, t.key = jax.random.split(t.key)
    es, obs = t.env.reset(key_reset)
    carry = t.init_actor_carry() if t.recurrent else ()
    es, obs, carry, m = t.train_iteration(es, obs, carry)
    return es, obs, m


@pytest.mark.slow
class TestLanesRollout:
    def test_discrete(self):
        es, obs, m = one_iteration("daisy")
        for k in ("policy_loss", "value_loss", "baseline_loss", "entropy"):
            assert np.isfinite(m[k]), (k, m[k])
        assert obs.shape == (2, 20, 24)
        # env state converted back from lanes keeps the full contract
        assert es.pos.shape == (2, 20, 2)
        assert es.behavior.explore_state.shape == (2, 20)

    def test_continuous(self):
        es, obs, m = one_iteration("dandelion")
        for k in ("policy_loss", "value_loss", "baseline_loss", "entropy"):
            assert np.isfinite(m[k]), (k, m[k])
        assert obs.shape == (2, 20, 24)

    def test_recurrent(self):
        es, obs, m = one_iteration("cyclamen", recurrent=True,
                                   sequence_length=2)
        for k in ("policy_loss", "value_loss", "baseline_loss", "entropy"):
            assert np.isfinite(m[k]), (k, m[k])
        assert obs.shape == (2, 20, 4)

    def test_decision_period_substeps(self):
        es, obs, m = one_iteration("lily", decision_period=2)
        assert np.isfinite(m["policy_loss"])

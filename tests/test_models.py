"""Network tests: shapes, init statistics, math identities, and forward
parity against the reference torch modules with transplanted weights."""

import math
import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swarmacb_tpu.models import (
    Actor,
    DiscreteActor,
    POCACritic,
    RecurrentDiscreteActor,
    ResidualSelfAttention,
)

REF_AGENTS = pathlib.Path(
    "/root/reference/source/SwarmACB_isaac/SwarmACB_isaac/tasks/direct/agents"
)


@pytest.fixture(scope="module")
def ref_networks():
    if not REF_AGENTS.exists():
        pytest.skip("reference repo not mounted")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_poca_networks", REF_AGENTS / "poca_networks.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ── shapes & init stats ────────────────────────────────────────────────

def test_actor_shapes_and_logstd_init():
    actor = Actor(act_dim=2, hidden=64, num_layers=2)
    params = actor.init(jax.random.PRNGKey(0), jnp.zeros((3, 24)))
    mu, std = actor.apply(params, jnp.ones((3, 24)))
    assert mu.shape == (3, 2) and std.shape == (3, 2)
    np.testing.assert_allclose(std, 1.0, atol=1e-6)  # log_std starts at 0


def test_kaiming_init_statistics():
    """Body kernels ~ N(0, 1/fan_in); mu head scaled by 0.2."""
    actor = Actor(act_dim=2, hidden=512, num_layers=2)
    params = actor.init(jax.random.PRNGKey(1), jnp.zeros((1, 24)))["params"]
    w0 = np.asarray(params["net"]["dense_0"]["kernel"])     # (24, 512)
    assert abs(w0.std() - 1 / math.sqrt(24)) < 0.02
    w1 = np.asarray(params["net"]["dense_1"]["kernel"])     # (512, 512)
    assert abs(w1.std() - 1 / math.sqrt(512)) < 0.005
    mu = np.asarray(params["mu_head"]["kernel"])
    assert abs(mu.std() - 0.2 / math.sqrt(512)) < 0.002
    np.testing.assert_allclose(params["net"]["dense_0"]["bias"], 0.0)


def test_entity_embedding_tfixup_gain():
    critic = POCACritic(state_dim=5, act_dim=6, num_agents=20, hidden=256)
    params = critic.init(
        jax.random.PRNGKey(2), jnp.zeros((2, 20, 5)), jnp.zeros((2, 20, 6))
    )["params"]
    w = np.asarray(params["obs_entity_enc"]["encoder"]["dense_0"]["kernel"])
    expected = (0.125 / 256) ** 0.5  # N(0,1) × gain
    assert abs(w.std() - expected) < expected * 0.15


def test_gaussian_logprob_entropy_match_torch():
    import torch

    mu = np.random.default_rng(0).normal(size=(7, 2)).astype(np.float32)
    std = np.exp(np.random.default_rng(1).normal(size=(7, 2)) * 0.3).astype(np.float32)
    a = np.random.default_rng(2).normal(size=(7, 2)).astype(np.float32)
    dist = torch.distributions.Normal(torch.from_numpy(mu), torch.from_numpy(std))
    ref_lp = dist.log_prob(torch.from_numpy(a)).numpy()
    ref_ent = dist.entropy().sum(-1).numpy()
    np.testing.assert_allclose(
        np.asarray(Actor.log_prob(jnp.asarray(mu), jnp.asarray(std), jnp.asarray(a))),
        ref_lp, atol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(Actor.entropy(jnp.asarray(std))), ref_ent, atol=1e-5)


def test_categorical_logprob_entropy_match_torch():
    import torch

    logits = np.random.default_rng(3).normal(size=(9, 6)).astype(np.float32)
    acts = np.random.default_rng(4).integers(0, 6, (9,))
    dist = torch.distributions.Categorical(logits=torch.from_numpy(logits))
    ref_lp = dist.log_prob(torch.from_numpy(acts)).numpy()
    ref_ent = dist.entropy().numpy()
    np.testing.assert_allclose(
        np.asarray(DiscreteActor.log_prob(jnp.asarray(logits), jnp.asarray(acts))),
        ref_lp, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(DiscreteActor.entropy(jnp.asarray(logits))), ref_ent, atol=1e-5
    )


def test_all_baselines_equals_baseline_loop():
    """all_baselines must agree with N separate baseline() calls built the
    reference way (self slot first, others in order)."""
    critic = POCACritic(state_dim=5, act_dim=6, num_agents=8, hidden=32,
                        num_heads=4, num_layers=2)
    key = jax.random.PRNGKey(5)
    states = jax.random.normal(key, (3, 8, 5))
    actions = jax.random.normal(jax.random.PRNGKey(6), (3, 8, 6))
    params = critic.init(jax.random.PRNGKey(7), states, actions)

    all_b = critic.apply(params, states, actions, method=critic.all_baselines)
    for i in range(8):
        others = [j for j in range(8) if j != i]
        b_i = critic.apply(
            params, states[:, i], states[:, others], actions[:, others],
            method=critic.baseline,
        )
        np.testing.assert_allclose(np.asarray(all_b[:, i]), np.asarray(b_i[:, 0]),
                                   atol=2e-5)


def test_mp_stages_gate_bf16_per_projection():
    """mp_stages subsets which RSA projections take bf16 operands
    (POCAConfig.mp_stages, the lily-deficit diagnostic knob): an empty
    subset must be BIT-equal to the f32 critic even with a bf16
    compute_dtype, a partial subset must differ from both f32 and the
    full 'qkvo' form, and the param tree is dtype-independent."""
    import jax.numpy as jnp

    key = jax.random.PRNGKey(5)
    states = jax.random.normal(key, (3, 8, 5))
    actions = jax.random.normal(jax.random.PRNGKey(6), (3, 8, 6))

    def build(dt, stages):
        c = POCACritic(state_dim=5, act_dim=6, num_agents=8, hidden=32,
                       num_heads=4, num_layers=2, compute_dtype=dt,
                       mp_stages=stages)
        p = c.init(jax.random.PRNGKey(7), states, actions)
        return c, p

    outs = {}
    for name, dt, stages in [("f32", None, "qkvo"),
                             ("none", jnp.bfloat16, ""),
                             ("qk", jnp.bfloat16, "qk"),
                             ("full", jnp.bfloat16, "qkvo")]:
        c, p = build(dt, stages)
        v, b = c.apply(p, states, actions)
        outs[name] = (np.asarray(v), np.asarray(b))
        # params identical regardless of compute dtype (param_dtype f32)
        if name == "f32":
            ref_leaves = jax.tree_util.tree_leaves(p)
        else:
            for a, bb in zip(ref_leaves, jax.tree_util.tree_leaves(p)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))

    np.testing.assert_array_equal(outs["f32"][1], outs["none"][1])
    assert np.abs(outs["qk"][1] - outs["f32"][1]).max() > 0
    assert np.abs(outs["qk"][1] - outs["full"][1]).max() > 0
    # every mode stays close to f32 (bf16 operand noise only)
    np.testing.assert_allclose(outs["full"][1], outs["f32"][1],
                               atol=0.05, rtol=0.05)


def test_recurrent_actor_step_vs_sequence():
    actor = RecurrentDiscreteActor(num_actions=6, hidden=16, num_layers=1, memory=16)
    obs_seq = jax.random.normal(jax.random.PRNGKey(8), (4, 5, 4))
    params = actor.init(jax.random.PRNGKey(9), obs_seq[:, 0],
                        (jnp.zeros((4, 16)), jnp.zeros((4, 16))), method=actor.step)
    carry = (jnp.zeros((4, 16)), jnp.zeros((4, 16)))
    seq_logits, _ = actor.apply(params, obs_seq, carry, method=actor.forward_sequence)
    step_logits = []
    c = carry
    for t in range(5):
        lt, c = actor.apply(params, obs_seq[:, t], c, method=actor.step)
        step_logits.append(lt)
    np.testing.assert_allclose(np.asarray(seq_logits),
                               np.asarray(jnp.stack(step_logits, 1)), atol=1e-5)


def test_recurrent_done_masking_resets_memory():
    actor = RecurrentDiscreteActor(num_actions=6, hidden=16, num_layers=1, memory=16)
    obs_seq = jax.random.normal(jax.random.PRNGKey(10), (2, 6, 4))
    carry = (jnp.zeros((2, 16)), jnp.zeros((2, 16)))
    params = actor.init(jax.random.PRNGKey(11), obs_seq[:, 0], carry, method=actor.step)
    dones = jnp.zeros((2, 6)).at[:, 2].set(1.0)
    logits_masked, _ = actor.apply(params, obs_seq, carry, dones,
                                   method=actor.forward_sequence)
    # after the reset at t=2, the t=3 logits must equal a fresh-memory step
    fresh, _ = actor.apply(params, obs_seq[:, 3], carry, method=actor.step)
    np.testing.assert_allclose(np.asarray(logits_masked[:, 3]), np.asarray(fresh),
                               atol=1e-5)


# ── forward parity with transplanted torch weights ─────────────────────

def _t2j(w):
    return jnp.asarray(w.detach().numpy().T)


def _copy_linear_encoder(torch_seq, n_layers):
    """torch nn.Sequential(Linear,Swish,...) → flax LinearEncoder params."""
    out = {}
    for i in range(n_layers):
        lin = torch_seq[2 * i]
        out[f"dense_{i}"] = {"kernel": _t2j(lin.weight),
                             "bias": jnp.asarray(lin.bias.detach().numpy())}
    return out


def test_actor_forward_parity(ref_networks):
    import torch

    torch.manual_seed(0)
    ref = ref_networks.Actor(obs_dim=24, act_dim=2, hidden=64, num_layers=2)
    params = {"params": {
        "net": _copy_linear_encoder(ref.net, 2),
        "mu_head": {"kernel": _t2j(ref.mu_head.weight),
                    "bias": jnp.asarray(ref.mu_head.bias.detach().numpy())},
        "log_std": jnp.asarray(ref.log_std.detach().numpy()),
    }}
    ours = Actor(act_dim=2, hidden=64, num_layers=2)
    x = np.random.default_rng(12).normal(size=(5, 24)).astype(np.float32)
    mu_t, std_t = ref(torch.from_numpy(x))
    mu_j, std_j = ours.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(std_j), std_t.detach().numpy(), atol=1e-5)


def test_rsa_forward_parity(ref_networks):
    import torch

    torch.manual_seed(1)
    ref = ref_networks.ResidualSelfAttention(embed_dim=32, num_heads=4)
    params = {"params": {
        "fc_q": {"kernel": _t2j(ref.fc_q.weight), "bias": jnp.asarray(ref.fc_q.bias.detach().numpy())},
        "fc_k": {"kernel": _t2j(ref.fc_k.weight), "bias": jnp.asarray(ref.fc_k.bias.detach().numpy())},
        "fc_v": {"kernel": _t2j(ref.fc_v.weight), "bias": jnp.asarray(ref.fc_v.bias.detach().numpy())},
        "fc_out": {"kernel": _t2j(ref.fc_out.weight), "bias": jnp.asarray(ref.fc_out.bias.detach().numpy())},
    }}
    ours = ResidualSelfAttention(embed=32, num_heads=4)
    x = np.random.default_rng(13).normal(size=(3, 7, 32)).astype(np.float32)
    out_t = ref(torch.from_numpy(x))
    out_j = ours.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_j), out_t.detach().numpy(), atol=2e-5)


def _copy_critic_params(ref, num_layers=2):
    return {"params": {
        "obs_entity_enc": {"encoder": _copy_linear_encoder(ref.obs_entity_enc.encoder.net, 1)},
        "obs_act_entity_enc": {"encoder": _copy_linear_encoder(ref.obs_act_entity_enc.encoder.net, 1)},
        "self_attn": {
            "fc_q": {"kernel": _t2j(ref.self_attn.fc_q.weight),
                     "bias": jnp.asarray(ref.self_attn.fc_q.bias.detach().numpy())},
            "fc_k": {"kernel": _t2j(ref.self_attn.fc_k.weight),
                     "bias": jnp.asarray(ref.self_attn.fc_k.bias.detach().numpy())},
            "fc_v": {"kernel": _t2j(ref.self_attn.fc_v.weight),
                     "bias": jnp.asarray(ref.self_attn.fc_v.bias.detach().numpy())},
            "fc_out": {"kernel": _t2j(ref.self_attn.fc_out.weight),
                       "bias": jnp.asarray(ref.self_attn.fc_out.bias.detach().numpy())},
        },
        "linear_encoder": _copy_linear_encoder(ref.linear_encoder.net, num_layers),
        "value_head": {"kernel": _t2j(ref.value_head.weight),
                       "bias": jnp.asarray(ref.value_head.bias.detach().numpy())},
    }}


def test_critic_forward_parity(ref_networks):
    """critic_pass AND all_baselines must match the reference torch critic
    with transplanted weights — validates the diagonal-swap construction."""
    import torch

    torch.manual_seed(2)
    N = 6
    ref = ref_networks.POCACritic(state_dim=5, act_dim=6, num_agents=N,
                                  h_size=32, num_heads=4, num_layers=2)
    ref._current_max_agents.data.fill_(float(N))  # as after first call
    params = _copy_critic_params(ref)
    ours = POCACritic(state_dim=5, act_dim=6, num_agents=N, hidden=32,
                      num_heads=4, num_layers=2)

    rng = np.random.default_rng(14)
    states = rng.normal(size=(4, N, 5)).astype(np.float32)
    actions = rng.normal(size=(4, N, 6)).astype(np.float32)

    v_t = ref.critic_pass(torch.from_numpy(states)).detach().numpy()
    v_j = ours.apply(params, jnp.asarray(states), method=ours.critic_pass)
    np.testing.assert_allclose(np.asarray(v_j), v_t, atol=2e-5)

    b_t = ref.all_baselines(torch.from_numpy(states),
                            torch.from_numpy(actions)).detach().numpy()
    b_j = ours.apply(params, jnp.asarray(states), jnp.asarray(actions),
                     method=ours.all_baselines)
    np.testing.assert_allclose(np.asarray(b_j), b_t, atol=2e-5)


def test_recurrent_actor_parity(ref_networks):
    import torch

    torch.manual_seed(3)
    ref = ref_networks.RecurrentDiscreteActor(
        obs_dim=4, num_actions=6, hidden=16, num_layers=1, memory_size=16
    )
    w_ih = _t2j(ref.lstm.weight_ih_l0)
    w_hh = _t2j(ref.lstm.weight_hh_l0)
    bias = jnp.asarray(
        (ref.lstm.bias_ih_l0 + ref.lstm.bias_hh_l0).detach().numpy()
    )
    params = {"params": {
        "net": _copy_linear_encoder(ref.net.net, 1),
        "lstm": {"w_ih": w_ih, "w_hh": w_hh, "bias": bias},
        "logits_head": {"kernel": _t2j(ref.logits_head.weight),
                        "bias": jnp.asarray(ref.logits_head.bias.detach().numpy())},
    }}
    ours = RecurrentDiscreteActor(num_actions=6, hidden=16, num_layers=1, memory=16)

    obs_seq = np.random.default_rng(15).normal(size=(3, 10, 4)).astype(np.float32)
    logits_t, _ = ref.forward_sequence(torch.from_numpy(obs_seq))
    carry = (jnp.zeros((3, 16)), jnp.zeros((3, 16)))
    logits_j, _ = ours.apply(params, jnp.asarray(obs_seq), carry,
                             method=ours.forward_sequence)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t.detach().numpy(),
                               atol=2e-5)

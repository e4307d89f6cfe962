"""Behaviour-module unit + reference-parity tests."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swarmacb_tpu.env import behaviors
from swarmacb_tpu.env.behaviors import BehaviorState

MS = 0.12
ALPHA = 5.0


def _zeros(E=2, N=4):
    return jnp.zeros((E, N))


def _dispatch(module_ids, state, prox_v=None, prox_a=None, light_v=None,
              light_a=None, rab_x=None, rab_y=None, durations=1, key=None):
    E, N = module_ids.shape
    z = jnp.zeros((E, N))
    dur = jnp.full((E, N), durations, dtype=jnp.int32)
    return behaviors.dispatch(
        module_ids, state,
        z if prox_v is None else prox_v,
        z if prox_a is None else prox_a,
        z if light_v is None else light_v,
        z if light_a is None else light_a,
        z if rab_x is None else rab_x,
        z if rab_y is None else rab_y,
        key, MS, ALPHA,
        injected_durations={"explore": dur, "photo": dur, "antiphoto": dur},
    )


# ── compute_wheels_from_vector ─────────────────────────────────────────

def test_wheels_forward():
    l, r = behaviors.compute_wheels_from_vector(jnp.ones((1, 1)), jnp.zeros((1, 1)), MS)
    np.testing.assert_allclose(l, MS, atol=1e-7)
    np.testing.assert_allclose(r, MS, atol=1e-7)


def test_wheels_zero_vector():
    l, r = behaviors.compute_wheels_from_vector(jnp.zeros((1, 1)), jnp.zeros((1, 1)), MS)
    np.testing.assert_allclose(l, 0.0, atol=1e-9)
    np.testing.assert_allclose(r, 0.0, atol=1e-9)


def test_wheels_left_turn():
    # 90° left (body +y): angle=π/2 ∈ [0,π) → right=1, left=cos(π/2)=0
    l, r = behaviors.compute_wheels_from_vector(jnp.zeros((1, 1)) + 1e-4,
                                                jnp.ones((1, 1)), MS)
    assert float(r[0, 0]) == pytest.approx(MS, abs=1e-6)
    assert abs(float(l[0, 0])) < 0.001


def test_wheels_right_turn():
    # −90° (body −y): angle=3π/2 → right=cos=0, left=1
    l, r = behaviors.compute_wheels_from_vector(jnp.zeros((1, 1)) + 1e-4,
                                                -jnp.ones((1, 1)), MS)
    assert float(l[0, 0]) == pytest.approx(MS, abs=1e-6)
    assert abs(float(r[0, 0])) < 0.001


def test_wheels_parity(reference_modules):
    import torch

    _, ref_mod = reference_modules
    rng = np.random.default_rng(7)
    dx = rng.uniform(-2, 2, (5, 20)).astype(np.float32)
    dy = rng.uniform(-2, 2, (5, 20)).astype(np.float32)
    rl, rr = ref_mod.compute_wheels_from_vector(
        torch.from_numpy(dx), torch.from_numpy(dy), MS
    )
    ol, orr = behaviors.compute_wheels_from_vector(jnp.asarray(dx), jnp.asarray(dy), MS)
    np.testing.assert_allclose(np.asarray(ol), rl.numpy(), atol=2e-6)
    np.testing.assert_allclose(np.asarray(orr), rr.numpy(), atol=2e-6)


# ── modules ────────────────────────────────────────────────────────────

def test_stop_module():
    st = BehaviorState.init(1, 2)
    ids = jnp.ones((1, 2), dtype=jnp.int32)  # STOP
    l, r, _ = _dispatch(ids, st)
    np.testing.assert_allclose(l, 0.0, atol=1e-9)
    np.testing.assert_allclose(r, 0.0, atol=1e-9)


def test_exploration_walk_and_avoid_cycle():
    """No obstacle → forward; obstacle → latched in-place turn for dur−1 steps."""
    st = BehaviorState.init(1, 1)
    ids = jnp.zeros((1, 1), dtype=jnp.int32)

    # free space: straight at max speed
    l, r, st = _dispatch(ids, st)
    np.testing.assert_allclose(l, MS, atol=1e-7)
    np.testing.assert_allclose(r, MS, atol=1e-7)
    assert int(st.explore_state[0, 0]) == 0

    # obstacle in front, angle>0 → turn RIGHT (dir=+1): L=+ms, R=−ms.
    # duration 3 → the trigger step burns one count; turns this step + next,
    # then back to walking (exploration decrements before the wheel select,
    # behavior_modules.py:288-327).
    prox_v = jnp.full((1, 1), 0.5)
    prox_a = jnp.full((1, 1), 0.3)
    l, r, st = _dispatch(ids, st, prox_v=prox_v, prox_a=prox_a, durations=3)
    np.testing.assert_allclose(l, MS, atol=1e-7)
    np.testing.assert_allclose(r, -MS, atol=1e-7)
    assert int(st.explore_state[0, 0]) == 1
    assert int(st.explore_steps[0, 0]) == 2

    # keep turning (obstacle gone doesn't matter while avoiding)
    l, r, st = _dispatch(ids, st)
    np.testing.assert_allclose(l, MS, atol=1e-7)
    assert int(st.explore_steps[0, 0]) == 1

    # counter expires → walking again
    l, r, st = _dispatch(ids, st)
    np.testing.assert_allclose(l, MS, atol=1e-7)
    np.testing.assert_allclose(r, MS, atol=1e-7)
    assert int(st.explore_state[0, 0]) == 0


def test_exploration_duration_one_means_no_turn():
    """dur=1 → counter hits 0 the same step → wheels stay forward
    (replicates the reference's decrement-after-trigger order)."""
    st = BehaviorState.init(1, 1)
    ids = jnp.zeros((1, 1), dtype=jnp.int32)
    prox_v = jnp.full((1, 1), 0.5)
    prox_a = jnp.full((1, 1), -0.2)
    l, r, st = _dispatch(ids, st, prox_v=prox_v, prox_a=prox_a, durations=1)
    np.testing.assert_allclose(l, MS, atol=1e-7)
    np.testing.assert_allclose(r, MS, atol=1e-7)
    assert int(st.explore_state[0, 0]) == 0
    # direction was still latched LEFT (angle<0 → −1)
    assert float(st.explore_dir[0, 0]) == -1.0


def test_phototaxis_steering_and_avoidance():
    st = BehaviorState.init(1, 1)
    ids = jnp.full((1, 1), 2, dtype=jnp.int32)

    # light dead ahead → straight
    lv, rv, st = _dispatch(ids, st, light_v=jnp.full((1, 1), 0.8))
    np.testing.assert_allclose(lv, MS, atol=1e-6)
    np.testing.assert_allclose(rv, MS, atol=1e-6)

    # obstacle → avoidance turns for the FULL duration (decrement-first
    # order, behavior_modules.py:356-380): dur=2 → 2 turning steps
    prox_v = jnp.full((1, 1), 0.5)
    prox_a = jnp.full((1, 1), -0.4)  # LEFT: dir −1 → L=−ms, R=+ms
    lv, rv, st = _dispatch(ids, st, prox_v=prox_v, prox_a=prox_a,
                           light_v=jnp.full((1, 1), 0.8), durations=2)
    np.testing.assert_allclose(lv, -MS, atol=1e-7)
    np.testing.assert_allclose(rv, MS, atol=1e-7)
    assert bool(st.photo_avoiding[0, 0])

    lv, rv, st = _dispatch(ids, st, light_v=jnp.full((1, 1), 0.8))
    np.testing.assert_allclose(lv, -MS, atol=1e-7)
    assert bool(st.photo_avoiding[0, 0])  # steps hit 0 but flag clears next step

    lv, rv, st = _dispatch(ids, st, light_v=jnp.full((1, 1), 0.8))
    np.testing.assert_allclose(lv, MS, atol=1e-6)  # steering again
    assert not bool(st.photo_avoiding[0, 0])


def test_anti_phototaxis_reverses_light():
    st = BehaviorState.init(1, 1)
    ids = jnp.full((1, 1), 3, dtype=jnp.int32)
    # light ahead → anti drives away: vec=(−0.8, 0) → angle π → left=1, right=cos(π)=−1
    lv, rv, st = _dispatch(ids, st, light_v=jnp.full((1, 1), 0.8))
    np.testing.assert_allclose(lv, MS, atol=1e-6)
    np.testing.assert_allclose(rv, -MS, atol=1e-6)


def test_attraction_and_repulsion():
    st = BehaviorState.init(1, 2)
    ids = jnp.array([[4, 5]], dtype=jnp.int32)
    rab_x = jnp.full((1, 2), 2.0)
    rab_y = jnp.zeros((1, 2))
    lv, rv, st = _dispatch(ids, st, rab_x=rab_x, rab_y=rab_y)
    # attraction (agent 0): vec=(2,0) → forward
    np.testing.assert_allclose(lv[0, 0], MS, atol=1e-6)
    np.testing.assert_allclose(rv[0, 0], MS, atol=1e-6)
    # repulsion (agent 1): vec=(−10,0) → angle π → L=1, R=−1
    np.testing.assert_allclose(lv[0, 1], MS, atol=1e-6)
    np.testing.assert_allclose(rv[0, 1], -MS, atol=1e-6)


def test_forward_fallback_small_vector():
    st = BehaviorState.init(1, 1)
    ids = jnp.full((1, 1), 4, dtype=jnp.int32)
    lv, rv, _ = _dispatch(ids, st, rab_x=jnp.full((1, 1), 0.05))
    np.testing.assert_allclose(lv, MS, atol=1e-6)  # |v|<0.1 → forward
    np.testing.assert_allclose(rv, MS, atol=1e-6)


def test_inactive_module_state_frozen():
    """Robots not running a module must not advance its state machine."""
    st = BehaviorState.init(1, 2)
    st = st.replace(
        explore_state=jnp.array([[1, 1]], dtype=jnp.int32),
        explore_steps=jnp.array([[3, 3]], dtype=jnp.int32),
        explore_dir=jnp.ones((1, 2)),
    )
    ids = jnp.array([[0, 1]], dtype=jnp.int32)  # agent 1 runs STOP
    _, _, st2 = _dispatch(ids, st)
    assert int(st2.explore_steps[0, 0]) == 2   # active: decremented
    assert int(st2.explore_steps[0, 1]) == 3   # inactive: frozen


def test_reset_where():
    st = BehaviorState.init(2, 2)
    st = st.replace(photo_avoiding=jnp.ones((2, 2), dtype=bool),
                    explore_steps=jnp.full((2, 2), 5, dtype=jnp.int32))
    st2 = st.reset_where(jnp.array([True, False]))
    assert not bool(st2.photo_avoiding[0, 0])
    assert bool(st2.photo_avoiding[1, 0])
    assert int(st2.explore_steps[0, 0]) == 0
    assert int(st2.explore_steps[1, 1]) == 5


# ── dispatch parity vs reference state machines ───────────────────────

def test_dispatch_parity_random_walk(reference_modules):
    """Drive both implementations for 60 steps with identical module ids,
    sensor aggregates, and injected turn durations; wheels and state
    machines must match exactly."""
    import torch

    _, ref_mod = reference_modules
    E, N = 3, 8
    rng = np.random.default_rng(11)

    ref = ref_mod.BehaviorModules(max_speed=MS, alpha_parameter=ALPHA, device="cpu")
    ref.init_state(E, N)
    st = BehaviorState.init(E, N)

    for step in range(60):
        ids = rng.integers(0, 6, (E, N))
        prox_v = rng.uniform(0, 1, (E, N)).astype(np.float32)
        prox_a = rng.uniform(-np.pi, np.pi, (E, N)).astype(np.float32)
        light_v = rng.uniform(0, 1, (E, N)).astype(np.float32)
        light_a = rng.uniform(-np.pi, np.pi, (E, N)).astype(np.float32)
        rab_x = rng.uniform(-3, 3, (E, N)).astype(np.float32)
        rab_y = rng.uniform(-3, 3, (E, N)).astype(np.float32)
        dur = rng.integers(1, 5, (E, N))

        # Reference draws ONE randint tensor per machine per step (only when
        # triggered); monkeypatch torch.randint to return our injected values.
        orig_randint = torch.randint
        torch.randint = lambda lo, hi, size, **kw: torch.from_numpy(dur).long()
        try:
            rl, rr = ref.dispatch(
                torch.from_numpy(ids).long(),
                torch.from_numpy(prox_v), torch.from_numpy(prox_a),
                torch.from_numpy(light_v), torch.from_numpy(light_a),
                torch.from_numpy(rab_x), torch.from_numpy(rab_y),
            )
        finally:
            torch.randint = orig_randint

        d = jnp.asarray(dur.astype(np.int32))
        ol, orr, st = behaviors.dispatch(
            jnp.asarray(ids.astype(np.int32)), st,
            jnp.asarray(prox_v), jnp.asarray(prox_a),
            jnp.asarray(light_v), jnp.asarray(light_a),
            jnp.asarray(rab_x), jnp.asarray(rab_y),
            None, MS, ALPHA,
            injected_durations={"explore": d, "photo": d, "antiphoto": d},
        )
        np.testing.assert_allclose(np.asarray(ol), rl.numpy(), atol=2e-6,
                                   err_msg=f"left wheels diverged at step {step}")
        np.testing.assert_allclose(np.asarray(orr), rr.numpy(), atol=2e-6,
                                   err_msg=f"right wheels diverged at step {step}")
        np.testing.assert_array_equal(
            np.asarray(st.explore_state), ref._explore_state.numpy(),
            err_msg=f"explore state diverged at step {step}")
        np.testing.assert_array_equal(
            np.asarray(st.photo_avoiding), ref._photo_avoiding.numpy())
        np.testing.assert_array_equal(
            np.asarray(st.antiphoto_avoiding), ref._antiphoto_avoiding.numpy())

"""POCA trainer hyper-parameters — loadable from ML-Agents-style YAML.

Field names and defaults match the reference ``POCAConfig``
(poca_trainer.py:43-105) so the YAML loader and CLI map one-to-one.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class POCAConfig:
    # Rollout
    horizon: int = 1000               # time_horizon
    num_epochs: int = 3               # num_epoch
    mini_batch_size: int = 2048       # batch_size

    # PPO / POCA
    clip_eps: float = 0.2             # epsilon
    beta: float = 0.005               # entropy coefficient

    # λ-return
    gamma: float = 0.99
    lam: float = 0.95                 # lambd

    # Optimiser
    lr: float = 3e-4
    adam_eps: float = 1e-8

    # Schedules: "linear" or "constant"
    lr_schedule: str = "constant"
    eps_schedule: str = "constant"
    beta_schedule: str = "constant"

    # Run control (agent-decisions)
    total_timesteps: int = 120_000_000
    checkpoint_interval: int = 120_000
    summary_freq: int = 120_000
    keep_checkpoints: int = 5
    checkpoint_dir: str = "checkpoints/poca"

    decision_period: int = 1
    reward_strength: float = 1.0

    # Network
    hidden_dim: int = 512
    num_layers: int = 2
    critic_num_heads: int = 4
    recurrent: bool = False
    memory_size: int = 128
    sequence_length: int = 64

    # TensorBoard
    log_dir: str = "runs/poca"

    # buffer_size hint from YAML (drives batches-per-epoch derivation,
    # poca_trainer.py:663-674)
    buffer_size_hint: int = 0

    # Memory ceiling for one gradient computation, in GROUPS (arena
    # timesteps). The ML-Agents minibatch derivation makes the minibatch
    # size scale with the arena count (group_mb = T·E / batches-per-epoch),
    # which at TPU-native E blows up the critic's (B·N, N, h) attention.
    # Minibatches above this cap are processed as equal-size chunks whose
    # gradients are averaged — mathematically identical to the full-batch
    # gradient (all losses are per-element means; equal chunks → mean of
    # chunk-means == global mean), just bounded activation memory.
    # Sized so the critic's counterfactual pass — which materializes
    # several (chunk·N, N, hidden) tensors for the backward — stays under
    # a v5e chip's 16 GB at hidden=512, N=20. 0 disables chunking.
    accum_chunk_groups: int = 1024

    # When the buffer (T·E groups) exceeds this, the PPO update runs as
    # one device program PER MINIBATCH (host-driven loop) instead of one
    # fused program for all epochs. Identical math and update order — the
    # split only bounds single-program execution time, which matters both
    # for tunnelled/remote device runtimes that cap per-program wall time
    # and for checkpoint/interrupt latency. ~30 extra dispatches per
    # update (< 1 s) against multi-minute fused programs at large E.
    # 0 = always fused. Covers all four trainer shapes: feedforward AND
    # recurrent (BPTT window batches), single-device AND data-parallel
    # mesh (shard_map'd minibatch programs, grads pmean'd — bit-compatible
    # with the fused mesh program; tests/test_trainer.py,
    # tests/test_distributed.py).
    split_update_groups: int = 16384

    # Split the rollout scan into this many sequential device programs
    # (horizon must divide evenly). 1 = whole horizon in one program.
    # Only consulted on the split-update path: it bounds ROLLOUT program
    # wall time the way split_update_groups bounds update program time
    # (relevant from E ≳ 2048 on tunnelled runtimes with a per-program
    # execution ceiling). Key threading is carried across segments, so
    # trajectories are bit-identical to the unsegmented scan.
    rollout_segments: int = 1

    # Fused Pallas tail kernel for the critic's counterfactual pass
    # (ops/baseline_tail.py): exact f32 math, no tile-sized HBM tensors in
    # fwd or bwd. Hardware-validated (2.55x op fwd+bwd, gradients equal or
    # closer to a CPU f32 ground truth than TPU-XLA's, full-budget lily
    # curve above the f32 seed band — VALIDATION.md). None = auto: ON when
    # the backend is a real TPU, off elsewhere (interpret-mode fallback
    # exists but is slow); True/False forces.
    fused_tail: "bool | None" = None

    # Fully-fused counterfactual attention (ops/cf_attention.py): scores →
    # softmax → value contraction → fc/LN/pool in one Pallas kernel — no
    # (B, I, H, n, m) score/attention tensor is ever materialized, fwd or
    # bwd. Supersedes fused_tail when on. CPU-parity-tested
    # (tests/test_cf_attention.py) and hardware-validated
    # (scripts/tpu_validate_cf_attention.py, v5e, B=1600): forward it is
    # 1.7× faster than the production path (12.7 vs 21.6 ms), but its
    # flash-style backward recompute does not pay at N=20 — fwd+bwd it
    # LOSES to the assembled-scores + fused-tail path (46.2 vs 39.0 ms)
    # and one cotangent (wa) lands marginally outside the no-worse-than-
    # XLA band. Kept as an off-by-default lane (BENCH_NOTES.md §round-2
    # full fusion). None = auto (off everywhere); True/False forces.
    fused_attention: "bool | None" = None

    # Fused env step in the TRAINING rollout: the rollout scan carries
    # the arena-on-lanes state (env/lanes.py) and each step is ONE
    # Pallas program (ops/fused_step.py) plus the actor/critic matmuls,
    # instead of the composed step's ~10 small XLA fusions + per-phase
    # kernels. Same step semantics (stale-sensor contract, folded
    # auto-reset, decision_period sub-stepping) under the kernel's
    # documented numerics mode; RNG draw shapes are (N, Ep) lanes, so
    # trajectories are a distributionally-identical different sample.
    # None = auto (OFF — the measured rejection at the E=16 operating
    # point: train SPS 160.7k lanes vs 159.5k composed (noise; the
    # bandwidth-bound update dominates the iteration) while
    # compile+first is 251 s lanes vs 58 s composed — the Mosaic kernel
    # compile costs more than the composed rollout's XLA fusions at
    # small E. The fused step's wins are at bench scale: 1.23x and a
    # 4x compile cut at E=32768 where the 500-step composed scan is the
    # compile monster. BENCH_NOTES.md round-5 "the rollout under the
    # trainer"); True/False forces.
    fused_env_step: "bool | None" = None

    # Mixed precision: bf16 MATMUL OPERANDS in the critic — the RSA
    # Q/K/V/out projections and the counterfactual pass's big attn×values
    # contraction take bf16 inputs with f32 MXU accumulation; fc, the
    # rank-1/residual chain, LayerNorm stats, softmax, losses, log-probs,
    # params and the optimizer stay f32. (Round 2's wider bf16-tile form
    # — residual adds rounded to bf16 — measured a small full-budget
    # reward deficit and was narrowed to this; VALIDATION.md overlays.)
    # ~1.3× faster updates on v5e. Off by default.
    mixed_precision: bool = False
    # Which RSA projections take bf16 operands under mixed_precision —
    # a subset of "qkvo" (q/k = the attention-scores path, v/o = the
    # values/output path; "v" also gates the attn×values contraction on
    # the non-fused tail). Diagnostic knob for attributing the small
    # full-budget reward deficit mixed precision shows on ONE variant
    # (lily, VALIDATION.md overlays) to a specific precision path.
    mp_stages: str = "qkvo"

    # RNG
    seed: int = 0

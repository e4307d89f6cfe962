#!/usr/bin/env python3
"""Per-update communication account for multi-host data-parallel scaling
(VERDICT r2 #5 — the achievable substitute for a real multi-chip run on
this one-chip host).

The data-parallel learner's ONLY cross-device traffic per update is:
  - one gradient pmean per SGD step (3 epochs x bpe minibatches, plus
    gradient-accumulation chunking changes nothing: chunks are summed
    LOCALLY and pmean'd once per minibatch — trainer._sgd_step),
  - one 4-scalar metrics pmean per SGD step,
  - two scalar pmeans for the advantage moments + two for stats
    (trainer._normalize_advantages / _prep_update_fn).
Rollout, env state, and minibatch indexing are fully shard-local: there
is NO parameter/activation traffic outside the psums above.

For each variant this script builds the real trainer on CPU, counts
params exactly, and prints bytes-on-the-wire per update per chip for a
ring all-reduce (2.(p-1)/p . bytes), the predicted comm time against
public per-chip interconnect bandwidths, and the comm fraction of the
measured per-update compute time — i.e. the predicted scaling knee.

Bandwidth anchors (public Google Cloud TPU system specs):
  v5e  ICI 1,600 Gbps/chip = 200 GB/s;  v5p ICI 4,800 Gbps/chip = 600 GB/s
  DCN (inter-slice, per host) ~ 200 Gbps = 25 GB/s
A conservative 10% achievable efficiency is applied to all three.

Usage: JAX_PLATFORMS=cpu python scripts/comm_account.py [--update_s SECONDS]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

BW = {  # (label, achievable GB/s at 10% of the public per-chip spec)
    "v5e ICI": 200.0 * 0.10,
    "v5p ICI": 600.0 * 0.10,
    "DCN": 25.0 * 0.10,
}


def account(variant: str, E: int, update_s: float | None):
    import jax

    from swarmacb_tpu.agents import POCATrainer
    from swarmacb_tpu.config.loader import load_config
    from swarmacb_tpu.env import make_env

    cfg_path = pathlib.Path(__file__).resolve().parents[1] / "configs" / \
        f"DirGate_{variant}.yaml"
    _, variant, cfg, _ = load_config(str(cfg_path))
    env = make_env("SwarmACB-DirectionalGate-v0", variant=variant,
                   num_envs=E, use_pallas=False)
    trainer = POCATrainer(env, cfg)

    n_params = sum(x.size for x in
                   jax.tree_util.tree_leaves(trainer.train_state.params))
    grad_bytes = n_params * 4  # f32 grads

    # SGD steps per update: 3 epochs x batches-per-epoch (ML-Agents
    # derivation: bpe = buffer_size_hint // batch_size — E-independent)
    T_E = cfg.horizon * E
    mb = min(trainer.group_mb, T_E)
    bpe = -(-T_E // mb)
    sgd_steps = cfg.num_epochs * bpe

    out = {
        "variant": variant,
        "params": n_params,
        "grad_MB": round(grad_bytes / 2**20, 2),
        "sgd_steps_per_update": sgd_steps,
    }
    for p in (2, 4, 8):
        ring = 2 * (p - 1) / p * grad_bytes  # bytes on the wire per chip
        per_update = ring * sgd_steps + 2 * (p - 1) / p * 4 * 8 * sgd_steps
        entry = {"wire_MB_per_update": round(per_update / 2**20, 1)}
        for label, gbs in BW.items():
            t = per_update / (gbs * 2**30)
            entry[f"comm_s_{label}"] = round(t, 4)
            if update_s:
                entry[f"comm_frac_{label}"] = round(t / update_s, 4)
        out[f"hosts_{p}"] = entry
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="dandelion,tulip,cyclamen")
    ap.add_argument("--num_envs", type=int, default=16)
    ap.add_argument("--update_s", type=float, default=None,
                    help="Measured per-update wall time (one chip) to "
                         "express comm as a fraction of compute")
    args = ap.parse_args()
    for v in args.variants.split(","):
        print(json.dumps(account(v, args.num_envs, args.update_s)),
              flush=True)


if __name__ == "__main__":
    main()

"""swarmacb_tpu — TPU-native swarm-RL framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ilgha/SwarmACB-isaaclab: the Directional Gate swarm mission (20 kinematic
e-puck robots per arena, full sensor suite, 6 behaviour modules) trained
with MA-POCA, vmapped over thousands of arenas under ``jit`` and sharded
over TPU device meshes with ``jax.sharding``.

Package layout
──────────────
  config/    env + trainer configs, ML-Agents-schema YAML loader
  env/       pure-functional batched environment (geometry, physics,
             sensors, behaviour modules, DGT mission)
  models/    flax networks: actors (gaussian / categorical / LSTM),
             attention-based POCA critic
  agents/    rollout buffer, λ-returns, POCA losses, on-device trainer
  ops/       Pallas TPU kernels for the hot N² pairwise ops
  parallel/  device-mesh / sharding helpers for multi-host training
  utils/     logging (TensorBoard with ML-Agents tag names), misc
"""

__version__ = "0.1.0"

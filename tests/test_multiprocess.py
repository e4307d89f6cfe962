"""True multi-PROCESS distributed training test (SURVEY §4 item f).

`test_distributed.py` covers multi-device sharding inside one process;
this test validates the multi-HOST code path — `jax.distributed.initialize`
with a coordinator, a mesh spanning devices owned by different processes,
and the shard_map'd update with cross-process gradient all-reduce — by
launching two real Python processes on CPU (4 virtual devices each → one
8-device global mesh), exactly how `scripts/tpu/launch_pod.sh` runs one
process per TPU host.

Each process trains 2 iterations on its arena shard and prints final
param/loss digests; the test asserts both processes converge to IDENTICAL
params (the all-reduced update must keep replicas in lockstep).
"""

import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]

WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["SWARMACB_ROOT"])
import jax

jax.config.update("jax_platforms", "cpu")
NUM_PROCS = int(os.environ["NUM_PROCS"])
jax.distributed.initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=NUM_PROCS,
    process_id=int(os.environ["PROC_ID"]),
)

import jax.numpy as jnp
import numpy as np
from swarmacb_tpu.agents import POCAConfig, POCATrainer
from swarmacb_tpu.config.env_cfg import DirectionalGateEnvCfg
from swarmacb_tpu.env.directional_gate import DirectionalGateEnv
from swarmacb_tpu.parallel import make_mesh

assert jax.process_count() == NUM_PROCS, jax.process_count()
assert len(jax.devices()) == 8, jax.devices()

env = DirectionalGateEnv(DirectionalGateEnvCfg(
    variant="tulip", num_envs=8, num_agents=4))
cfg = POCAConfig(horizon=4, num_epochs=2, mini_batch_size=8, hidden_dim=16,
                 num_layers=1, total_timesteps=10**9, seed=0)
mesh = make_mesh()  # all 8 global devices
trainer = POCATrainer(env, cfg, mesh=mesh)

key = jax.random.PRNGKey(0)
env_state, obs = env.reset(key)
env_state, obs, carry = trainer.place_on_mesh(env_state, obs, ())
for _ in range(2):
    env_state, obs, carry, metrics = trainer.train_iteration(env_state, obs, carry)

# multi-host orbax checkpointing (all processes participate; shared FS)
from swarmacb_tpu.agents import Checkpointer
ckpt = Checkpointer(os.environ["CKPT_DIR"], keep=2)
ckpt.save(trainer, final=True)
step_before = trainer.global_step
trainer.global_step = 0
ckpt.restore(os.path.join(os.environ["CKPT_DIR"], "poca_final"), trainer)
assert trainer.global_step == step_before, (trainer.global_step, step_before)

# digest of (replicated) params — must match across processes
leaves = jax.tree_util.tree_leaves(trainer.train_state.params)
digest = float(sum(np.abs(np.asarray(jax.device_get(l))).sum() for l in leaves))
print(f"DIGEST {digest:.10f} LOSS {metrics['policy_loss']:.10f}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
@pytest.mark.parametrize("num_procs", [2, 4])
def test_multi_process_training_lockstep(tmp_path, num_procs):
    """2 procs × 4 devices and 4 procs × 2 devices — the same 8-device
    global mesh built from different host counts (VERDICT r2 #5: the
    lockstep property must hold past pairwise all-reduce topologies)."""
    coord = f"localhost:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)

    devices_per_proc = 8 // num_procs
    procs = []
    for pid in range(num_procs):
        env = dict(os.environ)
        env.update(
            COORD=coord,
            PROC_ID=str(pid),
            NUM_PROCS=str(num_procs),
            SWARMACB_ROOT=str(ROOT),
            CKPT_DIR=str(tmp_path / "ckpt"),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=(env.get("XLA_FLAGS", "")
                       + " --xla_force_host_platform_device_count="
                       + str(devices_per_proc)).strip(),
        )
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))

    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)

    digests = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("DIGEST")][0]
        parts = line.split()
        digests.append((float(parts[1]), float(parts[3])))

    # replicated params + all-reduced grads ⇒ all processes bit-identical
    for d in digests[1:]:
        np.testing.assert_allclose(digests[0][0], d[0], rtol=0, atol=0)
        np.testing.assert_allclose(digests[0][1], d[1], rtol=0, atol=0)

"""POCA networks in flax — ML-Agents architecture, TPU-first layout.

Faithful re-implementations (architecture, activation, init math) of the
reference's torch modules (poca_networks.py), with the one structural
change that matters on TPU: ``POCACritic.all_baselines`` builds its N
counterfactual entity sets with a diagonal *swap* (one ``where`` against an
eye mask) instead of the reference's boolean-mask reshape gather
(poca_networks.py:619-625) — identical entity sets, no dynamic gather, and
the resulting (B·N, N, h) attention batch maps straight onto the MXU.

Components:
  LinearEncoder            poca_networks.py:89-119   (Dense+Swish stack)
  EntityEmbedding          poca_networks.py:129-146  (1-layer, T-Fixup init)
  Actor (Gaussian)         poca_networks.py:153-209
  DiscreteActor            poca_networks.py:216-269
  RecurrentDiscreteActor   poca_networks.py:276-378  (custom LSTM cell with
                           torch gate order/init)
  ResidualSelfAttention    poca_networks.py:381-454
  POCACritic               poca_networks.py:469-635
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import init as inits

Swish = nn.silu  # ML-Agents uses Swish/SiLU, not ELU (poca_networks.py:47-51)

_LOG_2PI = math.log(2.0 * math.pi)


def _dense(features: int, kernel_init, name=None, dtype=None):
    """``dtype``: computation dtype (params stay f32 via param_dtype)."""
    return nn.Dense(features, kernel_init=kernel_init,
                    bias_init=nn.initializers.zeros, name=name, dtype=dtype)


class LinearEncoder(nn.Module):
    """(Dense → Swish) × num_layers. Matches poca_networks.py:89-119."""

    num_layers: int
    hidden: int
    kernel_init_name: str = "kaiming_normal"
    kernel_gain: float = 1.0

    def _init(self):
        if self.kernel_init_name == "kaiming_normal":
            return inits.kaiming_normal(self.kernel_gain)
        if self.kernel_init_name == "normal":
            return inits.normal_gain(self.kernel_gain)
        if self.kernel_init_name == "xavier_uniform":
            return inits.xavier_uniform(self.kernel_gain)
        raise ValueError(self.kernel_init_name)

    @nn.compact
    def __call__(self, x):
        k = self._init()
        for i in range(self.num_layers):
            x = Swish(_dense(self.hidden, k, name=f"dense_{i}")(x))
        return x


class EntityEmbedding(nn.Module):
    """1-layer LinearEncoder with T-Fixup Normal init
    (poca_networks.py:129-146): gain = (0.125 / embed)^0.5."""

    embed: int

    @nn.compact
    def __call__(self, entities):
        gain = (0.125 / self.embed) ** 0.5
        return LinearEncoder(1, self.embed, "normal", gain, name="encoder")(entities)


# ──────────────────────────────────────────────────────────────────────
#  Actors
# ──────────────────────────────────────────────────────────────────────

class Actor(nn.Module):
    """Gaussian actor: Swish MLP body, raw-linear mean (no tanh squash),
    state-independent log_std. Matches poca_networks.py:153-209."""

    act_dim: int
    hidden: int = 256
    num_layers: int = 2

    @nn.compact
    def __call__(self, obs):
        h = LinearEncoder(self.num_layers, self.hidden, name="net")(obs)
        mu = _dense(self.act_dim, inits.kaiming_normal(0.2), name="mu_head")(h)
        log_std = self.param("log_std", nn.initializers.zeros, (1, self.act_dim))
        std = jnp.exp(jnp.broadcast_to(log_std, mu.shape))
        return mu, std

    @staticmethod
    def log_prob(mu, std, actions):
        """Per-dimension Gaussian log-prob (NOT summed) — ML-Agents computes
        the PPO ratio per action dimension (poca_networks.py:196-209)."""
        var = std**2
        return -((actions - mu) ** 2) / (2 * var) - jnp.log(std) - 0.5 * _LOG_2PI

    @staticmethod
    def entropy(std):
        """Summed-over-dims Gaussian entropy (poca_networks.py:202-208)."""
        return (0.5 + 0.5 * _LOG_2PI + jnp.log(std)).sum(-1)

    @staticmethod
    def sample(key, mu, std):
        return mu + std * jax.random.normal(key, mu.shape)


class DiscreteActor(nn.Module):
    """Single-branch categorical actor. Matches poca_networks.py:216-269."""

    num_actions: int
    hidden: int = 256
    num_layers: int = 2

    @nn.compact
    def __call__(self, obs):
        h = LinearEncoder(self.num_layers, self.hidden, name="net")(obs)
        return _dense(self.num_actions, inits.kaiming_normal(0.2), name="logits_head")(h)

    @staticmethod
    def log_prob(logits, actions):
        """(…,) log-prob of integer actions under the categorical."""
        logp = jax.nn.log_softmax(logits, axis=-1)
        return jnp.take_along_axis(logp, actions[..., None].astype(jnp.int32), -1)[..., 0]

    @staticmethod
    def entropy(logits):
        logp = jax.nn.log_softmax(logits, axis=-1)
        p = jnp.exp(logp)
        return -(p * logp).sum(-1)

    @staticmethod
    def sample(key, logits):
        return jax.random.categorical(key, logits, axis=-1)


class LSTMCell(nn.Module):
    """Torch-layout LSTM cell: stacked (in,4H)/(H,4H) kernels, gate order
    [i, f, g, o], xavier-uniform input kernel, orthogonal recurrent kernel,
    zero bias — matching poca_networks.py:298-312."""

    memory: int

    @nn.compact
    def __call__(self, carry, x):
        h, c = carry
        w_ih = self.param("w_ih", inits.lstm_xavier_ih(), (x.shape[-1], 4 * self.memory))
        w_hh = self.param("w_hh", inits.lstm_orthogonal_hh(), (self.memory, 4 * self.memory))
        b = self.param("bias", nn.initializers.zeros, (4 * self.memory,))
        gates = x @ w_ih + h @ w_hh + b
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h


class RecurrentDiscreteActor(nn.Module):
    """Categorical actor with LSTM memory (cyclamen).
    Matches poca_networks.py:276-378."""

    num_actions: int
    hidden: int = 128
    num_layers: int = 1
    memory: int = 128

    def setup(self):
        self.net = LinearEncoder(self.num_layers, self.hidden, name="net")
        self.lstm = LSTMCell(self.memory, name="lstm")
        self.logits_head = _dense(self.num_actions, inits.kaiming_normal(0.2),
                                  name="logits_head")

    def initial_state(self, batch: int):
        z = jnp.zeros((batch, self.memory))
        return (z, z)

    def step(self, obs, carry):
        """One step: obs (B, obs_dim), carry ((B,M),(B,M)) → (logits, carry)."""
        enc = self.net(obs)
        carry, out = self.lstm(carry, enc)
        return self.logits_head(out), carry

    def __call__(self, obs, carry):
        return self.step(obs, carry)

    def forward_sequence(self, obs_seq, carry, dones=None):
        """obs_seq (B, T, obs) → logits (B, T, A).

        When ``dones`` (B, T) is given, the carry is zeroed after any step
        whose done flag is set — the reference's done-masked BPTT
        (poca_trainer.py:599-608).
        """
        B, T = obs_seq.shape[:2]
        if dones is None:
            dones = jnp.zeros((B, T), dtype=obs_seq.dtype)

        def body(carry, xs):
            obs_t, done_t = xs
            logits, carry = self.step(obs_t, carry)
            keep = (1.0 - done_t)[:, None]
            carry = (carry[0] * keep, carry[1] * keep)
            return carry, logits

        xs = (jnp.moveaxis(obs_seq, 1, 0), jnp.moveaxis(dones, 1, 0))
        carry, logits = jax.lax.scan(body, carry, xs)
        return jnp.moveaxis(logits, 0, 1), carry


# ──────────────────────────────────────────────────────────────────────
#  Residual self-attention + POCA critic
# ──────────────────────────────────────────────────────────────────────

class ResidualSelfAttention(nn.Module):
    """Pre-norm residual MHA with masked average pooling over entities.

    Matches poca_networks.py:381-454: non-affine LayerNorms (eps 1e-5),
    Normal×T-Fixup projections, residual adds the NORMED input, pooled
    output. Returns (B, embed)."""

    embed: int
    num_heads: int = 4
    # computation dtype for the Q/K/V/out projections (params stay f32);
    # None = f32 throughout. See POCACritic.compute_dtype.
    compute_dtype: Optional[jnp.dtype] = None
    # which projections use compute_dtype — subset of "qkvo"
    # (POCAConfig.mp_stages); inert when compute_dtype is None
    mp_stages: str = "qkvo"

    NEG_INF: float = -1e6
    EPSILON: float = 1e-7

    def setup(self):
        gain = (0.125 / self.embed) ** 0.5
        dt = {s: (self.compute_dtype if s in self.mp_stages else None)
              for s in "qkvo"}
        self.fc_q = _dense(self.embed, inits.normal_gain(gain), name="fc_q",
                           dtype=dt["q"])
        self.fc_k = _dense(self.embed, inits.normal_gain(gain), name="fc_k",
                           dtype=dt["k"])
        self.fc_v = _dense(self.embed, inits.normal_gain(gain), name="fc_v",
                           dtype=dt["v"])
        self.fc_out = _dense(self.embed, inits.normal_gain(gain),
                             name="fc_out", dtype=dt["o"])
        # non-affine LayerNorms: no params, so exposing the stages as
        # separate methods keeps the param tree identical to round 1
        self.embedding_norm = nn.LayerNorm(use_bias=False, use_scale=False,
                                           epsilon=1e-5)
        self.residual_norm = nn.LayerNorm(use_bias=False, use_scale=False,
                                          epsilon=1e-5)

    def normalize(self, inp):
        """Pre-norm — PER-ENTITY, so callers may apply it before tiling
        entity sets (the all_baselines projection dedup)."""
        return self.embedding_norm(inp)

    def project_qkv(self, x):
        """Q/K/V projections of normalized entities — also per-entity,
        hence deduplicable across tiled entity sets."""
        return self.fc_q(x), self.fc_k(x), self.fc_v(x)

    def attend(self, x, q, k, v, key_mask: Optional[jax.Array] = None):
        """Attention + residual + pooled output from pre-normalized input
        ``x`` (B, N, D) and its per-entity projections."""
        B, N, D = x.shape
        H = self.num_heads
        d = D // H
        qh = q.reshape(B, N, H, d).transpose(0, 2, 1, 3)
        kh = k.reshape(B, N, H, d).transpose(0, 2, 1, 3)
        vh = v.reshape(B, N, H, d).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhnd,bhmd->bhnm", qh, kh,
                          preferred_element_type=jnp.float32) / math.sqrt(d)
        if key_mask is not None:
            attn = attn + key_mask[:, None, None, :] * self.NEG_INF
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, D)

        output = self.fc_out(out) + x
        output = self.residual_norm(output)

        if key_mask is not None:
            valid = (1.0 - key_mask)[..., None]
            return (output * valid).sum(1) / (valid.sum(1) + self.EPSILON)
        return output.mean(axis=1)

    def __call__(self, inp, key_mask: Optional[jax.Array] = None):
        x = self.normalize(inp)
        q, k, v = self.project_qkv(x)
        return self.attend(x, q, k, v, key_mask)


class POCACritic(nn.Module):
    """Attention-based centralized critic with counterfactual baselines.

    Consumes the 5-D polar STATE, not agent observations
    (poca_networks.py:469-635). ``max_agents`` replaces the reference's
    runtime max-tracker param (poca_networks.py:524-535): N is static per
    run, so the normalized agent count 2n/max − 1 is a compile-time
    constant (= 1.0 in every reference configuration)."""

    state_dim: int
    act_dim: int
    num_agents: int
    hidden: int = 256
    num_heads: int = 4
    num_layers: int = 2
    # Mixed precision (POCAConfig.mixed_precision): bf16 MATMUL OPERANDS
    # only — the RSA Q/K/V/out projections and the counterfactual pass's
    # big attn×values contraction take bf16 inputs with f32 MXU
    # accumulation; fc, the rank-1/residual chain, LayerNorm statistics,
    # softmax, pooling, the encoder tail and all params stay f32. Round
    # 2's wider form (whole bf16 residual tiles) measured a small
    # full-budget reward deficit (VALIDATION.md overlays) and was
    # narrowed to this. Validated against the f32 path by full-budget
    # learning-curve overlays.
    compute_dtype: Optional[jnp.dtype] = None
    # which projection/contraction stages take compute_dtype — subset of
    # "qkvo" (see POCAConfig.mp_stages); "v" also gates the attn×values
    # contraction of the non-fused tail below
    mp_stages: str = "qkvo"
    # Fused Pallas kernel for the fc/LN/pool tail of all_baselines
    # (ops/baseline_tail.py): no tile-sized HBM tensor in forward OR
    # backward (custom_vjp). Exact f32 math (kernel parity tests);
    # supersedes compute_dtype in the tail when enabled. Auto-enabled on
    # TPU by POCATrainer (POCAConfig.fused_tail).
    fused_tail: bool = False
    # Fully-fused counterfactual attention (ops/cf_attention.py): scores →
    # softmax → value contraction → fc/LN/pool in one kernel, consuming the
    # raw (B, H, N, N) score tensors — no (B, I, H, n, m) score/attention
    # tensor is ever materialized. Supersedes fused_tail when enabled.
    fused_attention: bool = False

    def setup(self):
        self.obs_entity_enc = EntityEmbedding(self.hidden, name="obs_entity_enc")
        self.obs_act_entity_enc = EntityEmbedding(self.hidden, name="obs_act_entity_enc")
        self.self_attn = ResidualSelfAttention(self.hidden, self.num_heads,
                                               compute_dtype=self.compute_dtype,
                                               mp_stages=self.mp_stages,
                                               name="self_attn")
        t_fixup_gain = (0.125 / self.hidden) ** 0.5
        self.linear_encoder = LinearEncoder(
            self.num_layers, self.hidden, "kaiming_normal", t_fixup_gain,
            name="linear_encoder",
        )
        self.value_head = nn.Dense(
            1,
            kernel_init=inits.torch_linear_default_kernel(),
            bias_init=inits.torch_linear_default_bias(self.hidden + 1),
            name="value_head",
        )

    @property
    def max_agents(self) -> int:
        return self.num_agents

    def _norm_agent_count(self, n: int) -> float:
        return n * 2.0 / float(self.max_agents) - 1.0

    def _encode_and_value(self, entities, n_agents: int):
        """Shared tail: RSA → linear encoder → (+norm agent count) → value."""
        pooled = self.self_attn(entities)
        encoding = self.linear_encoder(pooled)
        nc = jnp.full((encoding.shape[0], 1), self._norm_agent_count(n_agents),
                      dtype=encoding.dtype)
        return self.value_head(jnp.concatenate([encoding, nc], axis=-1))

    def _pooled_to_values(self, pooled, B, N):
        """Post-pool tail: linear encoder → (+norm agent count) → value."""
        encoding = self.linear_encoder(pooled)
        nc = jnp.full((encoding.shape[0], 1), self._norm_agent_count(N),
                      dtype=encoding.dtype)
        values = self.value_head(jnp.concatenate([encoding, nc], axis=-1))
        return values.reshape(B, N)

    def critic_pass(self, all_states):
        """Team value V(s): (B, N, state_dim) → (B, 1)."""
        entities = self.obs_entity_enc(all_states)
        return self._encode_and_value(entities, all_states.shape[1])

    def baseline(self, agent_i_state, other_states, other_actions):
        """Single counterfactual baseline b_i: agent i state-only + others
        state+action → (B, 1). Matches poca_networks.py:558-581."""
        ent_i = self.obs_entity_enc(agent_i_state[:, None, :])
        state_act = jnp.concatenate([other_states, other_actions], axis=-1)
        ent_o = self.obs_act_entity_enc(state_act)
        entities = jnp.concatenate([ent_i, ent_o], axis=1)
        return self._encode_and_value(entities, entities.shape[1])

    def all_baselines(self, all_states, all_actions):
        """All N counterfactual baselines in ONE attention pass → (B, N).

        TPU layout: tile the state+action embeddings to (B, N, N, h) and
        *swap the diagonal* for the state-only embedding — the same entity
        set as the reference's remove-diagonal-and-prepend construction
        (poca_networks.py:583-635), which is order-invariant under
        attention + average pooling.

        Assembled-scores layout (the learner's hot op, SURVEY §3.5 — this
        is where round 1 spent ~95% of update time, HBM-bound): the N
        counterfactual entity sets share the same 2N distinct embeddings,
        and the pre-norm + Q/K/V projections are PER-ENTITY, so instead of
        materializing (B·N, N, h) q/k/v/x tiles in HBM we:

          1. run LN + Q/K/V on the two (B, N, h) embedding sets only,
          2. build the (B, I, H, n, m) score tensor (h-free — ~25× smaller
             than one tile) from four SMALL matmuls: S_aa = q_a·k_aᵀ with
             row n=I overridden by S_sa, column m=I by S_as, and (I,I) by
             the q_s·k_s diagonal,
          3. fold the fc_out weight into the per-head values FIRST
             (matmul associativity: (attn·v)·W_out = attn·(v·W_out), per
             head block of W_out) and contract softmax(scores) against the
             small folded values (plus a rank-1 diagonal correction with
             the folded (v_s−v_a)) — producing the post-projection tensor
             directly, ~6× fewer FLOPs than attn-out-then-fc_out and one
             fewer HBM tile, and
          4. apply the residual as a broadcast of x_a with the diagonal
             swapped to x_s — fused by XLA, never materialized.

        Only the post-fc_out tensor (B·N, N, h) ever hits HBM at tile
        size (the LayerNorm needs every (I, n) row). Identical
        per-element math to tiling (measured ≤1e-7 vs the tiled form;
        reference parity in tests/test_models.py), ~1.85× faster fwd+bwd
        on a v5e at B=1024 than the round-1 tiled layout. Entity-set
        equivalence with the reference construction
        (poca_networks.py:583-635): same sets, order-invariant under
        attention + average pooling.
        """
        B, N, _ = all_states.shape
        h = self.hidden
        rsa = self.self_attn
        H = rsa.num_heads
        d = h // H
        obs_emb = self.obs_entity_enc(all_states)                       # (B,N,h)
        state_act = jnp.concatenate([all_states, all_actions], axis=-1)
        obs_act_emb = self.obs_act_entity_enc(state_act)                # (B,N,h)

        x_s = rsa.normalize(obs_emb)
        x_a = rsa.normalize(obs_act_emb)
        q_s, k_s, v_s = rsa.project_qkv(x_s)
        q_a, k_a, v_a = rsa.project_qkv(x_a)

        def heads(t):                                   # (B,N,h) → (B,H,N,d)
            return t.reshape(B, N, H, d).transpose(0, 2, 1, 3)

        qs, ks, vs = heads(q_s), heads(k_s), heads(v_s)
        qa, ka, va = heads(q_a), heads(k_a), heads(v_a)

        f32 = jnp.float32
        S_aa = jnp.einsum("bhnd,bhmd->bhnm", qa, ka, preferred_element_type=f32)
        S_sa = jnp.einsum("bhnd,bhmd->bhnm", qs, ka, preferred_element_type=f32)
        S_as = jnp.einsum("bhnd,bhmd->bhnm", qa, ks, preferred_element_type=f32)
        S_ss = (qs.astype(f32) * ks.astype(f32)).sum(-1)               # (B,H,N)

        # fold W_out into the per-head values: w[b,h,m,o] = v_h[m]·W_out[h]
        tile_dtype = (self.compute_dtype
                      if self.compute_dtype is not None
                      and "v" in self.mp_stages else f32)
        kernel = rsa.fc_out.variables["params"]["kernel"]      # (h, h)
        bias = rsa.fc_out.variables["params"]["bias"]
        Wh = kernel.reshape(H, d, h)
        wa = jnp.einsum("bhmd,hdo->bhmo", va, Wh,
                        preferred_element_type=f32)
        dws = jnp.einsum("bhmd,hdo->bhmo", vs - va, Wh,
                         preferred_element_type=f32)           # (B,H,I,h)

        if self.fused_attention:
            # one Pallas kernel from raw scores to pooled rows: the
            # (B, I, H, n, m) score/softmax tensors below never exist
            from ..ops.cf_attention import fused_cf_attention

            pooled = fused_cf_attention(
                S_aa, S_as, S_sa, S_ss[..., None], wa, dws, x_a, x_s - x_a,
                bias, d, None)
            return self._pooled_to_values(pooled.reshape(B * N, h), B, N)

        ii = jnp.arange(N)
        I_idx = ii[None, :, None, None, None]
        n_idx = ii[None, None, None, :, None]
        m_idx = ii[None, None, None, None, :]
        base = S_aa[:, None]                                  # (B,1,H,n,m)
        row_I = jnp.transpose(S_sa, (0, 2, 1, 3))[:, :, :, None, :]
        col_I = jnp.transpose(S_as, (0, 3, 1, 2))[:, :, :, :, None]
        diag_I = jnp.transpose(S_ss, (0, 2, 1))[:, :, :, None, None]

        scores = jnp.where(n_idx == I_idx, row_I, base)
        scores = jnp.where(m_idx == I_idx,
                           jnp.where(n_idx == I_idx, diag_I, col_I), scores)
        attn = jax.nn.softmax(scores / math.sqrt(d), axis=-1)  # (B,I,H,n,m)

        if self.fused_tail:
            # Pallas tail: fc/LN/pool entirely in VMEM (fwd + custom vjp)
            from ..ops.baseline_tail import fused_tail

            lhs = jnp.transpose(attn, (0, 1, 3, 2, 4)) \
                .reshape(B, N * N, H * N)
            # head-major (B,H,I,n) — the kernel needs leading-axis
            # per-head slices (Mosaic gather limitation)
            attn_mI = jnp.take_along_axis(attn, I_idx[..., :1],
                                          axis=-1)[..., 0].transpose(0, 2, 1, 3)
            pooled = fused_tail(lhs, attn_mI, wa.reshape(B, H * N, h),
                                dws, x_a, x_s - x_a, bias, N, None)
            return self._pooled_to_values(pooled.reshape(B * N, h), B, N)
        # fc[b,I,n,o] = Σ_{h,m} attn·wa (+ rank-1 diagonal correction),
        # MXU-shaped as (I·n, h·m)@(h·m, o). Under mixed_precision only
        # the MATMUL OPERANDS are bf16 (MXU accumulates f32); fc itself
        # and the whole rank-1/residual/LN chain stay f32 — round 2's
        # bf16-tile form (residual adds rounded to bf16) measured a small
        # but real full-budget reward deficit (VALIDATION.md overlays),
        # so the precision-sensitive chain keeps full precision and bf16
        # buys MXU rate + halved operand traffic only.
        lhs = jnp.transpose(attn, (0, 1, 3, 2, 4)) \
            .reshape(B, N * N, H * N).astype(tile_dtype)
        rhs = wa.astype(tile_dtype).reshape(B, H * N, h)
        fc = jnp.einsum("bxm,bmo->bxo", lhs, rhs,
                        preferred_element_type=f32) \
            .reshape(B, N, N, h)
        attn_mI = jnp.take_along_axis(attn, I_idx[..., :1],
                                      axis=-1)[..., 0]         # (B,I,H,n)
        fc = fc + jnp.einsum("bIhn,bhIo->bIno", attn_mI, dws,
                             preferred_element_type=f32)
        fc = fc + (bias + x_a[:, None, :, :])
        eye = (ii[:, None] == ii[None, :])[None, :, :, None]
        fc = fc + jnp.where(eye, (x_s - x_a)[:, :, None, :], 0.0)
        y = rsa.residual_norm(fc.reshape(B * N, N, h))
        return self._pooled_to_values(y.mean(axis=1), B, N)

    def __call__(self, all_states, all_actions):
        """Init-friendly entry touching every submodule."""
        v = self.critic_pass(all_states)
        b = self.all_baselines(all_states, all_actions)
        return v, b

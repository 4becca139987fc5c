"""TPU-native functional Gemma-2-geometry causal LM encoder.

The reference's distillation teacher is ``BAAI/bge-multilingual-gemma2``
— an fp16 *decoder-only* LM whose last-token-pooled hidden state is the
teacher embedding (/root/reference/distill.py:504-509 loads it,
last_token_pool at :407). This module provides that model family so the
actual reference teacher can be instantiated, with the same TPU-first
design as models/bert.py:

  * pure functions over an explicit param pytree;
  * layers stacked on a leading axis + ``lax.scan`` (O(1) compile in
    depth, remat seam for the 42-layer 9B geometry);
  * bf16 matmuls on the MXU, RMSNorm statistics + softmax in f32;
  * static shapes, additive causal/pad/sliding-window attention bias.

Gemma-2 specifics implemented (pinned by a differential test against
``transformers.Gemma2Model`` on a tiny config, tests/test_gemma.py):
embedding scaled by sqrt(hidden); GQA (num_key_value_heads < heads);
RoPE; query scaling by ``query_pre_attn_scalar**-0.5`` (not head_dim);
attention logit soft-capping ``cap*tanh(s/cap)``; gemma RMSNorm
``x * (1+w)`` with f32 statistics; sandwich norms (input/post-attention
and pre/post-feedforward RMSNorms around each half-block); GeGLU MLP
(gelu_tanh(gate)*up); sliding-window attention on even layers; final
RMSNorm. The LM head is intentionally absent — the teacher only ever
produces pooled hidden states.

The teacher is frozen in every reference code path, so only the forward
exists; it still composes with jax AD if a trainable decoder is ever
needed.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

Params = Dict[str, Any]


@dataclass(frozen=True)
class GemmaConfig:
    """Gemma-2 architecture hyperparameters (HF Gemma2Config-compatible
    subset). Defaults are the gemma-2-9b geometry underlying the
    reference teacher (bge-multilingual-gemma2)."""

    vocab_size: int = 256000
    hidden_size: int = 3584
    num_hidden_layers: int = 42
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    head_dim: int = 256
    intermediate_size: int = 14336
    max_position_embeddings: int = 8192
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    query_pre_attn_scalar: float = 256.0
    attn_logit_softcapping: Optional[float] = 50.0
    sliding_window: int = 4096
    pad_token_id: int = 0
    dtype: str = "bfloat16"  # compute dtype
    scan_unroll: int = 1

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @classmethod
    def tiny(cls, vocab_size: int = 503, **kw) -> "GemmaConfig":
        """Small config for tests — keeps every architectural wrinkle
        (GQA, softcap, tiny sliding window so the alternating-layer
        masking is actually exercised at test lengths)."""
        kw.setdefault("sliding_window", 8)
        return cls(vocab_size=vocab_size, hidden_size=32,
                   num_hidden_layers=4, num_attention_heads=4,
                   num_key_value_heads=2, head_dim=8,
                   intermediate_size=64, max_position_embeddings=128,
                   query_pre_attn_scalar=8.0, dtype="float32", **kw)

    @classmethod
    def from_hf_dict(cls, d: dict) -> "GemmaConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        # HF's "dtype"/"torch_dtype" is the *storage* dtype of the
        # checkpoint, not our compute dtype — keep the bf16 default
        known.discard("dtype")
        kw = {k: v for k, v in d.items() if k in known and v is not None}
        return cls(**kw)


# ---------------------------------------------------------------------------
# Initialization / HF import
# ---------------------------------------------------------------------------

def init_params(rng: jax.Array, cfg: GemmaConfig) -> Params:
    """Random init (normal * 0.02, HF default) — used by tests and
    random-teacher benches; real teachers load HF weights below."""
    D, F, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    H, KV, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                 cfg.head_dim)
    keys = jax.random.split(rng, 8)

    def dense(k, shape):
        return jax.random.normal(k, shape, jnp.float32) * 0.02

    return {
        "embeddings": {"word": dense(keys[0], (cfg.vocab_size, D))},
        "layers": {
            "q_kernel": dense(keys[1], (L, D, H * hd)),
            "k_kernel": dense(keys[2], (L, D, KV * hd)),
            "v_kernel": dense(keys[3], (L, D, KV * hd)),
            "o_kernel": dense(keys[4], (L, H * hd, D)),
            "input_ln": jnp.zeros((L, D), jnp.float32),
            "post_attn_ln": jnp.zeros((L, D), jnp.float32),
            "pre_ffn_ln": jnp.zeros((L, D), jnp.float32),
            "post_ffn_ln": jnp.zeros((L, D), jnp.float32),
            "gate_kernel": dense(keys[5], (L, D, F)),
            "up_kernel": dense(keys[6], (L, D, F)),
            "down_kernel": dense(keys[7], (L, F, D)),
        },
        "final_ln": jnp.zeros((D,), jnp.float32),
    }


def partition_specs(cfg: GemmaConfig, model_axis: str = "model") -> Params:
    """Megatron-style TP specs over ``model_axis``: q/k/v/gate/up
    column-parallel, o/down row-parallel, norms replicated. With GQA the
    kv head count must divide the model-axis size for an even shard."""
    m = model_axis
    return {
        "embeddings": {"word": P(None, None)},
        "layers": {
            "q_kernel": P(None, None, m),
            "k_kernel": P(None, None, m),
            "v_kernel": P(None, None, m),
            "o_kernel": P(None, m, None),
            "input_ln": P(None, None),
            "post_attn_ln": P(None, None),
            "pre_ffn_ln": P(None, None),
            "post_ffn_ln": P(None, None),
            "gate_kernel": P(None, None, m),
            "up_kernel": P(None, None, m),
            "down_kernel": P(None, m, None),
        },
        "final_ln": P(None),
    }


def params_from_hf_state_dict(sd: Dict[str, Any],
                              cfg: GemmaConfig) -> Params:
    """Map a HF ``Gemma2Model`` (or ``Gemma2ForCausalLM``) state dict to
    the stacked param tree. Torch Linear stores [out, in] — transposed
    here; per-layer tensors stack on a leading layer axis."""
    def t(name):
        v = sd[name]
        v = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        return np.asarray(v, np.float32)

    pre = "model." if any(k.startswith("model.") for k in sd) else ""
    L = cfg.num_hidden_layers

    def stack(fmt, transpose=False):
        mats = [t(pre + fmt.format(i)) for i in range(L)]
        if transpose:
            mats = [m.T for m in mats]
        return jnp.asarray(np.stack(mats))

    return {
        "embeddings": {"word": jnp.asarray(t(pre + "embed_tokens.weight"))},
        "layers": {
            "q_kernel": stack("layers.{}.self_attn.q_proj.weight", True),
            "k_kernel": stack("layers.{}.self_attn.k_proj.weight", True),
            "v_kernel": stack("layers.{}.self_attn.v_proj.weight", True),
            "o_kernel": stack("layers.{}.self_attn.o_proj.weight", True),
            "input_ln": stack("layers.{}.input_layernorm.weight"),
            "post_attn_ln": stack("layers.{}.post_attention_layernorm.weight"),
            "pre_ffn_ln": stack("layers.{}.pre_feedforward_layernorm.weight"),
            "post_ffn_ln": stack("layers.{}.post_feedforward_layernorm.weight"),
            "gate_kernel": stack("layers.{}.mlp.gate_proj.weight", True),
            "up_kernel": stack("layers.{}.mlp.up_proj.weight", True),
            "down_kernel": stack("layers.{}.mlp.down_proj.weight", True),
        },
        "final_ln": jnp.asarray(t(pre + "norm.weight")),
    }


def load_hf_dir(model_dir: str) -> Tuple[Params, GemmaConfig]:
    """Load config.json + weights from a local HF checkpoint directory
    (offline env: no hub download, mirroring utils.load_hf's local-first
    contract, /root/reference/src/utils.py:268-276)."""
    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = GemmaConfig.from_hf_dict(json.load(f))
    # shard-aware, dtype-aware (a real bge-multilingual-gemma2 download
    # is 4 bf16 safetensors shards + model.safetensors.index.json)
    from czechtriever_tpu.models.hf_interop import load_hf_state_dict
    return params_from_hf_state_dict(load_hf_state_dict(model_dir), cfg), cfg


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _rms_norm(x, weight, eps):
    """Gemma RMSNorm: f32 statistics, ``x * (1 + w)`` scaling
    (transformers Gemma2RMSNorm)."""
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(var + eps)
    return (y * (1.0 + weight.astype(jnp.float32))).astype(x.dtype)


def _rope(x, positions, theta):
    """Rotary embedding, HF "split-half" layout: rotate_half(x) pairs
    dim i with dim i + hd/2. x: [B, L, N, hd]; positions: [L]."""
    hd = x.shape[-1]
    inv_freq = 1.0 / (theta ** (jnp.arange(0, hd, 2, jnp.float32) / hd))
    ang = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]  # [L, hd/2]
    cos = jnp.cos(ang)[None, :, None, :]
    sin = jnp.sin(ang)[None, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                          axis=-1)
    return out.astype(x.dtype)


def _attention(cfg: GemmaConfig, x, bias_full, bias_sliding, lp, use_sliding):
    """GQA attention with RoPE, softcapping and the layer's mask flavor.
    x: [B, L, D]; biases: [B, 1, L, L] f32 additive."""
    dt = cfg.compute_dtype
    B, L, D = x.shape
    H, KV, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                 cfg.head_dim)

    q = jnp.dot(x, lp["q_kernel"].astype(dt),
                preferred_element_type=dt).reshape(B, L, H, hd)
    k = jnp.dot(x, lp["k_kernel"].astype(dt),
                preferred_element_type=dt).reshape(B, L, KV, hd)
    v = jnp.dot(x, lp["v_kernel"].astype(dt),
                preferred_element_type=dt).reshape(B, L, KV, hd)

    positions = jnp.arange(L)
    q = _rope(q, positions, cfg.rope_theta)
    k = _rope(k, positions, cfg.rope_theta)

    # group queries over kv heads: [B, L, KV, H/KV, hd]
    q = q.reshape(B, L, KV, H // KV, hd)
    scores = jnp.einsum("bqcgd,bkcd->bcgqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores * (cfg.query_pre_attn_scalar ** -0.5)
    if cfg.attn_logit_softcapping:
        cap = cfg.attn_logit_softcapping
        scores = cap * jnp.tanh(scores / cap)
    bias = bias_sliding if use_sliding else bias_full
    scores = scores + bias[:, :, None]          # [B,1,1,L,L] broadcast
    probs = jax.nn.softmax(scores, axis=-1).astype(dt)
    ctx = jnp.einsum("bcgqk,bkcd->bqcgd", probs, v,
                     preferred_element_type=dt).reshape(B, L, H * hd)
    return jnp.dot(ctx, lp["o_kernel"].astype(dt), preferred_element_type=dt)


def _layer(cfg: GemmaConfig, x, bias_full, bias_sliding, lp, use_sliding):
    """One Gemma-2 block: sandwich-normed attention + GeGLU MLP."""
    dt = cfg.compute_dtype
    eps = cfg.rms_norm_eps

    h = _rms_norm(x, lp["input_ln"], eps)
    h = _attention(cfg, h, bias_full, bias_sliding, lp, use_sliding)
    h = _rms_norm(h, lp["post_attn_ln"], eps)
    x = x + h

    h = _rms_norm(x, lp["pre_ffn_ln"], eps)
    gate = jnp.dot(h, lp["gate_kernel"].astype(dt), preferred_element_type=dt)
    up = jnp.dot(h, lp["up_kernel"].astype(dt), preferred_element_type=dt)
    h = jax.nn.gelu(gate, approximate=True) * up
    h = jnp.dot(h, lp["down_kernel"].astype(dt), preferred_element_type=dt)
    h = _rms_norm(h, lp["post_ffn_ln"], eps)
    return x + h


@partial(jax.jit, static_argnames=("cfg", "remat"))
def forward(params: Params, cfg: GemmaConfig, input_ids: jnp.ndarray,
            attention_mask: jnp.ndarray, remat: bool = False) -> jnp.ndarray:
    """Causal LM trunk: token ids -> final hidden states [B, L, D].

    attention_mask: [B, L], 1 for real tokens. Pad query rows produce
    garbage and must be ignored by the pooler (last_token_pool indexes
    the last mask=1 position, matching the reference's last_token_pool,
    distill.py:407).
    """
    dt = cfg.compute_dtype
    B, L = input_ids.shape
    input_ids = input_ids.astype(jnp.int32)
    attention_mask = attention_mask.astype(jnp.int32)

    x = params["embeddings"]["word"][input_ids].astype(dt)
    # gemma scales embeddings by sqrt(hidden), rounded in compute dtype
    # (transformers: normalizer = tensor(hidden_size**0.5, dtype=dtype))
    x = x * jnp.asarray(cfg.hidden_size ** 0.5, dt)

    neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
    qpos = jnp.arange(L)[:, None]
    kpos = jnp.arange(L)[None, :]
    causal = kpos <= qpos
    pad_ok = attention_mask.astype(bool)[:, None, :]          # [B,1,L] keys
    full_ok = causal[None] & pad_ok
    # sliding window keeps keys in (i - window, i]
    sliding_ok = full_ok & (kpos > qpos - cfg.sliding_window)[None]
    bias_full = jnp.where(full_ok, 0.0, neg)[:, None]         # [B,1,L,L]
    bias_sliding = jnp.where(sliding_ok, 0.0, neg)[:, None]

    def body(h, lp_and_i):
        lp, i = lp_and_i
        # even layers use the sliding window (transformers Gemma2:
        # is_sliding = not layer_idx % 2). Both masks are closed over;
        # lax.cond keeps the scan body layer-independent.
        h = jax.lax.cond(
            i % 2 == 0,
            lambda hh: _layer(cfg, hh, bias_full, bias_sliding, lp, True),
            lambda hh: _layer(cfg, hh, bias_full, bias_sliding, lp, False),
            h)
        return h, None

    if remat:
        body = jax.checkpoint(body)
    layer_idx = jnp.arange(cfg.num_hidden_layers)
    x, _ = jax.lax.scan(body, x, (params["layers"], layer_idx),
                        unroll=cfg.scan_unroll)
    return _rms_norm(x, params["final_ln"], cfg.rms_norm_eps)


@partial(jax.jit, static_argnames=("cfg", "pooling_mode", "normalize",
                                   "remat"))
def encode(params: Params, cfg: GemmaConfig, input_ids: jnp.ndarray,
           attention_mask: jnp.ndarray, pooling_mode: str = "last",
           normalize: bool = False, remat: bool = False) -> jnp.ndarray:
    """Token ids -> [B, D] f32 embeddings, last-token pooled by default
    (the reference teacher's pooling, distill.py:407)."""
    from czechtriever_tpu.ops import pooling
    h = forward(params, cfg, input_ids, attention_mask, remat=remat)
    return pooling.pool(h, attention_mask, pooling=pooling_mode,
                        normalize=normalize)


def num_params(params: Params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))

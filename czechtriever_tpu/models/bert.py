"""TPU-native functional BERT encoder.

This is the compute core replacing the reference's HuggingFace
``BertModel`` forward (/root/reference/src/contriever.py:11-55, which
delegates to cuDNN/cuBLAS). Design choices for TPU/XLA:

  * **Pure functions over an explicit param pytree** — params are a nested
    dict of jnp arrays, so jit/grad/tree_map/EMA/sharding all compose
    without framework indirection, and the MoCo momentum update
    (src/moco.py:260-269, a Python per-parameter loop in the reference)
    becomes one fused ``jax.tree.map``.
  * **Layers stacked on a leading axis + ``lax.scan``** — one compiled
    layer body instead of N unrolled ones: O(1) compile time in depth and
    a natural seam for ``jax.checkpoint`` rematerialisation.
  * **bf16 compute / f32 params** — matmuls hit the MXU in bfloat16;
    LayerNorm statistics and the softmax run in f32 for stability.
  * **Static shapes everywhere** — padding is handled with an additive
    attention bias, never with dynamic shapes.

Tensor-parallel sharding of the head and FFN dimensions is expressed with
``partition_specs`` below and applied by the caller via NamedSharding —
XLA then lowers the contractions to ICI collectives.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

Params = Dict[str, Any]


@dataclass(frozen=True)
class BertConfig:
    """Architecture hyperparameters (HF BertConfig-compatible subset)."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    initializer_range: float = 0.02
    pad_token_id: int = 0
    dtype: str = "bfloat16"  # compute dtype
    # "flash": fused Pallas kernel (ops/attention.py, TPU only);
    # "naive": XLA scores->softmax->dropout->matmul;
    # "auto": flash on the TPU backend, naive elsewhere
    attention_impl: str = "auto"
    # "bert": position ids = arange(L); "roberta": mask-cumsum offset by
    # pad_token_id (XLM-R, the reference's XLMRetriever encoder,
    # src/contriever.py:58-100)
    position_style: str = "bert"
    # "gelu" = exact erf gelu (HF BERT default); "gelu_tanh" = tanh
    # approximation — on v5e the erf costs ~11 ms per BERT-base forward
    # at B=128,L=256 while the tanh form fuses for free
    hidden_act: str = "gelu"
    # lax.scan unroll factor over layers (1 = fully rolled). Unrolling
    # exposes static per-layer indices so XLA can keep the stacked
    # weight-gradient updates in place instead of copying the buffer
    scan_unroll: int = 1
    # False: plain Python loop over layers instead of lax.scan. The
    # scan stacks every saved activation (x/ctx/z and the q/k/v dot
    # outputs) into [L, ...] buffers via dynamic-update-slice; the loop
    # keeps each layer's residuals as standalone buffers with no
    # stacking copies, at the cost of depth-proportional compile time
    scan_layers: bool = True
    # "fused": fused FFN block kernel (ops/ffn_block.py — matmul, gelu,
    # matmul, dropout, residual, LN in one program; only used together
    # with attention_impl="flash_block"); "xla" (default)
    ffn_impl: str = "xla"
    # Pack PAIRS of batch elements into one kernel row-block (recipe
    # shape: two 136-token items share one 272-row program whose keys
    # pad to 384 lanes). NOTE the raw score area per element RISES 1.5x
    # ([272,384]/2 vs [136,256]) — the measured +8.2% comes entirely
    # from the larger, better-lane-tiled dots (N=384 = 3 full lane
    # tiles vs a half-dead final tile at 136-real-of-256; 272 rows
    # amortize MXU pipeline fill/drain): the CZT_ATTN_BLOCK_B control
    # showed grid-halving alone buys nothing (docs/PERF.md round-8).
    # Attention stays block-diagonal via segmented key masks
    # (ops/attention_block.py _build_biasp); only active with
    # attention_impl="flash_block", even B, L % 8 == 0 and
    # L % 128 != 0 (at lane-aligned L the bigger score matrix would be
    # pure overhead).
    # Dropout STREAMS differ from the unpacked kernel (per-program
    # seeds cover two elements); dropout=0 numerics match to fp
    # accumulation order. Default ON: measured +8.2% train-step
    # throughput at the recipe shape (1033 -> 1117.6 pairs/s,
    # docs/PERF.md round-4) and a no-op everywhere the gate declines.
    attention_pack_pairs: bool = True
    # "fused": Pallas LayerNorm kernel (ops/layernorm.py, TPU only);
    # "xla" (default): matmul-stats LN — measured equal or slightly
    # faster than the fused kernel both standalone (3.05 vs 3.76 ms
    # fwd+bwd at [32768,768]) and in the train step (440 vs 437
    # pairs/s), because XLA fuses the residual add and dropout into its
    # LN chain while the kernel forces a boundary
    ln_impl: str = "xla"

    @property
    def head_dim(self) -> int:
        assert self.hidden_size % self.num_attention_heads == 0
        return self.hidden_size // self.num_attention_heads

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @classmethod
    def tiny(cls, vocab_size: int = 1031, **kw) -> "BertConfig":
        """Small config for tests."""
        return cls(vocab_size=vocab_size, hidden_size=64, num_hidden_layers=2,
                   num_attention_heads=4, intermediate_size=128,
                   max_position_embeddings=128, dtype="float32", **kw)

    @classmethod
    def from_hf_dict(cls, d: dict) -> "BertConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in d.items() if k in known}
        if "roberta" in str(d.get("model_type", "")):
            kw.setdefault("position_style", "roberta")
        if d.get("hidden_act") in ("gelu_new", "gelu_pytorch_tanh",
                                   "gelu_tanh"):
            kw["hidden_act"] = "gelu_tanh"
        elif d.get("hidden_act") == "gelu":
            kw["hidden_act"] = "gelu"
        return cls(**kw)


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def _dense(rng, shape, std):
    return jax.random.truncated_normal(rng, -2.0, 2.0, shape, jnp.float32) * std


def init_params(rng: jax.Array, cfg: BertConfig) -> Params:
    """Random init matching BERT's truncated-normal(initializer_range)."""
    D, F, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    std = cfg.initializer_range
    keys = jax.random.split(rng, 16)

    def ln():
        return {"scale": jnp.ones((D,), jnp.float32),
                "bias": jnp.zeros((D,), jnp.float32)}

    def stacked_ln():
        return {"scale": jnp.ones((L, D), jnp.float32),
                "bias": jnp.zeros((L, D), jnp.float32)}

    embeddings = {
        "word": _dense(keys[0], (cfg.vocab_size, D), std),
        "position": _dense(keys[1], (cfg.max_position_embeddings, D), std),
        "token_type": _dense(keys[2], (cfg.type_vocab_size, D), std),
        "ln": ln(),
    }
    layers = {
        "q_kernel": _dense(keys[3], (L, D, D), std),
        "q_bias": jnp.zeros((L, D), jnp.float32),
        "k_kernel": _dense(keys[4], (L, D, D), std),
        "k_bias": jnp.zeros((L, D), jnp.float32),
        "v_kernel": _dense(keys[5], (L, D, D), std),
        "v_bias": jnp.zeros((L, D), jnp.float32),
        "attn_out_kernel": _dense(keys[6], (L, D, D), std),
        "attn_out_bias": jnp.zeros((L, D), jnp.float32),
        "attn_ln": stacked_ln(),
        "ffn_in_kernel": _dense(keys[7], (L, D, F), std),
        "ffn_in_bias": jnp.zeros((L, F), jnp.float32),
        "ffn_out_kernel": _dense(keys[8], (L, F, D), std),
        "ffn_out_bias": jnp.zeros((L, D), jnp.float32),
        "ffn_ln": stacked_ln(),
    }
    return {"embeddings": embeddings, "layers": layers}


def partition_specs(cfg: BertConfig, model_axis: str = "model") -> Params:
    """PartitionSpecs for tensor parallelism over ``model_axis``.

    Megatron-style: QKV and FFN-in column-parallel (shard output dim),
    attn-out and FFN-out row-parallel (shard input dim). Everything else
    replicated. XLA inserts the psum on the row-parallel contractions.
    """
    m = model_axis
    return {
        "embeddings": {
            "word": P(None, None), "position": P(None, None),
            "token_type": P(None, None),
            "ln": {"scale": P(None), "bias": P(None)},
        },
        "layers": {
            "q_kernel": P(None, None, m), "q_bias": P(None, m),
            "k_kernel": P(None, None, m), "k_bias": P(None, m),
            "v_kernel": P(None, None, m), "v_bias": P(None, m),
            "attn_out_kernel": P(None, m, None), "attn_out_bias": P(None, None),
            "attn_ln": {"scale": P(None, None), "bias": P(None, None)},
            "ffn_in_kernel": P(None, None, m), "ffn_in_bias": P(None, m),
            "ffn_out_kernel": P(None, m, None), "ffn_out_bias": P(None, None),
            "ffn_ln": {"scale": P(None, None), "bias": P(None, None)},
        },
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _layer_norm(x, scale, bias, eps, impl: str = "xla"):
    """LayerNorm. impl="fused" uses the Pallas kernel (one HBM read +
    one write, ops/layernorm.py); the XLA path computes row statistics
    as f32 matmuls against a ones vector (cross-lane reductions over the
    feature dim run ~8x below HBM bandwidth on the VPU; the MXU row-sum
    form measured 1.5ms vs 2.2ms fwd at [128,256,768] and is
    bit-identical to the reduce form)."""
    if impl == "fused" or (impl == "auto"
                           and jax.default_backend() == "tpu"):
        from czechtriever_tpu.ops.layernorm import fused_layer_norm
        shape = x.shape
        y = fused_layer_norm(x.reshape(-1, shape[-1]), scale, bias, eps)
        return y.reshape(shape)
    x32 = x.astype(jnp.float32)
    D = x32.shape[-1]
    ones = jnp.ones((D, 1), jnp.float32)
    mean = jnp.dot(x32, ones, preferred_element_type=jnp.float32) / D
    xc = x32 - mean
    var = jnp.dot(xc * xc, ones, preferred_element_type=jnp.float32) / D
    y = xc * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _dropout(x, rate, rng, deterministic):
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def _encoder_layer(cfg: BertConfig, x, bias, lp, rngs, deterministic):
    """One post-LN transformer layer. x: [B, L, D] in compute dtype;
    bias: [B, L] f32 additive key mask (0 real, -1e30 pad), [B, S, L/S]
    f32 segmented masks (pair packing), or [B, L] int32 segment ids
    (variable-length packing, data/packing.py — attention is
    block-diagonal per crop; every other op in the layer is row-local
    so packing changes nothing else)."""
    dt = cfg.compute_dtype
    B, L, D = x.shape
    H, hd = cfg.num_attention_heads, cfg.head_dim

    def proj(h, kernel, b):
        return jnp.dot(h, kernel.astype(dt), preferred_element_type=dt) + b.astype(dt)

    q = proj(x, lp["q_kernel"], lp["q_bias"])
    k = proj(x, lp["k_kernel"], lp["k_bias"])
    v = proj(x, lp["v_kernel"], lp["v_bias"])

    rate = cfg.attention_probs_dropout_prob
    attn_rng = rngs.get("attn")
    if cfg.attention_impl == "flash_block":
        # experimental fully-fused attention half-block: MHA + out-proj
        # + dropout + residual + LN in one kernel (ops/attention_block).
        # Both dropouts ride the in-kernel hardware PRNG from one seed.
        from czechtriever_tpu.ops import attention_block as ab
        det = deterministic or attn_rng is None
        seed = (jax.random.bits(attn_rng, (), "uint32").astype(jnp.int32)
                if not det else jnp.int32(0))
        x = ab.attention_block(
            q, k, v, x, lp["attn_out_kernel"].astype(dt),
            lp["attn_out_bias"].astype(dt),
            lp["attn_ln"]["scale"].astype(dt),
            lp["attn_ln"]["bias"].astype(dt), bias, seed, H,
            rate if not det else 0.0,
            cfg.hidden_dropout_prob if not det else 0.0,
            cfg.layer_norm_eps, det)
        if cfg.ffn_impl == "fused":
            from czechtriever_tpu.ops import ffn_block as fb
            h2_rng = rngs.get("h2")
            det2 = deterministic or h2_rng is None
            seed2 = (jax.random.bits(h2_rng, (), "uint32")
                     .astype(jnp.int32) if not det2 else jnp.int32(0))
            return fb.ffn_block(
                x, lp["ffn_in_kernel"].astype(dt),
                lp["ffn_in_bias"].astype(dt),
                lp["ffn_out_kernel"].astype(dt),
                lp["ffn_out_bias"].astype(dt),
                lp["ffn_ln"]["scale"].astype(dt),
                lp["ffn_ln"]["bias"].astype(dt), seed2,
                cfg.hidden_dropout_prob if not det2 else 0.0,
                cfg.layer_norm_eps, cfg.hidden_act == "gelu_tanh", det2)
        h = proj(x, lp["ffn_in_kernel"], lp["ffn_in_bias"])
        h = jax.nn.gelu(h, approximate=cfg.hidden_act == "gelu_tanh")
        h = proj(h, lp["ffn_out_kernel"], lp["ffn_out_bias"])
        h = _dropout(h, cfg.hidden_dropout_prob, rngs.get("h2"),
                     deterministic)
        return _layer_norm(x + h, lp["ffn_ln"]["scale"],
                           lp["ffn_ln"]["bias"], cfg.layer_norm_eps,
                           impl=cfg.ln_impl)
    seg_bias = jnp.issubdtype(bias.dtype, jnp.integer)
    use_flash = not seg_bias and (
        cfg.attention_impl == "flash" or (
            cfg.attention_impl == "auto"
            and jax.default_backend() == "tpu"))
    if use_flash:
        # the kernel consumes the projection-natural [B, L, H*hd] layout
        # directly — no head transpose copies (see ops/attention.py)
        from czechtriever_tpu.ops import attention as attn_ops
        det = deterministic or rate == 0.0 or attn_rng is None
        seed = (jax.random.bits(attn_rng, (), "uint32").astype(jnp.int32)
                if not det else jnp.int32(0))
        ctx = attn_ops.flash_attention(q, k, v, bias, seed, H, rate, det)
    else:
        # scores in f32 for a stable softmax
        qh = q.reshape(B, L, H, hd)
        kh = k.reshape(B, L, H, hd)
        vh = v.reshape(B, L, H, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32)
        if seg_bias:
            # block-diagonal mask from segment ids (packed batches)
            ok = ((bias[:, :, None] == bias[:, None, :])
                  & (bias >= 0)[:, None, :])
            bias4 = jnp.where(ok, 0.0, -1e30).astype(jnp.float32)[:, None]
        else:
            bias4 = bias[:, None, None, :]
        scores = scores / math.sqrt(hd) + bias4
        probs = jax.nn.softmax(scores, axis=-1)
        probs = _dropout(probs, rate, attn_rng, deterministic).astype(dt)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, vh,
                         preferred_element_type=dt).reshape(B, L, D)
    attn_out = proj(ctx, lp["attn_out_kernel"], lp["attn_out_bias"])
    attn_out = _dropout(attn_out, cfg.hidden_dropout_prob,
                        rngs.get("h1"), deterministic)
    x = _layer_norm(x + attn_out, lp["attn_ln"]["scale"],
                    lp["attn_ln"]["bias"], cfg.layer_norm_eps,
                    impl=cfg.ln_impl)

    h = proj(x, lp["ffn_in_kernel"], lp["ffn_in_bias"])
    # gelu in compute dtype: an f32 upcast here makes XLA save three
    # f32[L,B,S,3072] buffers for backward (13.5 GB at B=128) and was the
    # single largest HBM cost of the no-remat step
    h = jax.nn.gelu(h, approximate=cfg.hidden_act == "gelu_tanh")
    h = proj(h, lp["ffn_out_kernel"], lp["ffn_out_bias"])
    h = _dropout(h, cfg.hidden_dropout_prob, rngs.get("h2"), deterministic)
    x = _layer_norm(x + h, lp["ffn_ln"]["scale"], lp["ffn_ln"]["bias"],
                    cfg.layer_norm_eps, impl=cfg.ln_impl)
    return x


@partial(jax.jit, static_argnames=("cfg", "deterministic", "remat"))
def forward(params: Params, cfg: BertConfig, input_ids: jnp.ndarray,
            attention_mask: jnp.ndarray,
            token_type_ids: Optional[jnp.ndarray] = None,
            dropout_rng: Optional[jax.Array] = None,
            deterministic: bool = True, remat: bool = False) -> jnp.ndarray:
    """BERT encoder: token ids -> last hidden states [B, L, D].

    attention_mask: [B, L] with 1 for real tokens. Pad keys are excluded
    via an additive f32 bias; pad query rows are garbage and must be
    masked by the pooler (which `ops.pooling.mean_pool` does, matching
    src/contriever.py:46).
    """
    dt = cfg.compute_dtype
    B, L = input_ids.shape
    # accept narrow wire dtypes (uint16 ids / uint8 masks shrink the
    # host->device transfer 4x; see Trainer._device_batch) — widen once
    # here so downstream sums/cumsums can't overflow
    input_ids = input_ids.astype(jnp.int32)
    attention_mask = attention_mask.astype(jnp.int32)
    emb = params["embeddings"]

    x = emb["word"][input_ids]
    if cfg.position_style == "roberta":
        # XLM-R: position ids = pad_idx + cumsum(mask) on real tokens
        # (transformers create_position_ids_from_input_ids)
        pos_ids = (jnp.cumsum(attention_mask, axis=1) * attention_mask
                   + cfg.pad_token_id)
        x = x + emb["position"][pos_ids]
    else:
        x = x + emb["position"][jnp.arange(L)][None, :, :]
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)
    x = x + emb["token_type"][token_type_ids]
    x = _layer_norm(x.astype(dt), emb["ln"]["scale"], emb["ln"]["bias"],
                    cfg.layer_norm_eps, impl=cfg.ln_impl)

    if dropout_rng is not None and not deterministic:
        emb_rng, layer_rng = jax.random.split(dropout_rng)
    else:
        emb_rng = layer_rng = None
    x = _dropout(x, cfg.hidden_dropout_prob, emb_rng, deterministic)

    # additive attention bias on keys, [B, L] (expanded per impl)
    neg = jnp.asarray(-1e30, jnp.float32)
    bias = jnp.where(attention_mask.astype(bool), 0.0, neg)

    # pair packing (see BertConfig.attention_pack_pairs): run the whole
    # layer stack on [B/2, 2L, D] — every op in the layer is row-local
    # except attention, which the fused kernel keeps block-diagonal via
    # the segmented [B/2, 2, L] bias. The reshapes are layout-free.
    pack = (cfg.attention_pack_pairs and cfg.attention_impl == "flash_block"
            and B % 2 == 0 and L % 8 == 0 and L % 128 != 0)
    if pack:
        x = x.reshape(B // 2, 2 * L, -1)
        bias = bias.reshape(B // 2, 2, L)

    x = _run_layers(params, cfg, x, bias, layer_rng, deterministic, remat)
    return x.reshape(B, L, -1) if pack else x


def _run_layers(params, cfg: BertConfig, x, bias, layer_rng,
                deterministic, remat):
    """Run the layer stack (scan or Python loop, optional remat) —
    shared by ``forward`` and ``forward_packed``."""

    def body(carry, lp_and_i):
        h = carry
        lp, i = lp_and_i
        if layer_rng is not None:
            lr = jax.random.fold_in(layer_rng, i)
            rngs = dict(zip(("attn", "h1", "h2"), jax.random.split(lr, 3)))
        else:
            rngs = {}
        h = _encoder_layer(cfg, h, bias, lp, rngs, deterministic)
        return h, None

    if remat == "dots":
        # selective remat: keep matmul outputs + the flash kernel's
        # softmax stats, recompute elementwise (LN, gelu, dropout) in
        # the backward — near-no-remat FLOPs at a fraction of the
        # saved-activation memory. Saving the tiny (m, l) stats means
        # the attention backward runs without re-executing the forward
        # kernel (its other residuals, q/k/v, are dot outputs and thus
        # already saved). Saving the full attention OUTPUT instead
        # measured slightly slower: [B,L,D] extra HBM writes cost more
        # than the kernel re-forward they avoid.
        body = jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.save_from_both_policies(
                jax.checkpoint_policies.dots_saveable,
                jax.checkpoint_policies.save_only_these_names(
                    "flash_stats")))
    elif remat:
        body = jax.checkpoint(body)

    if not cfg.scan_layers:
        # Python loop: per-layer residuals stay standalone buffers (no
        # scan stacking DUS); numerics identical to the scan — same
        # per-layer rng fold_in, same kernels, static layer indices
        for i in range(cfg.num_hidden_layers):
            lp = jax.tree.map(lambda a: a[i], params["layers"])
            x, _ = body(x, (lp, jnp.int32(i)))
        return x

    layer_idx = jnp.arange(cfg.num_hidden_layers)
    x, _ = jax.lax.scan(body, x, (params["layers"], layer_idx),
                        unroll=cfg.scan_unroll)
    return x


@partial(jax.jit, static_argnames=("cfg", "deterministic", "remat"))
def forward_packed(params: Params, cfg: BertConfig,
                   input_ids: jnp.ndarray, seg_ids: jnp.ndarray,
                   pos_ids: jnp.ndarray,
                   dropout_rng: Optional[jax.Array] = None,
                   deterministic: bool = True,
                   remat: bool = False) -> jnp.ndarray:
    """BERT encoder on a length-packed layout -> hidden [Bp, R, D].

    input_ids/seg_ids/pos_ids: [Bp, R] from data/packing.py — several
    variable-length crops concatenated per row block. seg_ids carry the
    global crop index (-1 = padding) and drive the block-diagonal
    attention mask (fused kernel: ops/attention_block.py int mode; XLA
    fallback: the seg-compare additive bias in _encoder_layer); pos_ids
    restart at 0 per crop so position embeddings match the unpacked
    encoder exactly. Pool with ops.pooling.segment_mean_pool. Packing
    exists because the recipe's crops average ~80 real tokens against a
    136-column static pad — see data/packing.py for the why."""
    # the plain flash kernel has no segment-mask mode, so "auto"/"flash"
    # would silently fall back to naive XLA attention (materialized
    # [B, R, R] scores) on packed inputs — route them to the fused
    # block kernel, which handles seg-id masks natively. Explicit
    # "naive" stays naive (CPU tests / debugging).
    if (cfg.attention_impl in ("auto", "flash")
            and jax.default_backend() == "tpu"):
        cfg = dataclasses.replace(cfg, attention_impl="flash_block")
    dt = cfg.compute_dtype
    input_ids = input_ids.astype(jnp.int32)
    seg_ids = seg_ids.astype(jnp.int32)
    pos_ids = pos_ids.astype(jnp.int32)
    emb = params["embeddings"]

    x = emb["word"][input_ids] + emb["position"][pos_ids]
    x = x + emb["token_type"][jnp.zeros_like(input_ids)]
    x = _layer_norm(x.astype(dt), emb["ln"]["scale"], emb["ln"]["bias"],
                    cfg.layer_norm_eps, impl=cfg.ln_impl)

    if dropout_rng is not None and not deterministic:
        emb_rng, layer_rng = jax.random.split(dropout_rng)
    else:
        emb_rng = layer_rng = None
    x = _dropout(x, cfg.hidden_dropout_prob, emb_rng, deterministic)

    return _run_layers(params, cfg, x, seg_ids, layer_rng, deterministic,
                       remat)


def num_params(params: Params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))

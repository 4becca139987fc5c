"""MarianMT encoder-decoder (cs<->en translator).

The reference's throughput pipeline translates Czech to English with
``Helsinki-NLP/opus-mt-cs-en`` before encoding
(/root/reference/eval_throughput.py:55-211, src/options.py:133-135
``translator_model_id``). This is the TPU-native model family for that
role: a functional Marian transformer (post-LN, static sinusoidal
positions, silu FFN, tied embeddings + final logits bias) with

  * teacher-forced forward for scoring/training,
  * greedy decoding under ``lax.scan`` with a static-shape KV cache —
    one compiled program regardless of how early sequences finish
    (finished rows keep writing pad).

Weight interop loads HF ``MarianMTModel`` checkpoints from a local
directory. Differential tests pin parity against transformers
(tests/test_marian.py).
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclass(frozen=True)
class MarianConfig:
    vocab_size: int = 58101
    d_model: int = 512
    encoder_layers: int = 6
    decoder_layers: int = 6
    encoder_attention_heads: int = 8
    decoder_attention_heads: int = 8
    encoder_ffn_dim: int = 2048
    decoder_ffn_dim: int = 2048
    max_position_embeddings: int = 512
    pad_token_id: int = 58100
    eos_token_id: int = 0
    decoder_start_token_id: int = 58100   # Marian: pad starts decoding
    scale_embedding: bool = True          # sqrt(d_model) embed scale
    dtype: str = "float32"

    @property
    def head_dim(self) -> int:
        return self.d_model // self.encoder_attention_heads

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @classmethod
    def from_hf_dict(cls, d: dict) -> "MarianConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    @classmethod
    def tiny(cls, **kw) -> "MarianConfig":
        base = dict(vocab_size=99, d_model=32, encoder_layers=2,
                    decoder_layers=2, encoder_attention_heads=4,
                    decoder_attention_heads=4, encoder_ffn_dim=64,
                    decoder_ffn_dim=64, max_position_embeddings=64,
                    pad_token_id=98, eos_token_id=0,
                    decoder_start_token_id=98)
        base.update(kw)
        return cls(**base)


def sinusoidal_positions(n_pos: int, dim: int) -> np.ndarray:
    """Marian's static table: sin in the first dim//2 columns, cos in
    the rest (transformers MarianSinusoidalPositionalEmbedding)."""
    position_enc = np.array(
        [[pos / np.power(10000, 2 * (j // 2) / dim) for j in range(dim)]
         for pos in range(n_pos)], dtype=np.float32)
    out = np.zeros((n_pos, dim), np.float32)
    sentinel = dim // 2 + dim % 2
    out[:, :sentinel] = np.sin(position_enc[:, 0::2])
    out[:, sentinel:] = np.cos(position_enc[:, 1::2])
    return out


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _attn_params(rng, d, std=0.02):
    ks = jax.random.split(rng, 4)
    def w(k):
        return jax.random.normal(k, (d, d), jnp.float32) * std
    return {"q_kernel": w(ks[0]), "q_bias": jnp.zeros((d,), jnp.float32),
            "k_kernel": w(ks[1]), "k_bias": jnp.zeros((d,), jnp.float32),
            "v_kernel": w(ks[2]), "v_bias": jnp.zeros((d,), jnp.float32),
            "o_kernel": w(ks[3]), "o_bias": jnp.zeros((d,), jnp.float32)}


def _ln(d):
    return {"scale": jnp.ones((d,), jnp.float32),
            "bias": jnp.zeros((d,), jnp.float32)}


def init_params(rng: jax.Array, cfg: MarianConfig) -> Params:
    d, std = cfg.d_model, 0.02
    keys = jax.random.split(rng, 3 + cfg.encoder_layers + cfg.decoder_layers)
    params: Params = {
        "shared_embedding": jax.random.normal(
            keys[0], (cfg.vocab_size, d), jnp.float32) * std,
        "final_logits_bias": jnp.zeros((cfg.vocab_size,), jnp.float32),
        "encoder_layers": [],
        "decoder_layers": [],
    }
    for i in range(cfg.encoder_layers):
        ks = jax.random.split(keys[3 + i], 3)
        params["encoder_layers"].append({
            "self_attn": _attn_params(ks[0], d), "self_ln": _ln(d),
            "fc1_kernel": jax.random.normal(
                ks[1], (d, cfg.encoder_ffn_dim), jnp.float32) * std,
            "fc1_bias": jnp.zeros((cfg.encoder_ffn_dim,), jnp.float32),
            "fc2_kernel": jax.random.normal(
                ks[2], (cfg.encoder_ffn_dim, d), jnp.float32) * std,
            "fc2_bias": jnp.zeros((d,), jnp.float32),
            "final_ln": _ln(d)})
    for i in range(cfg.decoder_layers):
        ks = jax.random.split(keys[3 + cfg.encoder_layers + i], 4)
        params["decoder_layers"].append({
            "self_attn": _attn_params(ks[0], d), "self_ln": _ln(d),
            "cross_attn": _attn_params(ks[1], d), "cross_ln": _ln(d),
            "fc1_kernel": jax.random.normal(
                ks[2], (d, cfg.decoder_ffn_dim), jnp.float32) * std,
            "fc1_bias": jnp.zeros((cfg.decoder_ffn_dim,), jnp.float32),
            "fc2_kernel": jax.random.normal(
                ks[3], (cfg.decoder_ffn_dim, d), jnp.float32) * std,
            "fc2_bias": jnp.zeros((d,), jnp.float32),
            "final_ln": _ln(d)})
    return params


# ---------------------------------------------------------------------------
# forward pieces
# ---------------------------------------------------------------------------

def _layer_norm(x, p, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = jnp.square(x32 - mu).mean(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * p["scale"]
            + p["bias"]).astype(x.dtype)


def _mha(q_in, kv_in, p, heads, bias):
    """q_in [B,Lq,D], kv_in [B,Lk,D], bias additive f32 [B,1,Lq,Lk] or
    broadcastable. Returns [B,Lq,D]."""
    B, Lq, D = q_in.shape
    hd = D // heads
    scale = hd ** -0.5

    def proj(x, k, b):
        return jnp.dot(x, p[k]) + p[b]

    # HF Bart/Marian scales the query before the dot product
    q = (proj(q_in, "q_kernel", "q_bias") * scale).reshape(
        B, Lq, heads, hd)
    k = proj(kv_in, "k_kernel", "k_bias").reshape(B, -1, heads, hd)
    v = proj(kv_in, "v_kernel", "v_bias").reshape(B, -1, heads, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) + bias
    a = jax.nn.softmax(s, axis=-1).astype(q_in.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(B, Lq, D)
    return jnp.dot(ctx, p["o_kernel"]) + p["o_bias"]


def _key_bias(mask):
    return jnp.where(mask[:, None, None, :].astype(bool), 0.0, -1e9
                     ).astype(jnp.float32)


def _ffn(x, lp):
    h = jax.nn.silu(jnp.dot(x, lp["fc1_kernel"]) + lp["fc1_bias"])
    return jnp.dot(h, lp["fc2_kernel"]) + lp["fc2_bias"]


def _embed(params, cfg, ids):
    x = params["shared_embedding"][ids].astype(cfg.compute_dtype)
    if cfg.scale_embedding:
        x = x * math.sqrt(cfg.d_model)
    pos = sinusoidal_positions(cfg.max_position_embeddings, cfg.d_model)
    return x + jnp.asarray(pos)[None, :ids.shape[1]].astype(x.dtype)


def encode(params: Params, cfg: MarianConfig, input_ids, attention_mask):
    """Encoder: [B, L] -> last hidden [B, L, D]."""
    x = _embed(params, cfg, input_ids)
    bias = _key_bias(attention_mask)
    for lp in params["encoder_layers"]:
        a = _mha(x, x, lp["self_attn"], cfg.encoder_attention_heads, bias)
        x = _layer_norm(x + a, lp["self_ln"])
        x = _layer_norm(x + _ffn(x, lp), lp["final_ln"])
    return x


def decode(params: Params, cfg: MarianConfig, decoder_ids, enc_out,
           enc_mask, decoder_mask=None):
    """Teacher-forced decoder: [B, T] -> logits [B, T, V]."""
    B, T = decoder_ids.shape
    x = _embed(params, cfg, decoder_ids)
    causal = jnp.tril(jnp.ones((T, T), bool))[None, None]
    self_bias = jnp.where(causal, 0.0, -1e9).astype(jnp.float32)
    if decoder_mask is not None:
        self_bias = self_bias + _key_bias(decoder_mask)
    cross_bias = _key_bias(enc_mask)
    for lp in params["decoder_layers"]:
        a = _mha(x, x, lp["self_attn"], cfg.decoder_attention_heads,
                 self_bias)
        x = _layer_norm(x + a, lp["self_ln"])
        c = _mha(x, enc_out, lp["cross_attn"],
                 cfg.decoder_attention_heads, cross_bias)
        x = _layer_norm(x + c, lp["cross_ln"])
        x = _layer_norm(x + _ffn(x, lp), lp["final_ln"])
    logits = jnp.dot(x.astype(jnp.float32),
                     params["shared_embedding"].astype(jnp.float32).T)
    return logits + params["final_logits_bias"]


@partial(jax.jit, static_argnames=("cfg", "max_new_tokens"))
def greedy_generate(params: Params, cfg: MarianConfig, input_ids,
                    attention_mask, max_new_tokens: int = 64
                    ) -> jnp.ndarray:
    """Greedy decode with a static-shape cache-free formulation: each
    step re-decodes the growing prefix inside a ``lax.scan`` over a
    fixed [B, max_new_tokens] buffer (one compile, finished rows emit
    pad). Simple and correct; a KV-cached variant is a follow-up
    optimization — at translator sizes the re-decode is matmul-bound
    and still TPU-fast."""
    B = input_ids.shape[0]
    enc_out = encode(params, cfg, input_ids, attention_mask)
    buf = jnp.full((B, max_new_tokens + 1), cfg.pad_token_id, jnp.int32)
    buf = buf.at[:, 0].set(cfg.decoder_start_token_id)

    def step(carry, t):
        buf, done = carry
        # teacher-forced pass over the full buffer; take position t
        logits = decode(params, cfg, buf, enc_out, attention_mask)
        nxt = jnp.argmax(logits[:, t], axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, cfg.pad_token_id, nxt)
        buf = buf.at[:, t + 1].set(nxt)
        done = done | (nxt == cfg.eos_token_id)
        return (buf, done), None

    (buf, _), _ = jax.lax.scan(step, (buf, jnp.zeros((B,), bool)),
                               jnp.arange(max_new_tokens))
    return buf[:, 1:]


# ---------------------------------------------------------------------------
# HF interop
# ---------------------------------------------------------------------------

def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                      else t)


def params_from_state_dict(sd: Dict[str, Any], cfg: MarianConfig) -> Params:
    """transformers MarianMTModel state dict -> param pytree."""
    sd = {k.removeprefix("model."): _np(v) for k, v in sd.items()}
    params: Params = {
        "shared_embedding": sd["shared.weight"].astype(np.float32),
        "final_logits_bias": sd.get(
            "final_logits_bias",
            np.zeros((cfg.vocab_size,), np.float32)).reshape(-1)
        .astype(np.float32),
        "encoder_layers": [], "decoder_layers": [],
    }

    def attn(prefix):
        return {
            "q_kernel": sd[f"{prefix}.q_proj.weight"].T.astype(np.float32),
            "q_bias": sd[f"{prefix}.q_proj.bias"].astype(np.float32),
            "k_kernel": sd[f"{prefix}.k_proj.weight"].T.astype(np.float32),
            "k_bias": sd[f"{prefix}.k_proj.bias"].astype(np.float32),
            "v_kernel": sd[f"{prefix}.v_proj.weight"].T.astype(np.float32),
            "v_bias": sd[f"{prefix}.v_proj.bias"].astype(np.float32),
            "o_kernel": sd[f"{prefix}.out_proj.weight"].T.astype(np.float32),
            "o_bias": sd[f"{prefix}.out_proj.bias"].astype(np.float32)}

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"].astype(np.float32),
                "bias": sd[f"{prefix}.bias"].astype(np.float32)}

    for i in range(cfg.encoder_layers):
        p = f"encoder.layers.{i}"
        params["encoder_layers"].append({
            "self_attn": attn(f"{p}.self_attn"),
            "self_ln": ln(f"{p}.self_attn_layer_norm"),
            "fc1_kernel": sd[f"{p}.fc1.weight"].T.astype(np.float32),
            "fc1_bias": sd[f"{p}.fc1.bias"].astype(np.float32),
            "fc2_kernel": sd[f"{p}.fc2.weight"].T.astype(np.float32),
            "fc2_bias": sd[f"{p}.fc2.bias"].astype(np.float32),
            "final_ln": ln(f"{p}.final_layer_norm")})
    for i in range(cfg.decoder_layers):
        p = f"decoder.layers.{i}"
        params["decoder_layers"].append({
            "self_attn": attn(f"{p}.self_attn"),
            "self_ln": ln(f"{p}.self_attn_layer_norm"),
            "cross_attn": attn(f"{p}.encoder_attn"),
            "cross_ln": ln(f"{p}.encoder_attn_layer_norm"),
            "fc1_kernel": sd[f"{p}.fc1.weight"].T.astype(np.float32),
            "fc1_bias": sd[f"{p}.fc1.bias"].astype(np.float32),
            "fc2_kernel": sd[f"{p}.fc2.weight"].T.astype(np.float32),
            "fc2_bias": sd[f"{p}.fc2.bias"].astype(np.float32),
            "final_ln": ln(f"{p}.final_layer_norm")})
    return params


def load_hf_dir(model_dir: str) -> Tuple[Params, MarianConfig]:
    import json
    import os
    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = MarianConfig.from_hf_dict(json.load(f))
    st = os.path.join(model_dir, "model.safetensors")
    bn = os.path.join(model_dir, "pytorch_model.bin")
    if os.path.exists(st):
        from safetensors.numpy import load_file
        sd = load_file(st)
    elif os.path.exists(bn):
        import torch
        sd = torch.load(bn, map_location="cpu", weights_only=True)
    else:
        raise FileNotFoundError(f"no weights in {model_dir}")
    return params_from_state_dict(sd, cfg), cfg


@partial(jax.jit, static_argnames=("cfg", "num_beams", "max_new_tokens",
                                   "length_penalty"))
def beam_search_generate(params: Params, cfg: MarianConfig, input_ids,
                         attention_mask, num_beams: int = 4,
                         max_new_tokens: int = 64,
                         length_penalty: float = 1.0) -> jnp.ndarray:
    """Static-shape beam search matching HF's beam bookkeeping (the
    reference translates with ``num_beams=4, early_stopping=True``,
    eval_throughput.py:16):

      * per step: top 2*num_beams candidates over (beam, vocab);
      * EOS candidates ranked below num_beams enter the finished set
        (score = sum_logprobs / len(prefix)^length_penalty, HF
        BeamHypotheses.add); the rest refill the live beams in order;
      * early_stopping=True: a row freezes once num_beams hypotheses
        finished;
      * rows with no finished hypothesis fall back to the live beams
        (HF finalize);
      * decoding is KV-cached: one incremental decode_step per step over
        the flattened beam batch, with cache rows re-gathered to follow
        the surviving beams.

    Returns [B, max_new_tokens] token ids (pad after EOS).
    """
    B = input_ids.shape[0]
    nb, T = num_beams, max_new_tokens
    V = cfg.vocab_size
    NEG = jnp.float32(-1e9)
    rows = jnp.arange(B)

    enc = encode(params, cfg, input_ids, attention_mask)
    enc_b = jnp.repeat(enc, nb, axis=0)                   # [B*nb, L, D]
    mask_b = jnp.repeat(attention_mask, nb, axis=0)

    buf = jnp.full((B, nb, T + 1), cfg.pad_token_id, jnp.int32)
    buf = buf.at[:, :, 0].set(cfg.decoder_start_token_id)
    beam_scores = jnp.full((B, nb), NEG).at[:, 0].set(0.0)

    fin_seqs = jnp.full((B, nb, T + 1), cfg.pad_token_id, jnp.int32)
    fin_scores = jnp.full((B, nb), NEG)
    fin_count = jnp.zeros((B,), jnp.int32)
    # KV cache over the flattened beam batch; rows are re-gathered to
    # follow each step's selected source beams
    kv = init_decode_cache(params, cfg, enc_b, B * nb, T + 1)

    def step(carry, t):
        buf, beam_scores, fin_seqs, fin_scores, fin_count, kv = carry
        done_row = fin_count >= nb                        # early_stopping

        last_tok = jnp.take_along_axis(
            buf, jnp.full((B, nb, 1), t, jnp.int32), axis=2)[:, :, 0]
        logits, kv = decode_step(params, cfg,
                                 last_tok.reshape(B * nb), t, kv, mask_b)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        cand = beam_scores[:, :, None] + logp.reshape(B, nb, V)
        top_v, top_i = jax.lax.top_k(cand.reshape(B, nb * V), 2 * nb)
        toks = (top_i % V).astype(jnp.int32)              # [B, 2nb]
        srcs = (top_i // V).astype(jnp.int32)

        def fill(fc, xs):
            (nbuf, nscores, nfilled, f_seqs, f_scores, f_count,
             nsrc) = fc
            rank, cv, ct, cs = xs                         # [B] each
            prefix = buf[rows, cs]                        # [B, T+1]
            is_eos = ct == cfg.eos_token_id

            # finished insert (HF: only EOS candidates ranked < nb;
            # BeamHypotheses.add replaces the worst stored hypothesis
            # when the set is full and the candidate scores higher)
            f_new = cv / (jnp.float32(t + 1) ** length_penalty)
            worst = jnp.argmin(f_scores, axis=1)
            full = f_count >= nb
            slot = jnp.where(full, worst, jnp.clip(f_count, 0, nb - 1))
            better = f_new > f_scores[rows, worst]
            can_fin = (is_eos & (rank < nb) & ~done_row
                       & (~full | better))
            write = can_fin[:, None] & (jnp.arange(nb)[None]
                                        == slot[:, None])
            f_seqs = jnp.where(write[:, :, None], prefix[:, None, :],
                               f_seqs)
            f_scores = jnp.where(write, f_new[:, None], f_scores)
            f_count = jnp.minimum(f_count + can_fin.astype(jnp.int32),
                                  nb)

            # live-beam refill with non-EOS candidates, in rank order
            place = (~is_eos) & (nfilled < nb) & ~done_row
            pslot = jnp.clip(nfilled, 0, nb - 1)
            new_row = prefix.at[rows, t + 1].set(ct)
            sel = place[:, None] & (jnp.arange(nb)[None]
                                    == pslot[:, None])
            nbuf = jnp.where(sel[:, :, None], new_row[:, None, :], nbuf)
            nscores = jnp.where(sel, cv[:, None], nscores)
            nsrc = jnp.where(sel, cs[:, None], nsrc)
            nfilled = nfilled + place.astype(jnp.int32)
            return (nbuf, nscores, nfilled, f_seqs, f_scores,
                    f_count, nsrc), None

        init = (buf, beam_scores, jnp.zeros((B,), jnp.int32),
                fin_seqs, fin_scores, fin_count,
                jnp.zeros((B, nb), jnp.int32))
        ranks = jnp.broadcast_to(jnp.arange(2 * nb)[:, None], (2 * nb, B))
        (nbuf, nscores, _, fin_seqs, fin_scores, fin_count, nsrc), _ = \
            jax.lax.scan(fill, init, (ranks, top_v.T, toks.T, srcs.T))

        buf = jnp.where(done_row[:, None, None], buf, nbuf)
        beam_scores = jnp.where(done_row[:, None], beam_scores, nscores)

        # re-gather cache rows to follow the surviving beams. nsrc[b, j]
        # is the source beam of new beam j (frozen rows keep identity).
        ident = jnp.broadcast_to(jnp.arange(nb)[None], (B, nb))
        gather_src = jnp.where(done_row[:, None], ident, nsrc)
        flat_idx = (jnp.arange(B)[:, None] * nb + gather_src).reshape(-1)
        kv = [{"self_k": lc["self_k"][flat_idx],
               "self_v": lc["self_v"][flat_idx],
               "cross_k": lc["cross_k"], "cross_v": lc["cross_v"]}
              for lc in kv]
        return (buf, beam_scores, fin_seqs, fin_scores, fin_count,
                kv), None

    carry = (buf, beam_scores, fin_seqs, fin_scores, fin_count, kv)
    (buf, beam_scores, fin_seqs, fin_scores, fin_count, _), _ = \
        jax.lax.scan(step, carry, jnp.arange(T))

    # finalize: rows with no finished hypothesis use the best live beam
    live_score = beam_scores / (jnp.float32(T + 1) ** length_penalty)
    best_fin = jnp.argmax(fin_scores, axis=1)
    best_live = jnp.argmax(live_score, axis=1)
    out = jnp.where((fin_count == 0)[:, None],
                    buf[rows, best_live], fin_seqs[rows, best_fin])
    return out[:, 1:]


# ---------------------------------------------------------------------------
# KV-cached incremental decoding
# ---------------------------------------------------------------------------

def _mha_proj_kv(kv_in, p, heads):
    B = kv_in.shape[0]
    D = p["k_kernel"].shape[1]
    hd = D // heads
    k = (jnp.dot(kv_in, p["k_kernel"]) + p["k_bias"]).reshape(
        B, -1, heads, hd)
    v = (jnp.dot(kv_in, p["v_kernel"]) + p["v_bias"]).reshape(
        B, -1, heads, hd)
    return k, v


def init_decode_cache(params: Params, cfg: MarianConfig, enc_out,
                      batch: int, max_len: int):
    """Pre-compute cross-attention K/V once per layer and allocate the
    self-attention ring buffers."""
    heads = cfg.decoder_attention_heads
    hd = cfg.d_model // heads
    cache = []
    for lp in params["decoder_layers"]:
        ck, cv = _mha_proj_kv(enc_out, lp["cross_attn"], heads)
        ck = ck.astype(cfg.compute_dtype)
        cv = cv.astype(cfg.compute_dtype)
        cache.append({
            "self_k": jnp.zeros((batch, max_len, heads, hd),
                                cfg.compute_dtype),
            "self_v": jnp.zeros((batch, max_len, heads, hd),
                                cfg.compute_dtype),
            "cross_k": ck, "cross_v": cv,
        })
    return cache


def decode_step(params: Params, cfg: MarianConfig, tok, t, cache,
                enc_mask):
    """One incremental decoder step: tok [B] int32 at position t.
    Returns (logits [B, V], updated cache). Attention over cached keys
    with positions > t masked."""
    heads = cfg.decoder_attention_heads
    hd = cfg.d_model // heads
    B = tok.shape[0]
    x = _embed_at(params, cfg, tok, t)                   # [B, 1, D]
    new_cache = []
    Tc = cache[0]["self_k"].shape[1]
    pos_ok = (jnp.arange(Tc)[None, :] <= t)              # [1, Tc]
    self_bias = jnp.where(pos_ok, 0.0, -1e9
                          ).astype(jnp.float32)[:, None, None, :]
    cross_bias = _key_bias(enc_mask)
    scale = hd ** -0.5
    for lp, lc in zip(params["decoder_layers"], cache):
        p = lp["self_attn"]
        q = ((jnp.dot(x, p["q_kernel"]) + p["q_bias"]) * scale
             ).reshape(B, 1, heads, hd)
        k_new = (jnp.dot(x, p["k_kernel"]) + p["k_bias"]).reshape(
            B, 1, heads, hd).astype(lc["self_k"].dtype)
        v_new = (jnp.dot(x, p["v_kernel"]) + p["v_bias"]).reshape(
            B, 1, heads, hd).astype(lc["self_v"].dtype)
        sk = jax.lax.dynamic_update_slice(lc["self_k"], k_new,
                                          (0, t, 0, 0))
        sv = jax.lax.dynamic_update_slice(lc["self_v"], v_new,
                                          (0, t, 0, 0))
        s = jnp.einsum("bqhd,bkhd->bhqk", q, sk,
                       preferred_element_type=jnp.float32) + self_bias
        a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", a, sv).reshape(B, 1, -1)
        attn = jnp.dot(ctx, p["o_kernel"]) + p["o_bias"]
        x = _layer_norm(x + attn, lp["self_ln"])

        pc = lp["cross_attn"]
        qc = ((jnp.dot(x, pc["q_kernel"]) + pc["q_bias"]) * scale
              ).reshape(B, 1, heads, hd)
        s = jnp.einsum("bqhd,bkhd->bhqk", qc, lc["cross_k"],
                       preferred_element_type=jnp.float32) + cross_bias
        a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", a, lc["cross_v"]
                         ).reshape(B, 1, -1)
        cross = jnp.dot(ctx, pc["o_kernel"]) + pc["o_bias"]
        x = _layer_norm(x + cross, lp["cross_ln"])
        x = _layer_norm(x + _ffn(x, lp), lp["final_ln"])
        new_cache.append({"self_k": sk, "self_v": sv,
                          "cross_k": lc["cross_k"],
                          "cross_v": lc["cross_v"]})
    logits = jnp.dot(x[:, 0].astype(jnp.float32),
                     params["shared_embedding"].astype(jnp.float32).T)
    return logits + params["final_logits_bias"], new_cache


def _embed_at(params, cfg, tok, t):
    x = params["shared_embedding"][tok][:, None, :].astype(
        cfg.compute_dtype)
    if cfg.scale_embedding:
        x = x * math.sqrt(cfg.d_model)
    pos = jnp.asarray(sinusoidal_positions(
        cfg.max_position_embeddings, cfg.d_model))
    return x + jax.lax.dynamic_slice_in_dim(pos, t, 1, axis=0
                                            )[None].astype(x.dtype)


@partial(jax.jit, static_argnames=("cfg", "max_new_tokens"))
def greedy_generate_cached(params: Params, cfg: MarianConfig, input_ids,
                           attention_mask, max_new_tokens: int = 64
                           ) -> jnp.ndarray:
    """KV-cached greedy decode: O(T) attention work per step instead of
    the O(T^2) full-prefix re-decode in ``greedy_generate`` (kept as the
    equivalence oracle)."""
    B = input_ids.shape[0]
    enc_out = encode(params, cfg, input_ids, attention_mask)
    cache = init_decode_cache(params, cfg, enc_out, B, max_new_tokens + 1)

    def step(carry, t):
        tok, cache, done = carry
        logits, cache = decode_step(params, cfg, tok, t, cache,
                                    attention_mask)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, cfg.pad_token_id, nxt)
        done = done | (nxt == cfg.eos_token_id)
        return (nxt, cache, done), nxt

    start = jnp.full((B,), cfg.decoder_start_token_id, jnp.int32)
    _, out = jax.lax.scan(step, (start, cache, jnp.zeros((B,), bool)),
                          jnp.arange(max_new_tokens))
    return out.T  # [B, max_new_tokens]

"""Jitted contrastive train steps (InBatch + MoCo).

TPU-native rewrite of the reference hot loop
(/root/reference/train.py:256-327 + src/moco.py:296-353 +
src/inbatch.py:59-90). One call = one *optimizer* step:

  * the batch carries a leading accumulation axis [A, B, L]; microbatches
    run under ``lax.scan`` (replacing the Python accumulation loop,
    train.py:227-233,266) and gradients are **summed** across
    microbatches — the reference calls ``loss.backward()`` per microbatch
    without scaling (train.py:264), so parity requires the sum, not the
    mean.
  * the loss is written over the global batch; under pjit with B sharded
    on the mesh ``data`` axis, XLA inserts the all-gathers that the
    reference does by hand (src/dist_utils.py:7-37) — including the
    differentiable key gather for in-batch negatives.
  * MoCo per microbatch, in reference order (src/moco.py:296-338):
    encoder_q fwd (grad) -> EMA update of encoder_k (one fused tree_map
    replacing the per-param Python loop, src/moco.py:260-269) -> encoder_k
    fwd (stop-grad, dropout ON: the reference's train() puts encoder_k in
    train mode and the eval() branch at src/moco.py:316-317 never fires)
    -> queue logits + CE -> global-batch ring-buffer enqueue.
  * grad clip on the accumulated grads then AdamW + schedule, matching
    train.py:314-327 ordering.

Returned stats mirror iter_stats (loss/accuracy/stdq/stdk,
src/moco.py:343-351) plus grad_norm for observability parity
(train.py:295-309).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from czechtriever_tpu.models import bert
from czechtriever_tpu.models.contriever import encode, encode_packed
from czechtriever_tpu.ops import losses
from czechtriever_tpu.training.state import InBatchState, MoCoState

Batch = Dict[str, jnp.ndarray]
Stats = Dict[str, jnp.ndarray]


def encode_side(params, mcfg, cfg, mb: Batch, prefix: str, rng,
                deterministic: bool, normalize: bool) -> jnp.ndarray:
    """Encode one side (q or k) of a microbatch -> [N, D] embeddings.

    Dispatches on the batch layout: the presence of ``{prefix}_seg``
    marks a length-packed microbatch (data/packing.py: tokens/seg/pos
    [Bp, R] plus the [N] real-length vector whose static shape carries
    the crop count). Packing happens within the microbatch, so batch
    membership — and the loss at dropout 0 — is identical to the
    unpacked layout; only the padding FLOPs differ."""
    if f"{prefix}_seg" in mb:
        if cfg.pooling != "average":
            raise ValueError(
                f"packed batches support pooling='average' only, "
                f"got {cfg.pooling!r}")
        n_crops = mb[f"{prefix}_lens"].shape[-1]
        return encode_packed(
            params, mcfg, mb[f"{prefix}_tokens"], mb[f"{prefix}_seg"],
            mb[f"{prefix}_pos"], n_crops, dropout_rng=rng,
            normalize=normalize, deterministic=deterministic,
            remat=cfg.remat)
    return encode(params, mcfg, mb[f"{prefix}_tokens"],
                  mb[f"{prefix}_mask"], dropout_rng=rng,
                  deterministic=deterministic, normalize=normalize,
                  pooling_mode=cfg.pooling, remat=cfg.remat)


def global_norm(tree) -> jnp.ndarray:
    return optax.global_norm(tree)


def cast_layer_params(params, dtype) -> Any:
    """Cast the per-layer weights to the compute dtype ONCE per step.

    bert.py casts each kernel to bf16 inside the layer scan, so every
    pass over the encoder re-reads the f32 master weights from HBM and
    the scan AD accumulates the stacked per-layer weight gradients in
    f32 buffers (the profiler showed ~40 ms/step of f32
    dynamic-update-slice fusions at B=32 x accum 8). Differentiating
    w.r.t. an already-bf16 tree instead is numerically identical — the
    wgrad matmuls produce bf16-rounded values either way (the dots run
    with preferred_element_type = compute dtype) and the cast VJP is a
    plain upcast — but halves the weight-read traffic and makes the
    stacked grad buffers bf16. Gradients are then accumulated across
    microbatches into the f32 ``zeros_like(params)`` sum, and the
    optimizer still updates the f32 masters.

    Embeddings stay f32: their wgrad is a scatter-ADD over repeated
    token ids, where bf16 accumulation genuinely loses mantissa.

    LayerNorm scales/biases (attn_ln/ffn_ln) also stay f32: they are
    tiny (no wgrad-traffic win) and the mixed-precision convention keeps
    LN arithmetic in f32 on the XLA path (_layer_norm). The fused block
    kernels cast them to the compute dtype themselves either way.
    """
    if jnp.dtype(dtype) == jnp.float32:
        return params

    def cast(path, p):
        if any(getattr(k, "key", None) in ("attn_ln", "ffn_ln")
               for k in path):
            return p
        return p.astype(dtype)

    return {**params,
            "layers": jax.tree_util.tree_map_with_path(
                cast, params["layers"])}




def per_param_grad_norms(grads) -> Stats:
    """Per-parameter gradient norms (reference train.py:295-309 logs one
    scalar per named parameter). With scan-stacked layers each entry
    covers that parameter across all layers."""
    out: Stats = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(grads)[0]:
        name = ".".join(str(getattr(k, "key", k)) for k in path)
        out[f"grad_norms/{name}"] = jnp.sqrt(
            jnp.sum(jnp.square(leaf.astype(jnp.float32))))
    return out


def _mean_stats(stats: Stats) -> Stats:
    return {k: v.mean() for k, v in stats.items()}


def make_inbatch_step(cfg, mcfg: bert.BertConfig, tx) -> Callable:
    """Build the InBatch train step: (state, batch[A,B,L], rng) ->
    (state, stats)."""

    def train_step(state: InBatchState, batch: Batch,
                   rng: jax.Array) -> Tuple[InBatchState, Stats]:
        rng = jax.random.fold_in(rng, state.step)
        A = batch["q_tokens"].shape[0]
        micro_rngs = jax.random.split(rng, A)
        # differentiate w.r.t. the bf16 layer weights (see cast_layer_params)
        params_c = cast_layer_params(state.params, mcfg.compute_dtype)

        def loss_fn(params, mb, mrng):
            qr, kr = jax.random.split(mrng)
            q = encode_side(params, mcfg, cfg, mb, "q", qr,
                            deterministic=False, normalize=cfg.norm_query)
            k = encode_side(params, mcfg, cfg, mb, "k", kr,
                            deterministic=False, normalize=cfg.norm_doc)
            loss, stats = losses.inbatch_loss(q, k, cfg.temperature,
                                              cfg.label_smoothing)
            if state.init_params is not None:
                loss = loss + losses.l2_from_init_penalty(
                    params, state.init_params, cfg.weight_decay)
            return loss, stats

        def micro(grad_sum, xs):
            mb, mrng = xs
            (_, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params_c, mb, mrng)
            # f32 sum += bf16 microbatch grads (promoting add)
            grad_sum = jax.tree.map(jnp.add, grad_sum, grads)
            return grad_sum, stats

        zero_grads = jax.tree.map(jnp.zeros_like, state.params)
        mbs = {k: v for k, v in batch.items()}
        grads, stats = jax.lax.scan(micro, zero_grads, (mbs, micro_rngs))

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        out_stats = _mean_stats(stats)
        out_stats["grad_norm"] = global_norm(grads)
        if getattr(cfg, "log_param_grad_norms", False):
            out_stats.update(per_param_grad_norms(grads))
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), out_stats

    return train_step


def make_inbatch_gradcache_step(cfg, mcfg: bert.BertConfig, tx) -> Callable:
    """InBatch with gradient caching (Gao et al., "Scaling Deep
    Contrastive Learning Batch Size under Memory Limited Setup" /
    the dense-retriever gradient-accumulation method, arXiv:2406.12356):
    the InfoNCE is computed over the FULL target batch (A*B negatives
    instead of B), while activation memory stays at one microbatch:

      pass 1: encode all microbatches without building the backward;
      loss:   full-batch InfoNCE + grads w.r.t. the embeddings (cheap);
      pass 2: re-encode each microbatch (same dropout rngs) and pull the
              cached embedding cotangents through with jax.vjp.

    Beyond the reference: its gradient accumulation keeps each
    microbatch's loss local (train.py:227-266), so negatives never cross
    microbatches. Enable with contrastive_mode="inbatch_gradcache"."""

    def train_step(state: InBatchState, batch: Batch,
                   rng: jax.Array) -> Tuple[InBatchState, Stats]:
        rng = jax.random.fold_in(rng, state.step)
        A, B = batch["q_tokens"].shape[:2]
        micro_rngs = jax.random.split(rng, A)
        mbs = dict(batch)
        params_c = cast_layer_params(state.params, mcfg.compute_dtype)

        def enc_pair(params, mb, mrng):
            qr, kr = jax.random.split(mrng)
            q = encode_side(params, mcfg, cfg, mb, "q", qr,
                            deterministic=False, normalize=cfg.norm_query)
            k = encode_side(params, mcfg, cfg, mb, "k", kr,
                            deterministic=False, normalize=cfg.norm_doc)
            return q, k

        # pass 1: representation-only forward
        def fwd_micro(_, xs):
            mb, mrng = xs
            return None, enc_pair(params_c, mb, mrng)

        _, (qs, ks) = jax.lax.scan(fwd_micro, None, (mbs, micro_rngs))
        D = qs.shape[-1]
        qall, kall = qs.reshape(A * B, D), ks.reshape(A * B, D)

        def emb_loss(qa, ka):
            loss, stats = losses.inbatch_loss(qa, ka, cfg.temperature,
                                              cfg.label_smoothing)
            return loss, stats

        (_, stats), (gq, gk) = jax.value_and_grad(
            emb_loss, argnums=(0, 1), has_aux=True)(qall, kall)
        gq = gq.reshape(A, B, D)
        gk = gk.reshape(A, B, D)

        # pass 2: same forwards under vjp, pull cached cotangents through
        def bwd_micro(grad_sum, xs):
            mb, mrng, gqi, gki = xs
            _, vjp_fn = jax.vjp(
                lambda p: enc_pair(p, mb, mrng), params_c)
            (g,) = vjp_fn((gqi, gki))
            return jax.tree.map(jnp.add, grad_sum, g), None

        zero_grads = jax.tree.map(jnp.zeros_like, state.params)
        grads, _ = jax.lax.scan(bwd_micro, zero_grads,
                                (mbs, micro_rngs, gq, gk))
        if state.init_params is not None:
            pen_g = jax.grad(losses.l2_from_init_penalty)(
                state.params, state.init_params, cfg.weight_decay)
            grads = jax.tree.map(jnp.add, grads, pen_g)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        out_stats = dict(stats)
        out_stats["grad_norm"] = global_norm(grads)
        if getattr(cfg, "log_param_grad_norms", False):
            out_stats.update(per_param_grad_norms(grads))
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), out_stats

    return train_step


def make_moco_step(cfg, mcfg: bert.BertConfig, tx) -> Callable:
    """Build the MoCo train step: (state, batch[A,B,L], rng) ->
    (state, stats)."""
    momentum = cfg.momentum
    # ema_every_step hoists the EMA out of the microbatch scan: one
    # update with momentum^A per optimizer step instead of A updates of
    # momentum each. Since params_q is constant within a step the final
    # key params are IDENTICAL; the approximation is that microbatch i
    # encodes keys with k_A instead of k_i (relative deviation <=
    # A*(1-m), ~0.4% at the reference recipe). Off by default — the
    # reference updates per forward (src/moco.py:260-269).
    ema_every_step = bool(getattr(cfg, "ema_every_step", False))

    # key-encoder dropout: True = reference's actual training behavior
    # (encoder_k stays in train mode, the eval() branch at
    # src/moco.py:316-317 is dead); False = deterministic key encoder,
    # what --no-moco_train_mode_encoder_k asks for (see config.py)
    k_dropout = bool(getattr(cfg, "moco_train_mode_encoder_k", True))

    def train_step(state: MoCoState, batch: Batch,
                   rng: jax.Array) -> Tuple[MoCoState, Stats]:
        rng = jax.random.fold_in(rng, state.step)
        A = batch["q_tokens"].shape[0]
        micro_rngs = jax.random.split(rng, A)
        params_qc = cast_layer_params(state.params_q, mcfg.compute_dtype)

        params_k_step = None
        if ema_every_step:
            m_eff = momentum ** A
            params_k_step = jax.tree.map(
                lambda pk, pq: pk * m_eff + pq * (1.0 - m_eff),
                state.params_k, state.params_q)

        def loss_fn(params_q, k, queue, mb, qr):
            q = encode_side(params_q, mcfg, cfg, mb, "q", qr,
                            deterministic=False, normalize=cfg.norm_query)
            loss, stats = losses.moco_loss(q, k, queue, cfg.temperature,
                                           cfg.label_smoothing)
            if state.init_params is not None:
                loss = loss + losses.l2_from_init_penalty(
                    params_q, state.init_params, cfg.weight_decay)
            return loss, stats

        def micro(carry, xs):
            params_k, queue, ptr, grad_sum = carry
            mb, mrng = xs
            qr, kr = jax.random.split(mrng)

            if ema_every_step:
                params_k = params_k_step
            else:
                # EMA key-encoder update: k <- m*k + (1-m)*q
                # (src/moco.py:260-269)
                params_k = jax.tree.map(
                    lambda pk, pq: pk * momentum + pq * (1.0 - momentum),
                    params_k, state.params_q)

            # key features: stop-grad; dropout per moco_train_mode_encoder_k
            k = encode_side(params_k, mcfg, cfg, mb, "k", kr,
                            deterministic=not k_dropout,
                            normalize=cfg.norm_doc)
            k = jax.lax.stop_gradient(k)

            (_, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params_qc, k, queue, mb, qr)
            grad_sum = jax.tree.map(jnp.add, grad_sum, grads)

            # enqueue the *global* key batch (src/moco.py:272-287; the
            # cross-rank gather is implicit under pjit)
            queue, ptr = losses.queue_update(queue, ptr, k)
            return (params_k, queue, ptr, grad_sum), stats

        zero_grads = jax.tree.map(jnp.zeros_like, state.params_q)
        carry = (state.params_k, state.queue, state.queue_ptr, zero_grads)
        (params_k, queue, ptr, grads), stats = jax.lax.scan(
            micro, carry, (dict(batch), micro_rngs))

        updates, opt_state = tx.update(grads, state.opt_state, state.params_q)
        params_q = optax.apply_updates(state.params_q, updates)
        out_stats = _mean_stats(stats)
        out_stats["grad_norm"] = global_norm(grads)
        if getattr(cfg, "log_param_grad_norms", False):
            out_stats.update(per_param_grad_norms(grads))
        return state.replace(step=state.step + 1, params_q=params_q,
                             params_k=params_k, opt_state=opt_state,
                             queue=queue, queue_ptr=ptr), out_stats

    return train_step


def add_accum_axis(batch: Batch, accum: int) -> Batch:
    """Reshape a flat [A*B, L] host batch into [A, B, L] microbatches."""
    def r(x):
        ab = x.shape[0]
        assert ab % accum == 0, f"batch {ab} not divisible by accum {accum}"
        return x.reshape(accum, ab // accum, *x.shape[1:])
    return {k: r(v) for k, v in batch.items()}

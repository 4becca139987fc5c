"""Fused attention *block* kernel (experimental, opt-in).

One Pallas program per batch element computes the ENTIRE post-attention
half of a BERT layer in VMEM:

    ctx  = MHA(q, k, v, bias, attn-dropout)        (ops/attention.py math)
    attn = ctx @ Wo + bo
    h    = dropout(attn)
    z    = x + h
    y    = LayerNorm(z) * scale + ln_bias

vs. the default path (flash_attention kernel + XLA out-proj + XLA
dropout/residual/LN chain), this removes the ctx round-trip through HBM
and the separate LayerNorm reduce fusion — the two items the step
profile attributes ~10% of the train step to. The price is moving the
out-projection matmul and the LN lane reductions inside Mosaic, which
may or may not beat XLA's fusions: measured on-chip before flipping any
default (see docs/PERF.md).

Backward: a second kernel recomputes the probs (from saved softmax
stats), the out-projection, and the dropout masks (hardware PRNG,
identical streams), and produces dq/dk/dv/dx plus dWo/dbo/dscale/dbias.
Weight gradients are accumulated ACROSS the sequential TPU grid into a
single VMEM-resident block (initialized at program 0), so no [B, ...]
partial buffers ever hit HBM.

CZT_ATTN_BLOCK_B=n (trace-time, default 1) processes n batch elements
per Pallas program with SEPARATE score matrices — pure per-program
overhead amortization with bitwise-identical outputs and dropout
streams (the pair-packing finding, docs/PERF.md round-8: these kernels
are overhead-bound at the recipe shape, not arithmetic-bound).

Enable with ``BertConfig(attention_impl="flash_block")``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from czechtriever_tpu.ops.attention import LANE, _keep_mask, _pad_l

HIDDEN_SEED_OFFSET = 0x40000000  # disjoint from the per-(b,h) attention seeds


def _no_softmax() -> bool:
    """CZT_ATTN_NO_SOFTMAX=1: TIMING-ONLY A/B that skips the softmax
    max/exp/log VPU chain in both kernels (outputs are numerically
    WRONG). Used to *measure* the attention kernels' VPU softmax cost
    for the roofline's VPU-inclusive bound (docs/PERF.md round-4
    section) instead of estimating it. Read at trace time."""
    import os
    return os.environ.get("CZT_ATTN_NO_SOFTMAX") == "1"


def _block_b_env() -> int:
    """CZT_ATTN_BLOCK_B: batch elements per Pallas program (default 1).
    Read at trace time; numerics (incl. dropout streams) are bitwise
    independent of this knob — it only regroups grid iterations."""
    import os
    return max(1, int(os.environ.get("CZT_ATTN_BLOCK_B", "1")))


def _no_ctx_save() -> bool:
    """CZT_ATTN_NO_CTX_SAVE=1: TIMING-ONLY A/B that shrinks the fwd
    kernel's saved-ctx output to a dummy row (backward is unusable).
    The ctx save is 1/6 of the kernel's ~288 MB/call HBM traffic at
    B=128, L=256 — if kernel time drops by ~ctx-bytes/HBM-BW, the
    kernel is IO-additive (DMA not overlapping compute); if unchanged,
    writes are overlapped. Read at trace time."""
    import os
    return os.environ.get("CZT_ATTN_NO_CTX_SAVE") == "1"


def _no_stats() -> bool:
    """CZT_ATTN_NO_STATS=1: TIMING-ONLY A/B that skips the softmax-stat
    and LN-stat lane transposes + writes (_col_to_row chains) in the fwd
    kernel (backward is unusable). Isolates the in-VMEM layout-op
    suspect from docs/PERF.md round-8. Read at trace time."""
    import os
    return os.environ.get("CZT_ATTN_NO_STATS") == "1"


def _staged_heads() -> bool:
    """Staged head schedule (DEFAULT ON; CZT_ATTN_STAGED=0 restores the
    interleaved loop): the fwd per-head loop restructured into three
    unit-homogeneous stages — all H QK dots, then all softmax/dropout
    VPU chains, then all PV dots. Per-head math is independent, so the
    outputs are BITWISE identical to the interleaved loop (pinned in
    tests); only the schedule Mosaic sees changes. Round-9 attribution
    parked ~0.49 ms of the fwd kernel on MXU<->VPU serialization
    across the 12 interleaved chains; staging measured fwd marginal
    1.188 -> 1.014 ms (--chain harness) and +1.5% full train step at
    bitwise-equal loss. VMEM cost: H [Lq, Lk] f32 score/prob tiles
    live at once (+~3 MB at L=256, H=12). Read at trace time."""
    import os
    return os.environ.get("CZT_ATTN_STAGED", "1") != "0"


def _staged_bwd() -> bool:
    """Staged backward head schedule (DEFAULT ON;
    CZT_ATTN_STAGED_BWD=0 restores the interleaved loop): the same
    unit-homogeneous staging for the backward kernel's per-head chain
    (all s dots + exps, all dv dots, all dp dots, all ds VPU chains,
    all dq/dk dots). Measured +4.1% full train step on top of the
    staged fwd (1878.5 -> 1955.9 pairs/s) at bitwise-identical loss.
    VMEM cost: H probability (+keep-mask) tiles live at once. Read at
    trace time."""
    import os
    return os.environ.get("CZT_ATTN_STAGED_BWD", "1") != "0"


def _col_to_row(col, lane_pad):
    """[L, 1] f32 column -> [1, lane_pad] row (sublanes -> lanes).

    The softmax/LN statistics are computed per Q row, so they live on
    the sublane dim in-register; storing them that way gives the output
    array a size-1 minor (lane) dim, which XLA materializes 128x padded
    in HBM AND layout-converts around the layer scan's stacking DUS —
    measured ~9% of the full-256 train step (docs/PERF.md). One VPU
    transpose per stat here buys a compact, copy-free layout."""
    L = col.shape[0]
    if lane_pad > L:
        col = jnp.concatenate(
            [col, jnp.zeros((lane_pad - L, 1), col.dtype)], axis=0)
    return jnp.transpose(col)


def _bias_mat(bias_ref, i, n_segs, Lq):
    """Additive score bias for element ``i`` of the program's block.

    Three modes, self-described by the bias dtype/shape:

    * int32 [1, Lk_pad] segment ids (variable-length packing,
      data/packing.py): one [Lq, Lk_pad] compare builds the
      block-diagonal mask — row r may attend key c iff they carry the
      same crop id and c is a real token (id >= 0). Built once per
      element and reused across all heads; the compare+select is VPU
      noise next to one head's score dot.
    * f32, S=1 (the default, unpacked path): one key-mask row broadcast
      over every q row — returned as [1, Lk_pad] so the add stays the
      cheap broadcast it always was.
    * f32, S>1 (pair-packing, docs/PERF.md round-4): segment j's q rows
      see segment j's key-mask row, whose live span is its own diagonal
      key block — cross-segment attention is killed by the -1e30 fill
      the host-side packing wrote there."""
    if jnp.issubdtype(bias_ref.dtype, jnp.integer):
        seg = bias_ref[i]                       # [1, Lk_pad] int32
        q_seg = jnp.transpose(seg)[:Lq]         # [Lq, 1]
        ok = (q_seg == seg) & (seg >= 0)        # [Lq, Lk_pad]
        return jnp.where(ok, 0.0, -1e30).astype(jnp.float32)
    if n_segs == 1:
        return bias_ref[i, 0][None, :]
    seg_rows = Lq // n_segs
    return jnp.concatenate(
        [jnp.broadcast_to(bias_ref[i, j][None, :],
                          (seg_rows, bias_ref.shape[-1]))
         for j in range(n_segs)], axis=0)


def _build_biasp(bias, L, Lk_pad):
    """Host-side additive-bias layout for the kernels.

    int32 [B, L] segment ids (variable-length packing) -> [B, 1, Lk_pad]
    int32, padded key slots set to -1 (NOT 0 — 0 is a live crop id; a
    zero pad would let crop 0 attend the padding keys and vice versa).
    [B, L] f32 key mask (legacy) -> [B, 1, Lk_pad] with -1e30 beyond L.
    [B, S, L_seg] segmented masks (pair packing) -> [B, S, Lk_pad]:
    segment j's row carries its own mask over its diagonal key block
    [j*L_seg, (j+1)*L_seg) and -1e30 everywhere else, so packed batch
    elements cannot attend each other's keys."""
    if jnp.issubdtype(bias.dtype, jnp.integer):
        pad = Lk_pad - bias.shape[1]
        bp = bias.astype(jnp.int32)
        if pad:
            bp = jnp.pad(bp, ((0, 0), (0, pad)), constant_values=-1)
        return bp[:, None, :]
    if bias.ndim == 2:
        bp = _pad_l(bias, Lk_pad, 1) + jnp.where(
            jnp.arange(Lk_pad) < L, 0.0, -1e30)[None, :].astype(jnp.float32)
        return bp[:, None, :]
    _, S, L_seg = bias.shape
    assert S * L_seg == L, (bias.shape, L)
    col = jnp.arange(Lk_pad)
    rows = []
    for j in range(S):
        live = (col >= j * L_seg) & (col < (j + 1) * L_seg)
        seg = jnp.where(
            live[None, :],
            jnp.take(bias[:, j], jnp.clip(col - j * L_seg, 0, L_seg - 1),
                     axis=1),
            -1e30)
        rows.append(seg)
    return jnp.stack(rows, axis=1).astype(jnp.float32)


def _mha_ctx(q_ref, k_ref, v_ref, bias_row, lse_ref, seed_ref, i, b,
             n_heads, rate, deterministic, save_stats):
    """Per-head attention into a [Lq, HD] context, stats saved.

    ``i`` indexes the element within the program's batch block; ``b``
    is the GLOBAL batch element index (seeds the dropout PRNG, so
    streams are independent of the block grouping). Q rows are padded
    to 8-sublane granularity only (crop-shaped batches); K/V stay
    128-lane padded because Lk is the scores' lane dim. The softmax
    stats are folded into one logsumexp row per head, stored
    [H, Lq_lane] with L on the LANE dim (see _col_to_row).
    ``bias_row`` is [1, Lk_pad] (broadcast) or a full [Lq, Lk_pad]
    matrix in the pair-packed segmented case."""
    H = n_heads
    D = q_ref.shape[-1] // H

    def qk(h):
        cols = slice(h * D, (h + 1) * D)
        s = jax.lax.dot_general(q_ref[i, :, cols], k_ref[i, :, cols],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return s * (1.0 / math.sqrt(D)) + bias_row

    def softmax_drop(h, s):
        if _no_softmax():                 # timing A/B — wrong numerics
            m = jnp.zeros((s.shape[0], 1), jnp.float32)
            p = s
            l = jnp.sum(jnp.abs(p), axis=-1, keepdims=True) + 1.0
        else:
            m = jnp.max(s, axis=-1, keepdims=True)    # [Lq, 1]
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
        if not deterministic and rate > 0.0:
            keep = _keep_mask(seed_ref[0] + b * H + h, rate, p.shape)
            p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
        return p, m, l

    def pv(h, p, l):
        cols = slice(h * D, (h + 1) * D)
        o = jnp.dot(p.astype(v_ref.dtype), v_ref[i, :, cols],
                    preferred_element_type=jnp.float32)
        return (o / l).astype(q_ref.dtype)

    outs = []
    lse_rows = []
    if _staged_heads():
        # three unit-homogeneous stages (see _staged_heads)
        scores = [qk(h) for h in range(H)]
        pml = [softmax_drop(h, scores[h]) for h in range(H)]
        outs = [pv(h, p, l) for h, (p, _, l) in enumerate(pml)]
        if save_stats and not _no_stats():
            lse_rows = [_col_to_row(m + jnp.log(l), lse_ref.shape[-1])
                        for (_, m, l) in pml]
    else:
        for h in range(H):
            p, m, l = softmax_drop(h, qk(h))
            outs.append(pv(h, p, l))
            if save_stats and not _no_stats():
                lse_rows.append(
                    _col_to_row(m + jnp.log(l), lse_ref.shape[-1]))
    if save_stats and not _no_stats():
        lse_ref[i] = jnp.concatenate(lse_rows, axis=0)
    return jnp.concatenate(outs, axis=-1)  # [Lq, HD]


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, x_ref, w_ref, bo_ref,
                sc_ref, lb_ref, bias_ref, y_ref, ctx_ref, lse_ref,
                ln_ref, *, n_heads, attn_rate, hidden_rate,
                eps, deterministic, n_segs=1, block_b=1):
    pid = pl.program_id(0)
    for i in range(block_b):
        b = pid * block_b + i             # global element (PRNG seeds)
        bias_row = _bias_mat(bias_ref, i, n_segs, q_ref.shape[1])
        ctx = _mha_ctx(q_ref, k_ref, v_ref, bias_row, lse_ref, seed_ref,
                       i, b, n_heads, attn_rate, deterministic,
                       save_stats=True)
        # timing A/B: a shrunken ctx output block skips most of the
        # save-DMA (see _no_ctx_save); normal mode writes the full rows
        ctx_ref[i] = ctx[:ctx_ref.shape[1]]
        attn = jnp.dot(ctx, w_ref[...], preferred_element_type=jnp.float32)
        attn = attn + bo_ref[...].astype(jnp.float32)[None, :]
        if not deterministic and hidden_rate > 0.0:
            keep = _keep_mask(seed_ref[0] + HIDDEN_SEED_OFFSET + b,
                              hidden_rate, attn.shape)
            attn = jnp.where(keep, attn * (1.0 / (1.0 - hidden_rate)), 0.0)
        z = x_ref[i].astype(jnp.float32) + attn
        mean = jnp.mean(z, axis=-1, keepdims=True)
        zc = z - mean
        var = jnp.mean(zc * zc, axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        zhat = zc * rstd
        y = zhat * sc_ref[...].astype(jnp.float32)[None, :] \
            + lb_ref[...].astype(jnp.float32)[None, :]
        y_ref[i] = y.astype(y_ref.dtype)
        if not _no_stats():
            lane = ln_ref.shape[-1]
            ln_ref[i] = jnp.concatenate(
                [_col_to_row(mean, lane), _col_to_row(rstd, lane)],
                axis=0)


def _row_to_col(row, L):
    """[1, lane_pad] stat row -> [L, 1] column (inverse of _col_to_row)."""
    return jnp.transpose(row)[:L]


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, x_ref, w_ref, bo_ref,
                sc_ref, bias_ref, ctx_ref, lse_ref, ln_ref,
                dy_ref, dq_ref, dk_ref, dv_ref, dx_ref, dw_ref,
                dbo_ref, dsc_ref, dlb_ref, *, n_heads, attn_rate,
                hidden_rate, eps, deterministic, n_segs=1, block_b=1):
    pid = pl.program_id(0)
    H = n_heads
    D = q_ref.shape[-1] // H
    Lq = q_ref.shape[1]
    dt = q_ref.dtype

    # grid-accumulated parameter grads (sequential TPU grid)
    @pl.when(pid == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        dbo_ref[...] = jnp.zeros_like(dbo_ref)
        dsc_ref[...] = jnp.zeros_like(dsc_ref)
        dlb_ref[...] = jnp.zeros_like(dlb_ref)

    for i in range(block_b):
        b = pid * block_b + i             # global element (PRNG seeds)
        bias_row = _bias_mat(bias_ref, i, n_segs, Lq)

        # ---- recompute z / zhat from the saved ctx ----------------------
        ctx = ctx_ref[i]
        attn = jnp.dot(ctx, w_ref[...], preferred_element_type=jnp.float32)
        attn = attn + bo_ref[...].astype(jnp.float32)[None, :]
        if not deterministic and hidden_rate > 0.0:
            keep2 = _keep_mask(seed_ref[0] + HIDDEN_SEED_OFFSET + b,
                               hidden_rate, attn.shape)
            inv2 = 1.0 / (1.0 - hidden_rate)
            attn = jnp.where(keep2, attn * inv2, 0.0)
        z = x_ref[i].astype(jnp.float32) + attn
        mean = _row_to_col(ln_ref[i, 0:1, :], Lq)   # [Lq_pad, 1]
        rstd = _row_to_col(ln_ref[i, 1:2, :], Lq)
        rstd = jnp.where(rstd == 0.0, 1.0, rstd)    # fully-padded rows
        zhat = (z - mean) * rstd

        dy = dy_ref[i].astype(jnp.float32)
        scale = sc_ref[...].astype(jnp.float32)[None, :]

        # ---- LN backward ------------------------------------------------
        g = dy * scale
        gm = jnp.mean(g, axis=-1, keepdims=True)
        gzm = jnp.mean(g * zhat, axis=-1, keepdims=True)
        dz = rstd * (g - gm - zhat * gzm)               # [L, HD] f32

        dsc_ref[...] += jnp.sum(dy * zhat, axis=0)
        dlb_ref[...] += jnp.sum(dy, axis=0)

        dx_ref[i] = dz.astype(dx_ref.dtype)             # residual path
        dattn = dz
        if not deterministic and hidden_rate > 0.0:
            dattn = jnp.where(keep2, dattn * inv2, 0.0)
        dattn_b = dattn.astype(dt)
        # dWo = ctx^T @ dattn (contract over L)
        dw_ref[...] += jax.lax.dot_general(
            ctx, dattn_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbo_ref[...] += jnp.sum(dattn, axis=0)
        # dctx = dattn @ Wo^T (contract features)
        dctx = jax.lax.dot_general(dattn_b, w_ref[...],
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32
                                   ).astype(dt)

        # ---- per-head attention backward (ops/attention.py math) -------
        def s_dot(h):
            cols = slice(h * D, (h + 1) * D)
            s = jax.lax.dot_general(q_ref[i, :, cols], k_ref[i, :, cols],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return s * (1.0 / math.sqrt(D)) + bias_row

        def probs(h, s):
            if _no_softmax():             # timing A/B — wrong numerics
                p = s - _row_to_col(lse_ref[i, h:h + 1, :], Lq)
            else:
                p = jnp.exp(s - _row_to_col(lse_ref[i, h:h + 1, :], Lq))
            if not deterministic and attn_rate > 0.0:
                keep = _keep_mask(seed_ref[0] + b * H + h, attn_rate,
                                  p.shape)
                inv = 1.0 / (1.0 - attn_rate)
                return p, keep, inv
            return p, None, 1.0

        def dv_write(h, p, keep, inv):
            cols = slice(h * D, (h + 1) * D)
            pd = (jnp.where(keep, p * inv, 0.0)
                  if keep is not None else p)
            dv_ref[i, :, cols] = jax.lax.dot_general(
                pd.astype(dt), dctx[:, cols], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dv_ref.dtype)

        def dp_dot(h, keep, inv):
            cols = slice(h * D, (h + 1) * D)
            dpd = jax.lax.dot_general(dctx[:, cols], v_ref[i, :, cols],
                                      (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            return jnp.where(keep, dpd * inv, 0.0) if keep is not None \
                else dpd

        def ds_vpu(p, dp):
            row = jnp.sum(dp * p, axis=-1, keepdims=True)
            return (p * (dp - row)).astype(dt)

        def dqk_write(h, ds):
            cols = slice(h * D, (h + 1) * D)
            sc = 1.0 / math.sqrt(D)
            dq_ref[i, :, cols] = (
                jnp.dot(ds, k_ref[i, :, cols],
                        preferred_element_type=jnp.float32)
                * sc).astype(dq_ref.dtype)
            dk_ref[i, :, cols] = (
                jax.lax.dot_general(ds, q_ref[i, :, cols],
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                * sc).astype(dk_ref.dtype)

        if _staged_bwd():
            # unit-homogeneous stages (see _staged_bwd)
            pkl = [probs(h, s_dot(h)) for h in range(H)]
            for h, (p, keep, inv) in enumerate(pkl):
                dv_write(h, p, keep, inv)
            dps = [dp_dot(h, keep, inv)
                   for h, (_, keep, inv) in enumerate(pkl)]
            dss = [ds_vpu(p, dp) for (p, _, _), dp in zip(pkl, dps)]
            for h, ds in enumerate(dss):
                dqk_write(h, ds)
        else:
            for h in range(H):
                p, keep, inv = probs(h, s_dot(h))
                dv_write(h, p, keep, inv)
                ds = ds_vpu(p, dp_dot(h, keep, inv))
                dqk_write(h, ds)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14))
def attention_block(q, k, v, x, wo, bo, scale, ln_bias, bias, seed,
                    n_heads: int, attn_rate: float = 0.0,
                    hidden_rate: float = 0.0, eps: float = 1e-12,
                    deterministic: bool = True):
    """Fused MHA + out-proj + dropout + residual + LayerNorm.

    q,k,v,x: [B, L, H*D]; wo: [H*D, H*D]; bo/scale/ln_bias: [H*D];
    bias: [B, L] additive f32 key mask, or [B, S, L//S] f32 segmented
    masks for pair packing (S batch elements per row-block;
    block-diagonal attention, see BertConfig.attention_pack_pairs), or
    [B, L] int32 segment ids for variable-length packing (row r attends
    key c iff same id and id >= 0; -1 marks padding — data/packing.py);
    seed: int32 scalar. Returns y in x.dtype."""
    y, *_ = _block_call(q, k, v, x, wo, bo, scale, ln_bias, bias, seed,
                        n_heads, attn_rate, hidden_rate, eps,
                        deterministic)
    return y


def _resolve_block_b(B: int) -> int:
    bb = _block_b_env()
    while bb > 1 and B % bb != 0:
        bb -= 1
    return bb


def _block_call(q, k, v, x, wo, bo, scale, ln_bias, bias, seed, n_heads,
                attn_rate, hidden_rate, eps, deterministic,
                interpret=False):
    B, L, HD = q.shape
    H = n_heads
    # Q rows pad to 8-sublane granularity (crop-shaped batches); K/V/bias
    # pad to the 128-lane multiple because Lk is the scores' lane dim.
    # Stats arrays put L on the LANE dim (compact HBM layout), so their
    # L pads to 128 — cheap, they are tiny.
    S = 1 if bias.ndim == 2 else bias.shape[1]
    bb = _resolve_block_b(B)
    Lq_pad = -(-L // 8) * 8
    Lk_pad = -(-L // LANE) * LANE
    Lq_lane = -(-Lq_pad // LANE) * LANE
    if S > 1:
        # pair packing: every q row is a real token of some segment
        assert Lq_pad == L, "packed rows must be 8-aligned (L_seg % 8 == 0)"
    qp, xp = (_pad_l(t, Lq_pad, 1) for t in (q, x))
    kp, vp = (_pad_l(t, Lk_pad, 1) for t in (k, v))
    biasp = _build_biasp(bias, L, Lk_pad)
    if seed is None:
        seed = jnp.int32(0)

    kern = functools.partial(_fwd_kernel, n_heads=H, attn_rate=attn_rate,
                             hidden_rate=hidden_rate, eps=eps,
                             deterministic=deterministic, n_segs=S,
                             block_b=bb)
    full = lambda b: (b, 0, 0)
    wspec = pl.BlockSpec((HD, HD), lambda b: (0, 0))
    vec = pl.BlockSpec((HD,), lambda b: (0,))
    ctx_rows = 8 if _no_ctx_save() else Lq_pad   # timing A/B only
    y, ctx, lse, ln = pl.pallas_call(
        kern,
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bb, Lq_pad, HD), full),
            pl.BlockSpec((bb, Lk_pad, HD), full),
            pl.BlockSpec((bb, Lk_pad, HD), full),
            pl.BlockSpec((bb, Lq_pad, HD), full),
            wspec, vec, vec, vec,
            pl.BlockSpec((bb, S, Lk_pad), full),
        ],
        out_specs=[
            pl.BlockSpec((bb, Lq_pad, HD), full),
            pl.BlockSpec((bb, ctx_rows, HD), full),
            pl.BlockSpec((bb, H, Lq_lane), full),
            pl.BlockSpec((bb, 2, Lq_lane), full),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Lq_pad, HD), x.dtype),
            jax.ShapeDtypeStruct((B, ctx_rows, HD), q.dtype),
            jax.ShapeDtypeStruct((B, H, Lq_lane), jnp.float32),
            jax.ShapeDtypeStruct((B, 2, Lq_lane), jnp.float32),
        ],
        # the per-program working set (ctx + f32 intermediates + weight
        # block) exceeds the default 16 MB scoped-VMEM stack at L>=384
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(jnp.reshape(seed.astype(jnp.int32), (1,)), qp, kp, vp, xp,
      wo, bo, scale, ln_bias, biasp)
    return y[:, :L], ctx, lse, ln


def _block_fwd(q, k, v, x, wo, bo, scale, ln_bias, bias, seed, n_heads,
               attn_rate, hidden_rate, eps, deterministic):
    y, ctx, lse, ln = _block_call(
        q, k, v, x, wo, bo, scale, ln_bias, bias, seed, n_heads,
        attn_rate, hidden_rate, eps, deterministic)
    # tag residuals for selective-remat policies (models/bert.py
    # remat="dots" saves "flash_stats"): without these the policy would
    # re-run the whole fused kernel in the backward
    from jax.ad_checkpoint import checkpoint_name
    ctx = checkpoint_name(ctx, "flash_stats")
    lse = checkpoint_name(lse, "flash_stats")
    ln = checkpoint_name(ln, "flash_stats")
    return y, (q, k, v, x, wo, bo, scale, bias, seed, ctx, lse, ln)


def _block_bwd(n_heads, attn_rate, hidden_rate, eps, deterministic,
               res, dy):
    q, k, v, x, wo, bo, scale, bias, seed, ctx, lse, ln = res
    B, L, HD = q.shape
    H = n_heads
    S = 1 if bias.ndim == 2 else bias.shape[1]
    bb = _resolve_block_b(B)
    Lq_pad = ctx.shape[1]
    Lq_lane = lse.shape[2]
    Lk_pad = -(-L // LANE) * LANE
    qp, xp = (_pad_l(t, Lq_pad, 1) for t in (q, x))
    kp, vp = (_pad_l(t, Lk_pad, 1) for t in (k, v))
    dyp = _pad_l(dy, Lq_pad, 1)
    biasp = _build_biasp(bias, L, Lk_pad)
    if seed is None:
        seed = jnp.int32(0)
    # padded-row guards (l == 0 / rstd == 0) live inside the kernel now:
    # an XLA-side where() on the stats arrays was a separate fusion

    kern = functools.partial(_bwd_kernel, n_heads=H, attn_rate=attn_rate,
                             hidden_rate=hidden_rate, eps=eps,
                             deterministic=deterministic, n_segs=S,
                             block_b=bb)
    full = lambda b: (b, 0, 0)
    acc2 = pl.BlockSpec((HD, HD), lambda b: (0, 0))
    acc1 = pl.BlockSpec((HD,), lambda b: (0,))
    dq, dk, dv, dx, dw, dbo, dsc, dlb = pl.pallas_call(
        kern,
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bb, Lq_pad, HD), full),
            pl.BlockSpec((bb, Lk_pad, HD), full),
            pl.BlockSpec((bb, Lk_pad, HD), full),
            pl.BlockSpec((bb, Lq_pad, HD), full),
            acc2, acc1, acc1,
            pl.BlockSpec((bb, S, Lk_pad), full),
            pl.BlockSpec((bb, Lq_pad, HD), full),
            pl.BlockSpec((bb, H, Lq_lane), full),
            pl.BlockSpec((bb, 2, Lq_lane), full),
            pl.BlockSpec((bb, Lq_pad, HD), full),
        ],
        out_specs=[
            pl.BlockSpec((bb, Lq_pad, HD), full),
            pl.BlockSpec((bb, Lk_pad, HD), full),
            pl.BlockSpec((bb, Lk_pad, HD), full),
            pl.BlockSpec((bb, Lq_pad, HD), full),
            acc2, acc1, acc1, acc1,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Lq_pad, HD), q.dtype),
            jax.ShapeDtypeStruct((B, Lk_pad, HD), k.dtype),
            jax.ShapeDtypeStruct((B, Lk_pad, HD), v.dtype),
            jax.ShapeDtypeStruct((B, Lq_pad, HD), x.dtype),
            jax.ShapeDtypeStruct((HD, HD), jnp.float32),
            jax.ShapeDtypeStruct((HD,), jnp.float32),
            jax.ShapeDtypeStruct((HD,), jnp.float32),
            jax.ShapeDtypeStruct((HD,), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=False,
    )(jnp.reshape(seed.astype(jnp.int32), (1,)), qp, kp, vp, xp,
      wo, bo, scale, biasp, ctx, lse, ln, dyp)
    return (dq[:, :L], dk[:, :L], dv[:, :L], dx[:, :L],
            dw.astype(wo.dtype), dbo.astype(bo.dtype),
            dsc.astype(scale.dtype), dlb.astype(scale.dtype),
            jnp.zeros_like(bias), jnp.zeros_like(seed))


attention_block.defvjp(_block_fwd, _block_bwd)


def attention_block_interpret(q, k, v, x, wo, bo, scale, ln_bias, bias,
                              seed=None, n_heads=1, attn_rate=0.0,
                              hidden_rate=0.0, eps=1e-12,
                              deterministic=True):
    """Interpret-mode forward for CPU tests."""
    y, *_ = _block_call(q, k, v, x, wo, bo, scale, ln_bias, bias, seed,
                        n_heads, attn_rate, hidden_rate, eps,
                        deterministic, interpret=True)
    return y

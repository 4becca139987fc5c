"""Fused multi-head attention kernels (Pallas/TPU) + naive reference.

The reference encoder's attention is torch SDPA inside HF BERT
(/root/reference/src/contriever.py:17-44 via transformers). A direct XLA
translation (materialize scores -> softmax -> dropout -> weighted sum)
is what models/bert.py shipped in round 1 — and profiling on v5e showed
it is the step's bottleneck:

  * f32 [B,H,L,L] probs + their bf16 copy are materialized in HBM every
    layer (4.5 GB + 2.25 GB saved for backward at B=128, L=256 — the
    reason the no-remat step OOMed at 33 GB);
  * threefry dropout-mask generation costs ~30 ms per forward.

``flash_attention`` fixes all three TPU-natively: each Pallas program
computes softmax(QK^T/sqrt(d) + bias) @ V entirely in VMEM for a group
of heads (L=256 tiles: a [256,256] f32 score tile is 256 KB), applies
attention dropout with the on-core hardware PRNG (pltpu.prng_*), and
saves only (m, l) softmax stats [B,H,L] for the backward, which
regenerates the identical dropout mask from the same seed instead of
storing it. A custom VJP computes dQ/dK/dV in a second fused kernel.

Layout and grid:

  * operands are the **projection-natural ``[B, L, H*D]`` layout**; each
    head is a [L, D] lane-offset pane inside the block. The first
    version took [B, H, L, D], which forced four XLA relayout copies per
    encoder layer (~38 ms/step of copy traffic at B=32 x accum 8).
  * the grid is ``(B, head_groups)``: at small per-core batch a (B,)
    grid leaves too few programs for Mosaic to pipeline (the per-head
    matmuls are short dependency chains), and one program per (b, h)
    drowns in dispatch overhead. ``head_groups`` must divide H and keep
    the block width H*D/head_groups a multiple of the 128-lane tile.

Numerics: MXU contractions run on the input dtype with f32 accumulation
(bit-identical scores to upcasting bf16->f32 first, at several times the
issue rate); softmax and its vjp stay f32. Dropout semantics: keep-prob
1-p, kept values scaled by 1/(1-p) (torch parity); the mask *pattern*
differs from jax.random.bernoulli, which only changes which random
stream drives the regularization.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128  # pad L to a lane multiple for clean tiling


def _staged() -> bool:
    """Staged head schedule for THIS kernel (CZT_FLASH_STAGED=1,
    default OFF): the unit-homogeneous restructure that wins +5.9% on
    the fused block kernel (ops/attention_block.py, default ON there)
    measured 14% SLOWER here — fwd 2.504 -> 2.859 ms, fwd+grad 3.971
    -> 4.436 at B=128, L=256 — because this kernel's (B, head_groups)
    grid already gives Mosaic small per-program head counts and the
    extra live [L, L] tiles cost more than the overlap buys. Kept as
    an opt-in experiment; bitwise identical either way. Read at trace
    time."""
    import os
    return os.environ.get("CZT_FLASH_STAGED") == "1"


def _staged_bwd() -> bool:
    import os
    return os.environ.get("CZT_FLASH_STAGED", "0") == "1"


def naive_attention(q, k, v, bias, dropout_rate: float = 0.0,
                    dropout_rng: Optional[jax.Array] = None,
                    deterministic: bool = True):
    """Reference XLA path. q,k,v: [B,H,L,D]; bias: [B,L] additive f32 on
    keys. Returns [B,H,L,D] in q.dtype."""
    dt = q.dtype
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(q.shape[-1]) + bias[:, None, None, :]
    probs = jax.nn.softmax(scores, axis=-1)
    if not deterministic and dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(dt), v,
                      preferred_element_type=dt)


def naive_attention_flat(q, k, v, bias, n_heads: int, **kw):
    """``naive_attention`` on the kernel's flat [B, L, H*D] layout —
    the differential reference for tests and the kernel micro-bench."""
    B, L, HD = q.shape
    D = HD // n_heads

    def split(x):
        return x.reshape(B, L, n_heads, D).transpose(0, 2, 1, 3)

    o = naive_attention(split(q), split(k), split(v), bias, **kw)
    return o.transpose(0, 2, 1, 3).reshape(B, L, HD)


def _pick_head_groups(H: int, HD: int) -> int:
    """Head-group count for the (B, G) grid. Swept on a v5e at
    B=32, L=256, H=12: G=1 (one program per batch element, all heads
    unrolled inside) = 477 pairs/s in the train bench, G=6 = 461, one
    program per (b,h) = ~5x slower standalone — per-program dispatch
    overhead beats any pipelining gain at these shapes, so the widest
    grouping wins. CZT_ATTN_HEAD_GROUPS overrides for experiments."""
    import os
    override = os.environ.get("CZT_ATTN_HEAD_GROUPS")
    if override:
        g = int(override)
        if H % g != 0 or (HD // g) % LANE != 0:
            raise ValueError(
                f"CZT_ATTN_HEAD_GROUPS={g} invalid: must divide H={H} "
                f"with a {LANE}-multiple block width (H*D={HD})")
        return g
    return 1


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _keep_mask(seed, rate: float, shape):
    """Deterministic dropout keep-mask from the on-core PRNG. Seeded per
    (batch, head) so fwd and bwd regenerate the same bits."""
    pltpu.prng_seed(seed)
    # prng_random_bits yields *signed* int32 words: bitcast before the
    # unsigned threshold compare (int32 >= uint32(2^31) would promote to
    # an always-true compare and silently disable dropout)
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = jnp.uint32(min(int(rate * (2 ** 32)), 2 ** 32 - 1))
    return bits >= threshold


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, m_ref,
                l_ref, *, heads_per_group: int, total_heads: int,
                rate: float, deterministic: bool):
    b = pl.program_id(0)
    g = pl.program_id(1)
    D = q_ref.shape[-1] // heads_per_group
    bias_row = bias_ref[0, 0][None, :]

    def qk(i):
        cols = slice(i * D, (i + 1) * D)
        # MXU contractions on the input dtype with f32 accumulation:
        # bit-identical to upcasting bf16->f32 first, several times faster
        s = jax.lax.dot_general(q_ref[0, :, cols], k_ref[0, :, cols],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return s * (1.0 / math.sqrt(D)) + bias_row

    def softmax_drop(i, s):
        m = jnp.max(s, axis=-1)                   # [L]
        p = jnp.exp(s - m[:, None])               # unnormalized probs
        l = jnp.sum(p, axis=-1)                   # [L]
        if not deterministic and rate > 0.0:
            h_global = g * heads_per_group + i
            keep = _keep_mask(seed_ref[0] + b * total_heads + h_global,
                              rate, p.shape)
            p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
        return p, m, l

    def pv_write(i, p, m, l):
        cols = slice(i * D, (i + 1) * D)
        # fold the 1/l softmax normalization into the [L, D] epilogue
        # instead of dividing the [L, L] prob tile
        o = jnp.dot(p.astype(v_ref.dtype), v_ref[0, :, cols],
                    preferred_element_type=jnp.float32)
        o_ref[0, :, cols] = (o / l[:, None]).astype(o_ref.dtype)
        m_ref[0, 0, i] = m
        l_ref[0, 0, i] = l

    if _staged():
        pml = [softmax_drop(i, qk(i)) for i in range(heads_per_group)]
        for i, (p, m, l) in enumerate(pml):
            pv_write(i, p, m, l)
    else:
        for i in range(heads_per_group):
            p, m, l = softmax_drop(i, qk(i))
            pv_write(i, p, m, l)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, m_ref, l_ref,
                do_ref, dq_ref, dk_ref, dv_ref, *, heads_per_group: int,
                total_heads: int, rate: float, deterministic: bool):
    b = pl.program_id(0)
    g = pl.program_id(1)
    D = q_ref.shape[-1] // heads_per_group
    scale = 1.0 / math.sqrt(D)
    bias_row = bias_ref[0, 0][None, :]
    dt = q_ref.dtype

    def probs(i):
        cols = slice(i * D, (i + 1) * D)
        s = jax.lax.dot_general(q_ref[0, :, cols], k_ref[0, :, cols],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * scale + bias_row
        p = (jnp.exp(s - m_ref[0, 0, i][:, None])
             / l_ref[0, 0, i][:, None])
        if not deterministic and rate > 0.0:
            h_global = g * heads_per_group + i
            keep = _keep_mask(seed_ref[0] + b * total_heads + h_global,
                              rate, p.shape)
            return p, keep, 1.0 / (1.0 - rate)
        return p, None, 1.0

    def dv_write(i, p, keep, inv):
        cols = slice(i * D, (i + 1) * D)
        pd = jnp.where(keep, p * inv, 0.0) if keep is not None else p
        # dv = P^T dO: contract over the query dim, no transpose
        dv_ref[0, :, cols] = jax.lax.dot_general(
            pd.astype(dt), do_ref[0, :, cols], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)

    def dp_dot(i, keep, inv):
        cols = slice(i * D, (i + 1) * D)
        dpd = jax.lax.dot_general(do_ref[0, :, cols], v_ref[0, :, cols],
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        return jnp.where(keep, dpd * inv, 0.0) if keep is not None else dpd

    def dqk_write(i, p, dp):
        cols = slice(i * D, (i + 1) * D)
        # softmax vjp: dS = P * (dP - sum(dP * P, axis=-1))
        row = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = (p * (dp - row)).astype(dt)
        dq_ref[0, :, cols] = (
            jnp.dot(ds, k_ref[0, :, cols],
                    preferred_element_type=jnp.float32)
            * scale).astype(dq_ref.dtype)
        dk_ref[0, :, cols] = (
            jax.lax.dot_general(ds, q_ref[0, :, cols],
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            * scale).astype(dk_ref.dtype)

    if _staged_bwd():
        pkl = [probs(i) for i in range(heads_per_group)]
        for i, (p, keep, inv) in enumerate(pkl):
            dv_write(i, p, keep, inv)
        dps = [dp_dot(i, keep, inv)
               for i, (_, keep, inv) in enumerate(pkl)]
        for i, ((p, _, _), dp) in enumerate(zip(pkl, dps)):
            dqk_write(i, p, dp)
    else:
        for i in range(heads_per_group):
            p, keep, inv = probs(i)
            dv_write(i, p, keep, inv)
            dqk_write(i, p, dp_dot(i, keep, inv))


def _pad_l(x, L_pad, axis):
    pad = L_pad - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def flash_attention(q, k, v, bias, seed, n_heads: int,
                    dropout_rate: float = 0.0, deterministic: bool = True):
    """Fused attention. q,k,v: [B, L, H*D] (projection-natural layout);
    bias: [B,L] f32 additive on keys (0 for real tokens, -1e30 for pads);
    seed: int32 scalar driving the attention-dropout PRNG. Returns
    [B, L, H*D] in q.dtype."""
    o, _, _ = _flash_fwd(q, k, v, bias, seed, n_heads, dropout_rate,
                         deterministic)
    return o


def _flash_call(q, k, v, bias, seed, n_heads, rate, deterministic,
                interpret=False):
    B, L, HD = q.shape
    H = n_heads
    G = _pick_head_groups(H, HD)
    hpg = H // G
    W = HD // G                       # block width, 128-multiple
    L_pad = -(-L // LANE) * LANE
    qp = _pad_l(q, L_pad, 1)
    kp = _pad_l(k, L_pad, 1)
    vp = _pad_l(v, L_pad, 1)
    # padded keys must never win the softmax
    biasp = _pad_l(bias, L_pad, 1) + jnp.where(
        jnp.arange(L_pad) < L, 0.0, -1e30)[None, :].astype(jnp.float32)
    biasp = biasp[:, None, :]  # [B, 1, L_pad]: TPU block rule needs the
    # last-two block dims to divide (8,128) or equal the array dims
    if seed is None:
        seed = jnp.int32(0)

    kern = functools.partial(_fwd_kernel, heads_per_group=hpg,
                             total_heads=H, rate=rate,
                             deterministic=deterministic)
    o, m, l = pl.pallas_call(
        kern,
        grid=(B, G),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
            pl.BlockSpec((1, L_pad, W), lambda b, g: (b, 0, g)),
            pl.BlockSpec((1, L_pad, W), lambda b, g: (b, 0, g)),
            pl.BlockSpec((1, L_pad, W), lambda b, g: (b, 0, g)),
            pl.BlockSpec((1, 1, L_pad), lambda b, g: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, L_pad, W), lambda b, g: (b, 0, g)),
            # stats are [B, G, hpg, L_pad] so the block covers the full
            # trailing dims (TPU block-divisibility rule: hpg < 8)
            pl.BlockSpec((1, 1, hpg, L_pad), lambda b, g: (b, g, 0, 0)),
            pl.BlockSpec((1, 1, hpg, L_pad), lambda b, g: (b, g, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, L_pad, HD), q.dtype),
            jax.ShapeDtypeStruct((B, G, hpg, L_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, G, hpg, L_pad), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.reshape(seed.astype(jnp.int32), (1,)), qp, kp, vp, biasp)
    return o[:, :L], m, l


def _flash_fwd(q, k, v, bias, seed, n_heads, rate, deterministic):
    return _flash_call(q, k, v, bias, seed, n_heads, rate, deterministic)


def _flash_fwd_vjp(q, k, v, bias, seed, n_heads, rate, deterministic):
    o, m, l = _flash_call(q, k, v, bias, seed, n_heads, rate, deterministic)
    # tag the softmax stats so selective-remat policies can keep them:
    # saving [B,H,L]x2 f32 (1.5 MB/layer at B=32) lets the backward
    # kernel run WITHOUT re-running the forward kernel — q/k/v are dot
    # outputs (already saved under the 'dots' policy) and m/l are the
    # only other residuals (see models/bert.py remat="dots")
    from jax.ad_checkpoint import checkpoint_name
    m = checkpoint_name(m, "flash_stats")
    l = checkpoint_name(l, "flash_stats")
    return o, (q, k, v, bias, seed, m, l)


def _flash_bwd_vjp(n_heads, rate, deterministic, res, g):
    q, k, v, bias, seed, m, l = res
    B, L, HD = q.shape
    H = n_heads
    # derive the head-group count from the saved stats layout
    # [B, G, hpg, L_pad] rather than re-reading CZT_ATTN_HEAD_GROUPS:
    # if the env var changed between the fwd and bwd traces the two
    # reads could disagree and silently corrupt gradients
    G = m.shape[1]
    hpg = H // G
    W = HD // G
    L_pad = m.shape[-1]
    qp = _pad_l(q, L_pad, 1)
    kp = _pad_l(k, L_pad, 1)
    vp = _pad_l(v, L_pad, 1)
    biasp = _pad_l(bias, L_pad, 1) + jnp.where(
        jnp.arange(L_pad) < L, 0.0, -1e30)[None, :].astype(jnp.float32)
    biasp = biasp[:, None, :]
    gp = _pad_l(g, L_pad, 1)
    if seed is None:
        seed = jnp.int32(0)
    # guard the padded rows of l against division by zero
    l = jnp.where(l == 0.0, 1.0, l)

    kern = functools.partial(_bwd_kernel, heads_per_group=hpg,
                             total_heads=H, rate=rate,
                             deterministic=deterministic)
    dq, dk, dv = pl.pallas_call(
        kern,
        grid=(B, G),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, L_pad, W), lambda b, g: (b, 0, g)),
            pl.BlockSpec((1, L_pad, W), lambda b, g: (b, 0, g)),
            pl.BlockSpec((1, L_pad, W), lambda b, g: (b, 0, g)),
            pl.BlockSpec((1, 1, L_pad), lambda b, g: (b, 0, 0)),
            pl.BlockSpec((1, 1, hpg, L_pad), lambda b, g: (b, g, 0, 0)),
            pl.BlockSpec((1, 1, hpg, L_pad), lambda b, g: (b, g, 0, 0)),
            pl.BlockSpec((1, L_pad, W), lambda b, g: (b, 0, g)),
        ],
        out_specs=[
            pl.BlockSpec((1, L_pad, W), lambda b, g: (b, 0, g)),
            pl.BlockSpec((1, L_pad, W), lambda b, g: (b, 0, g)),
            pl.BlockSpec((1, L_pad, W), lambda b, g: (b, 0, g)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, L_pad, HD), q.dtype),
            jax.ShapeDtypeStruct((B, L_pad, HD), k.dtype),
            jax.ShapeDtypeStruct((B, L_pad, HD), v.dtype),
        ],
        interpret=False,
    )(jnp.reshape(seed.astype(jnp.int32), (1,)), qp, kp, vp, biasp, m, l, gp)
    return (dq[:, :L], dk[:, :L], dv[:, :L], jnp.zeros_like(bias),
            jnp.zeros_like(seed))


flash_attention.defvjp(_flash_fwd_vjp, _flash_bwd_vjp)


def flash_attention_interpret(q, k, v, bias, seed=None, n_heads=1,
                              dropout_rate=0.0, deterministic=True):
    """Interpret-mode forward for CPU tests of the kernel body."""
    o, _, _ = _flash_call(q, k, v, bias, seed, n_heads, dropout_rate,
                          deterministic, interpret=True)
    return o

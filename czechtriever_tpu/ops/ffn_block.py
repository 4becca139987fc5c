"""Fused FFN *block* kernel (experimental, opt-in) — the sibling of
ops/attention_block.py for the second half of a BERT layer:

    pre = x @ W1 + b1
    a   = gelu(pre)                      (erf or tanh form, static)
    out = a @ W2 + b2
    h   = dropout(out)
    z   = x + h
    y   = LayerNorm(z) * scale + ln_bias

Removes the gelu/dropout/residual HBM round-trips and the FFN-side
LayerNorm reduce fusion. Residuals saved for backward: ``pre`` (bf16,
the same tensor XLA's no-remat autodiff saves) and ``z`` (so the
backward never re-runs a matmul); dW1/dW2/db1/db2/dscale/dln accumulate
across the sequential grid in VMEM (pl.when-initialized at program 0).

Enable with ``BertConfig(ffn_impl="fused")`` (requires
attention_impl="flash_block" — the two fusions are measured together).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from czechtriever_tpu.ops.attention import LANE, _keep_mask, _pad_l
from czechtriever_tpu.ops.attention_block import _col_to_row, _row_to_col

FFN_SEED_OFFSET = 0x20000000  # disjoint from attention_block's streams

# Rows-per-program target for batch grouping (see _pick_group). Resolved
# once at import so the forward and backward traces can never disagree
# (the ops/attention.py head-groups env var taught that lesson).
# Default 0 = one batch element per program: grouping G=4 at the recipe
# shape measured 6% faster standalone (fwd+bwd 3.91 vs 4.16 ms at
# B=128/L=136) but its larger per-program VMEM working set OOMs the full
# train step at B=128 (3/3 runs -> the bench ladder degrades to
# B=32/dots, 802 vs 892 pairs/s), so it stays opt-in for standalone
# encode-only workloads.
_ROWS_TARGET = int(os.environ.get("CZT_FFN_GROUP_ROWS", "0"))

# F-dimension chunks in the forward kernel. The straight-line
# mm1(c) -> gelu(c) -> mm2(c) chain per chunk has no cross-chunk
# dependency, so Mosaic can overlap chunk c's VPU gelu with chunk c+1's
# MXU matmul — the un-chunked forward serializes one big VPU block
# between the two matmuls. Forward-only: `pre` column slices are
# bitwise the same contractions, so the backward (which recomputes
# gelu from the saved pre) is unaffected.
_FWD_F_CHUNKS = int(os.environ.get("CZT_FFN_FWD_CHUNKS", "4"))

# CZT_FFN_BWD_CHUNKS (default 1 = off): the same F-dim chunk interleave
# for the backward — per chunk: pre_c -> gelu_c -> dW2 rows -> da_c ->
# gelu'_c -> dW1/db1 cols -> dx partial. dW1/dW2/db1 splits are pure
# output-dim tiling (bitwise); dx accumulates over chunks, which
# reorders its f32 contraction sum — tolerance-level, NOT bitwise.
# Flip the default only on a measured step-level win.
_BWD_F_CHUNKS = int(os.environ.get("CZT_FFN_BWD_CHUNKS", "1"))

# Save `pre` as a residual (1) or recompute x@W1+b1 in the backward
# kernel (0, default). The save costs [B, L, F] bf16 HBM each way PLUS
# the layer scan's stacking-DUS copies; recompute costs one extra MXU
# matmul in the backward. Measured A/B on chip (B=128 x accum 16):
# full-256 3337.5 -> 3219.5 ms/step (613.6 -> 636.1 pairs/s, +3.7%),
# recipe-136 944.6 -> 968.3 pairs/s (+2.5%). Recomputed pre is bitwise
# the saved value: tiling the output (N) dim never changes a
# contraction's accumulation order, and the bf16 cast matches the
# forward's store (chip-gated bitwise test). Resolved at import so
# fwd/bwd can never disagree on the residual tuple.
_SAVE_PRE = int(os.environ.get("CZT_FFN_SAVE_PRE", "0"))

_SQRT_2_OVER_PI = math.sqrt(2.0 / math.pi)
_C = 0.044715


def _pick_group(B: int, L_pad: int) -> int:
    """Batch elements per program. Every op in this block is row-local
    (matmuls, gelu, dropout, residual, per-row LayerNorm), so G elements
    can be processed as one [G*L_pad, D] matrix. Taller matmuls buy a
    modest backward win (126 vs 118 TFLOP/s combined fwd+bwd at G=4,
    B=128/L=136 standalone) at the price of a ~Gx per-program VMEM
    working set — see _ROWS_TARGET for why the default is off. Largest
    power-of-two divisor of B with G*L_pad <= _ROWS_TARGET."""
    g = 1
    while (B % (g * 2) == 0 and (g * 2) * L_pad <= _ROWS_TARGET):
        g *= 2
    return g


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (|error| < 1.5e-7): Mosaic has
    no erf lowering (NotImplementedError: ... erf), and 1.5e-7 is far
    below bf16 activation resolution."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return jnp.sign(x) * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x, tanh_approx: bool):
    if tanh_approx:
        t = jnp.tanh(_SQRT_2_OVER_PI * (x + _C * x ** 3))
        return 0.5 * x * (1.0 + t)
    return 0.5 * x * (1.0 + _erf(x / math.sqrt(2.0)))


def _gelu_grad(x, tanh_approx: bool):
    """d gelu / dx, matching jax.nn.gelu's two forms."""
    if tanh_approx:
        u = _SQRT_2_OVER_PI * (x + _C * x ** 3)
        t = jnp.tanh(u)
        du = _SQRT_2_OVER_PI * (1.0 + 3.0 * _C * x * x)
        return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * du
    cdf = 0.5 * (1.0 + _erf(x / math.sqrt(2.0)))
    pdf = jnp.exp(-0.5 * x * x) / math.sqrt(2.0 * math.pi)
    return cdf + x * pdf


def _fwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, sc_ref,
                lb_ref, *out_refs, hidden_rate, eps, tanh_gelu,
                deterministic, save_pre):
    if save_pre:
        y_ref, pre_ref, z_ref, ln_ref = out_refs
    else:
        y_ref, z_ref, ln_ref = out_refs
        pre_ref = None
    b = pl.program_id(0)
    # the block holds G batch elements; every op here is row-local, so
    # flatten to one [G*L_pad, D] matrix (taller MXU matmuls)
    x = x_ref[...].reshape(-1, x_ref.shape[-1])
    rows = x.shape[0]
    F = w1_ref.shape[-1]
    D = x_ref.shape[-1]
    # clamp to 1 for zero/negative env values (ZeroDivisionError at trace
    # time otherwise) and keep per-chunk column width 128-lane aligned so
    # pre_ref column stores lower cleanly for non-standard F
    nc = (_FWD_F_CHUNKS
          if (_FWD_F_CHUNKS > 0 and F % _FWD_F_CHUNKS == 0
              and (F // _FWD_F_CHUNKS) % 128 == 0) else 1)
    C = F // nc
    Gb = x_ref.shape[0]
    out = jnp.zeros((rows, D), jnp.float32)
    for c in range(nc):
        cols = slice(c * C, (c + 1) * C)
        pre_c = jnp.dot(x, w1_ref[:, cols],
                        preferred_element_type=jnp.float32)
        pre_c = pre_c + b1_ref[cols].astype(jnp.float32)[None, :]
        pre_b = pre_c.astype(x.dtype)
        if save_pre:
            pre_ref[:, :, cols] = pre_b.reshape(Gb, -1, C)
        a = _gelu(pre_b.astype(jnp.float32), tanh_gelu).astype(x.dtype)
        out = out + jnp.dot(a, w2_ref[cols, :],
                            preferred_element_type=jnp.float32)
    out = out + b2_ref[...].astype(jnp.float32)[None, :]
    if not deterministic and hidden_rate > 0.0:
        keep = _keep_mask(seed_ref[0] + FFN_SEED_OFFSET + b, hidden_rate,
                          out.shape)
        out = jnp.where(keep, out * (1.0 / (1.0 - hidden_rate)), 0.0)
    z = x.astype(jnp.float32) + out
    z_ref[...] = z.astype(z_ref.dtype).reshape(z_ref.shape)
    mean = jnp.mean(z, axis=-1, keepdims=True)
    zc = z - mean
    var = jnp.mean(zc * zc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = (zc * rstd) * sc_ref[...].astype(jnp.float32)[None, :] \
        + lb_ref[...].astype(jnp.float32)[None, :]
    y_ref[...] = y.astype(y_ref.dtype).reshape(y_ref.shape)
    # stats stored [G, 2, L_lane] (mean row, rstd row) with L on the
    # LANE dim: a trailing size-1 lane dim made XLA materialize them
    # 128x padded in HBM and layout-convert around the layer scan's
    # stacking DUS (measured ~9% of the full-256 step together with the
    # attention stats). The compute blocks keep their 8-granular sublane
    # L — only these tiny stat rows pad L to 128 (see
    # ops/attention_block._col_to_row).
    L_pad = x_ref.shape[1]
    lane = ln_ref.shape[-1]
    for g in range(Gb):
        rows = slice(g * L_pad, (g + 1) * L_pad)
        ln_ref[g] = jnp.concatenate(
            [_col_to_row(mean[rows], lane), _col_to_row(rstd[rows], lane)],
            axis=0)


def _bwd_kernel(seed_ref, x_ref, w1_ref, w2_ref, sc_ref, *refs,
                hidden_rate, eps, tanh_gelu, deterministic, save_pre):
    if save_pre:
        (pre_ref, z_ref, ln_ref, dy_ref, dx_ref, dw1_ref, db1_ref,
         dw2_ref, db2_ref, dsc_ref, dlb_ref) = refs
        b1_ref = None
    else:
        (b1_ref, z_ref, ln_ref, dy_ref, dx_ref, dw1_ref, db1_ref,
         dw2_ref, db2_ref, dsc_ref, dlb_ref) = refs
        pre_ref = None
    b = pl.program_id(0)
    dt = x_ref.dtype
    D = x_ref.shape[-1]
    F = w1_ref.shape[-1]
    z = z_ref[...].reshape(-1, D).astype(jnp.float32)
    L_pad = x_ref.shape[1]
    Gb = x_ref.shape[0]
    # stats come in as [G, 2, L_lane] rows; rebuild [G*L_pad, 1] columns
    mean = jnp.concatenate(
        [_row_to_col(ln_ref[g, 0:1, :], L_pad) for g in range(Gb)],
        axis=0)
    rstd = jnp.concatenate(
        [_row_to_col(ln_ref[g, 1:2, :], L_pad) for g in range(Gb)],
        axis=0)
    rstd = jnp.where(rstd == 0.0, 1.0, rstd)    # fully-padded rows
    zhat = (z - mean) * rstd
    dy = dy_ref[...].reshape(-1, D).astype(jnp.float32)
    scale = sc_ref[...].astype(jnp.float32)[None, :]

    @pl.when(b == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dsc_ref[...] = jnp.zeros_like(dsc_ref)
        dlb_ref[...] = jnp.zeros_like(dlb_ref)

    dsc_ref[...] += jnp.sum(dy * zhat, axis=0)
    dlb_ref[...] += jnp.sum(dy, axis=0)

    g = dy * scale
    gm = jnp.mean(g, axis=-1, keepdims=True)
    gzm = jnp.mean(g * zhat, axis=-1, keepdims=True)
    dz = rstd * (g - gm - zhat * gzm)

    dout = dz
    if not deterministic and hidden_rate > 0.0:
        keep = _keep_mask(seed_ref[0] + FFN_SEED_OFFSET + b, hidden_rate,
                          dout.shape)
        dout = jnp.where(keep, dout * (1.0 / (1.0 - hidden_rate)), 0.0)
    dout_b = dout.astype(dt)

    x = x_ref[...].reshape(-1, D)
    db2_ref[...] += jnp.sum(dout, axis=0)
    nc = (_BWD_F_CHUNKS
          if (_BWD_F_CHUNKS > 1 and F % _BWD_F_CHUNKS == 0
              and (F // _BWD_F_CHUNKS) % 128 == 0) else 1)
    C = F // nc
    dx_mm = jnp.zeros((x.shape[0], D), jnp.float32)
    for c in range(nc):
        cols = slice(c * C, (c + 1) * C)
        if save_pre:
            pre = pre_ref[...].reshape(-1, F)[:, cols].astype(jnp.float32)
        elif nc == 1:
            # recompute x@W1+b1 and round through bf16 exactly as the
            # forward stored it (N-dim tiling never changes accumulation
            # order, so this is bitwise the saved residual)
            pre = (jnp.dot(x, w1_ref[...],
                           preferred_element_type=jnp.float32)
                   + b1_ref[...].astype(jnp.float32)[None, :]
                   ).astype(dt).astype(jnp.float32)
        else:
            pre = (jnp.dot(x, w1_ref[:, cols],
                           preferred_element_type=jnp.float32)
                   + b1_ref[cols].astype(jnp.float32)[None, :]
                   ).astype(dt).astype(jnp.float32)
        a = _gelu(pre, tanh_gelu).astype(dt)
        # dW2 rows = a^T @ dout (contract over L)
        dw2_ref[cols, :] += jax.lax.dot_general(
            a, dout_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # da = dout @ W2^T; dpre = da * gelu'(pre)
        da = jax.lax.dot_general(dout_b, w2_ref[cols, :],
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dpre = (da * _gelu_grad(pre, tanh_gelu)).astype(dt)
        dw1_ref[:, cols] += jax.lax.dot_general(
            x, dpre, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db1_ref[cols] += jnp.sum(dpre.astype(jnp.float32), axis=0)
        dx_mm = dx_mm + jax.lax.dot_general(
            dpre, w1_ref[:, cols], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    dx_ref[...] = (dz + dx_mm).astype(dx_ref.dtype).reshape(dx_ref.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def ffn_block(x, w1, b1, w2, b2, scale, ln_bias, seed,
              hidden_rate: float = 0.0, eps: float = 1e-12,
              tanh_gelu: bool = True, deterministic: bool = True):
    """Fused FFN + dropout + residual + LayerNorm. x: [B, L, D];
    w1: [D, F]; w2: [F, D]. Returns y in x.dtype."""
    y, *_ = _block_call(x, w1, b1, w2, b2, scale, ln_bias, seed,
                        hidden_rate, eps, tanh_gelu, deterministic)
    return y


def _block_call(x, w1, b1, w2, b2, scale, ln_bias, seed, hidden_rate,
                eps, tanh_gelu, deterministic, interpret=False):
    B, L, D = x.shape
    F = w1.shape[1]
    # sublane (8-row) granularity: the COMPUTE blocks never put L on a
    # lane dim, so crop-length batches avoid the 128-lane round-up the
    # attention kernel's [L, L] scores require. Only the tiny stat rows
    # (L on lanes for a compact HBM layout) round L up to 128.
    L_pad = -(-L // 8) * 8
    L_lane = -(-L_pad // LANE) * LANE
    G = _pick_group(B, L_pad)
    xp = _pad_l(x, L_pad, 1)
    if seed is None:
        seed = jnp.int32(0)

    kern = functools.partial(_fwd_kernel, hidden_rate=hidden_rate,
                             eps=eps, tanh_gelu=tanh_gelu,
                             deterministic=deterministic,
                             save_pre=_SAVE_PRE)
    full = lambda b: (b, 0, 0)
    out_specs = [pl.BlockSpec((G, L_pad, D), full)]
    out_shape = [jax.ShapeDtypeStruct((B, L_pad, D), x.dtype)]
    if _SAVE_PRE:
        out_specs.append(pl.BlockSpec((G, L_pad, F), full))
        out_shape.append(jax.ShapeDtypeStruct((B, L_pad, F), x.dtype))
    out_specs += [
        pl.BlockSpec((G, L_pad, D), full),
        pl.BlockSpec((G, 2, L_lane), lambda b: (b, 0, 0)),
    ]
    out_shape += [
        jax.ShapeDtypeStruct((B, L_pad, D), x.dtype),
        jax.ShapeDtypeStruct((B, 2, L_lane), jnp.float32),
    ]
    outs = pl.pallas_call(
        kern,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((G, L_pad, D), full),
            pl.BlockSpec((D, F), lambda b: (0, 0)),
            pl.BlockSpec((F,), lambda b: (0,)),
            pl.BlockSpec((F, D), lambda b: (0, 0)),
            pl.BlockSpec((D,), lambda b: (0,)),
            pl.BlockSpec((D,), lambda b: (0,)),
            pl.BlockSpec((D,), lambda b: (0,)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(jnp.reshape(seed.astype(jnp.int32), (1,)), xp, w1, b1, w2, b2,
      scale, ln_bias)
    if _SAVE_PRE:
        y, pre, z, ln = outs
    else:
        (y, z, ln), pre = outs, None
    return y[:, :L], pre, z, ln


def _block_fwd(x, w1, b1, w2, b2, scale, ln_bias, seed, hidden_rate,
               eps, tanh_gelu, deterministic):
    y, pre, z, ln = _block_call(
        x, w1, b1, w2, b2, scale, ln_bias, seed, hidden_rate, eps,
        tanh_gelu, deterministic)
    from jax.ad_checkpoint import checkpoint_name
    if pre is not None:
        pre = checkpoint_name(pre, "flash_stats")
    z = checkpoint_name(z, "flash_stats")
    ln = checkpoint_name(ln, "flash_stats")
    return y, (x, w1, b1, w2, scale, seed, pre, z, ln)


def _block_bwd(hidden_rate, eps, tanh_gelu, deterministic, res, dy):
    x, w1, b1, w2, scale, seed, pre, z, ln = res
    B, L, D = x.shape
    F = w1.shape[1]
    L_pad = z.shape[1]
    L_lane = ln.shape[-1]
    xp = _pad_l(x, L_pad, 1)
    dyp = _pad_l(dy, L_pad, 1)
    if seed is None:
        seed = jnp.int32(0)
    # the rstd == 0 padded-row guard lives inside the kernel now

    kern = functools.partial(_bwd_kernel, hidden_rate=hidden_rate,
                             eps=eps, tanh_gelu=tanh_gelu,
                             deterministic=deterministic,
                             save_pre=_SAVE_PRE)
    # same grouping decision as the forward (pure function of shapes, so
    # the dropout-mask streams line up program-for-program)
    G = _pick_group(B, L_pad)
    full = lambda b: (b, 0, 0)
    if _SAVE_PRE:
        res_spec = pl.BlockSpec((G, L_pad, F), full)
        res_arg = pre
    else:
        res_spec = pl.BlockSpec((F,), lambda b: (0,))
        res_arg = b1
    dx, dw1, db1, dw2, db2, dsc, dlb = pl.pallas_call(
        kern,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((G, L_pad, D), full),
            pl.BlockSpec((D, F), lambda b: (0, 0)),
            pl.BlockSpec((F, D), lambda b: (0, 0)),
            pl.BlockSpec((D,), lambda b: (0,)),
            res_spec,
            pl.BlockSpec((G, L_pad, D), full),
            pl.BlockSpec((G, 2, L_lane), lambda b: (b, 0, 0)),
            pl.BlockSpec((G, L_pad, D), full),
        ],
        out_specs=[
            pl.BlockSpec((G, L_pad, D), full),
            pl.BlockSpec((D, F), lambda b: (0, 0)),
            pl.BlockSpec((F,), lambda b: (0,)),
            pl.BlockSpec((F, D), lambda b: (0, 0)),
            pl.BlockSpec((D,), lambda b: (0,)),
            pl.BlockSpec((D,), lambda b: (0,)),
            pl.BlockSpec((D,), lambda b: (0,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, L_pad, D), x.dtype),
            jax.ShapeDtypeStruct((D, F), jnp.float32),
            jax.ShapeDtypeStruct((F,), jnp.float32),
            jax.ShapeDtypeStruct((F, D), jnp.float32),
            jax.ShapeDtypeStruct((D,), jnp.float32),
            jax.ShapeDtypeStruct((D,), jnp.float32),
            jax.ShapeDtypeStruct((D,), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=False,
    )(jnp.reshape(seed.astype(jnp.int32), (1,)), xp, w1, w2, scale,
      res_arg, z, ln, dyp)
    return (dx[:, :L], dw1.astype(w1.dtype), db1.astype(w1.dtype),
            dw2.astype(w2.dtype), db2.astype(w2.dtype),
            dsc.astype(scale.dtype), dlb.astype(scale.dtype),
            jnp.zeros_like(seed))


ffn_block.defvjp(_block_fwd, _block_bwd)


def ffn_block_interpret(x, w1, b1, w2, b2, scale, ln_bias, seed=None,
                        hidden_rate=0.0, eps=1e-12, tanh_gelu=True,
                        deterministic=True):
    """Interpret-mode forward for CPU tests."""
    y, *_ = _block_call(x, w1, b1, w2, b2, scale, ln_bias, seed,
                        hidden_rate, eps, tanh_gelu, deterministic,
                        interpret=True)
    return y

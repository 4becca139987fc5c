"""Fused LayerNorm Pallas kernel with custom VJP.

Profiling the v5e train step (docs/PERF.md) put ~25% of step time in
LayerNorm/gelu elementwise fusions: XLA materializes several f32
[B,L,D] temporaries (the upcast, the centered tensor, the normalized
tensor) around each LN, so a nominally bandwidth-trivial op runs ~12x
below HBM speed. This kernel does the whole thing in VMEM:

  * forward — one read of x, one write of y; f32 row statistics
    computed in-register;
  * backward — recomputes the statistics from the saved *input* (no
    extra residuals beyond x itself), emits dx in one pass plus
    per-block partial (dscale, dbias) reductions that are summed
    outside the kernel.

Numerics match the XLA path (f32 stats, same eps placement); parity is
pinned by tests/test_layernorm.py against the models/bert reference
implementation.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLOCK = 256


def _stats(x32, eps):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc, jax.lax.rsqrt(var + eps)


def _fwd_kernel(x_ref, s_ref, b_ref, y_ref, *, eps):
    x32 = x_ref[...].astype(jnp.float32)
    xc, inv = _stats(x32, eps)
    y_ref[...] = (xc * inv * s_ref[...] + b_ref[...]).astype(y_ref.dtype)


def _bwd_kernel(x_ref, s_ref, g_ref, dx_ref, ds_ref, db_ref, *, eps):
    x32 = x_ref[...].astype(jnp.float32)
    xc, inv = _stats(x32, eps)
    yn = xc * inv
    g32 = g_ref[...].astype(jnp.float32)
    gs = g32 * s_ref[...]
    m1 = jnp.mean(gs, axis=-1, keepdims=True)
    m2 = jnp.mean(gs * yn, axis=-1, keepdims=True)
    dx_ref[...] = (inv * (gs - m1 - yn * m2)).astype(dx_ref.dtype)
    ds_ref[0, 0] = jnp.sum(g32 * yn, axis=0)
    db_ref[0, 0] = jnp.sum(g32, axis=0)


def _pad_rows(x, rb):
    n = x.shape[0]
    pad = (-n) % rb
    return (jnp.pad(x, ((0, pad), (0, 0))) if pad else x), n


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_layer_norm(x, scale, bias, eps: float = 1e-12):
    """x [N, D] (any dtype), scale/bias [D] f32 -> [N, D] in x.dtype."""
    return _fwd(x, scale, bias, eps, interpret=False)


def _fwd(x, scale, bias, eps, interpret):
    xp, n = _pad_rows(x, ROW_BLOCK)
    N, D = xp.shape
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(N // ROW_BLOCK,),
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, D), lambda i: (i, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((ROW_BLOCK, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, D), x.dtype),
        interpret=interpret,
    )(xp, scale.reshape(1, -1).astype(jnp.float32),
      bias.reshape(1, -1).astype(jnp.float32))
    return y[:n]


def _fwd_vjp(x, scale, bias, eps):
    return _fwd(x, scale, bias, eps, interpret=False), (x, scale)


def _bwd_vjp(eps, res, g):
    x, scale = res
    xp, n = _pad_rows(x, ROW_BLOCK)
    gp, _ = _pad_rows(g, ROW_BLOCK)
    N, D = xp.shape
    nb = N // ROW_BLOCK
    dx, ds, db = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, D), lambda i: (i, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((ROW_BLOCK, D), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((ROW_BLOCK, D), lambda i: (i, 0)),
            # per-block partials with a singleton row axis (TPU block
            # rule: last-two dims divide (8,128) or equal the array's)
            pl.BlockSpec((1, 1, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, D), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, D), x.dtype),
            jax.ShapeDtypeStruct((nb, 1, D), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, D), jnp.float32),
        ],
    )(xp, scale.reshape(1, -1).astype(jnp.float32), gp)
    # padded rows contribute zero grad (their g rows are zero-padded)
    return dx[:n], ds.sum(axis=(0, 1)), db.sum(axis=(0, 1))


fused_layer_norm.defvjp(_fwd_vjp, _bwd_vjp)


def fused_layer_norm_interpret(x, scale, bias, eps: float = 1e-12):
    """Interpret-mode forward for CPU tests."""
    return _fwd(x, scale, bias, eps, interpret=True)

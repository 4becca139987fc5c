"""Train-state pytrees.

Everything the reference keeps as module attributes / registered buffers
(/root/reference/src/moco.py:187-221: encoder_q, encoder_k EMA copy,
queue, queue_ptr) plus optimizer state and step live here as one explicit
pytree — so EMA updates are tree_maps, checkpointing is one orbax save,
and the whole state donates cleanly into the jitted train step.
"""

from __future__ import annotations

import logging
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from czechtriever_tpu.models import bert
from czechtriever_tpu.ops.pooling import l2_normalize


@struct.dataclass
class InBatchState:
    """Single shared encoder (reference InBatch, src/inbatch.py:17-30)."""

    step: jnp.ndarray          # int32 scalar, optimizer steps completed
    params: Any                # encoder params
    opt_state: Any
    init_params: Optional[Any] = None  # for weight_decay_from_init


@struct.dataclass
class MoCoState:
    """MoCo dual encoder + negative queue (src/moco.py:187-224)."""

    step: jnp.ndarray
    params_q: Any
    params_k: Any              # EMA copy, never receives gradients
    opt_state: Any
    queue: jnp.ndarray         # [queue_size, proj_size] ring buffer
    queue_ptr: jnp.ndarray     # int32 scalar
    init_params: Optional[Any] = None


@struct.dataclass
class DistillState:
    """MoCoDistill student + frozen teacher (reference distill.py topology:
    the teacher is rank 0's separate fp16 model, distill.py:504-509; here
    it is a second frozen param tree time-sliced on the same mesh)."""

    step: jnp.ndarray
    params_q: Any
    params_k: Any
    opt_state: Any
    queue: jnp.ndarray
    queue_ptr: jnp.ndarray
    params_t: Any              # teacher params, never updated
    init_params: Optional[Any] = None


def init_queue(rng: jax.Array, queue_size: int, proj_size: int,
               dtype=jnp.float32) -> jnp.ndarray:
    """L2-normalized randn queue init (src/moco.py:218-219; the reference
    normalizes along the feature dim)."""
    q = jax.random.normal(rng, (queue_size, proj_size), jnp.float32)
    return l2_normalize(q, axis=-1).astype(dtype)


def _master_cast(cfg, params):
    """Place params at the master-weight dtype (--param_dtype, f32
    default). bf16 masters halve the params/EMA HBM footprint at an
    optimizer-precision cost; integer leaves pass through untouched."""
    pd = jnp.dtype(getattr(cfg, "param_dtype", "float32") or "float32")

    def cast(x):
        x = jnp.asarray(x)
        return x.astype(pd) if jnp.issubdtype(x.dtype, jnp.floating) else x

    return jax.tree.map(cast, params)


def create_inbatch_state(rng: jax.Array, cfg, mcfg: bert.BertConfig, tx,
                         params: Optional[Any] = None) -> InBatchState:
    if params is None:
        params = bert.init_params(rng, mcfg)
    params = _master_cast(cfg, params)
    init_params = (jax.tree.map(jnp.copy, params)
                   if cfg.weight_decay_from_init else None)
    return InBatchState(step=jnp.int32(0), params=params,
                        opt_state=tx.init(params), init_params=init_params)


def create_moco_state(rng: jax.Array, cfg, mcfg: bert.BertConfig, tx,
                      params: Optional[Any] = None) -> MoCoState:
    p_rng, q_rng = jax.random.split(rng)
    if params is None:
        params = bert.init_params(p_rng, mcfg)
    params = _master_cast(cfg, params)
    # encoder_k starts as an exact copy of encoder_q (src/moco.py:211-215)
    params_k = jax.tree.map(jnp.copy, params)
    init_params = (jax.tree.map(jnp.copy, params)
                   if cfg.weight_decay_from_init else None)
    queue_dtype = jnp.dtype(getattr(cfg, "queue_dtype", "float32"))
    if queue_dtype != jnp.float32:
        logging.getLogger(__name__).info(
            "MoCo negative queue stored as %s (reference keeps f32, "
            "src/moco.py:218-221; pass --queue_dtype float32 for strict "
            "parity)", queue_dtype.name)
    return MoCoState(
        step=jnp.int32(0), params_q=params, params_k=params_k,
        opt_state=tx.init(params),
        queue=init_queue(q_rng, cfg.queue_size, cfg.projection_size,
                         dtype=queue_dtype),
        queue_ptr=jnp.int32(0), init_params=init_params)


def create_distill_state(rng: jax.Array, cfg, mcfg: bert.BertConfig,
                         tcfg, tx,
                         params: Optional[Any] = None,
                         teacher_params: Optional[Any] = None) -> DistillState:
    """``tcfg``: bert.BertConfig or gemma.GemmaConfig (the reference
    teacher's decoder-LM family, distill.py:504-509)."""
    p_rng, q_rng, t_rng = jax.random.split(rng, 3)
    moco = create_moco_state(jax.random.fold_in(p_rng, 0), cfg, mcfg, tx,
                             params=params)
    if teacher_params is None:
        from czechtriever_tpu.models import gemma
        init = (gemma.init_params if isinstance(tcfg, gemma.GemmaConfig)
                else bert.init_params)
        teacher_params = init(t_rng, tcfg)
    teacher_params = jax.tree.map(jnp.asarray, teacher_params)
    del q_rng
    return DistillState(
        step=moco.step, params_q=moco.params_q, params_k=moco.params_k,
        opt_state=moco.opt_state, queue=moco.queue,
        queue_ptr=moco.queue_ptr, params_t=teacher_params,
        init_params=moco.init_params)


def _teacher_specs(tcfg, model: int):
    """TP PartitionSpecs for the frozen teacher, or None to replicate.

    The reference's actual teacher (bge-multilingual-gemma2, 9B params,
    distill.py:504-509) does not fit one v5e chip at bf16 (~18 GB vs
    16 GB HBM) — sharding it over the model axis is how that config runs
    at all. GQA needs the kv head count divisible by the axis size for an
    even shard; fall back to replication (with a note) otherwise."""
    from czechtriever_tpu.models import gemma
    if isinstance(tcfg, gemma.GemmaConfig):
        if (tcfg.num_key_value_heads % model
                or tcfg.num_attention_heads % model):
            logging.getLogger(__name__).warning(
                "teacher heads (%d q / %d kv) not divisible by model "
                "axis %d; replicating the teacher",
                tcfg.num_attention_heads, tcfg.num_key_value_heads, model)
            return None
        return gemma.partition_specs(tcfg)
    if isinstance(tcfg, bert.BertConfig):
        if tcfg.num_attention_heads % model:
            logging.getLogger(__name__).warning(
                "teacher heads (%d) not divisible by model axis %d; "
                "replicating the teacher", tcfg.num_attention_heads, model)
            return None
        return bert.partition_specs(tcfg)
    logging.getLogger(__name__).warning(
        "unknown teacher config type %s: replicating the teacher on the "
        "TP mesh (a multi-GB teacher replicated per-chip is exactly the "
        "OOM the model axis exists to avoid)", type(tcfg).__name__)
    return None


def _place_opt_state(mesh, opt_state, params, tx):
    """Re-place an existing (possibly checkpoint-restored) optimizer state
    onto the sharded params' layout.

    ``tx.init(params)`` here would silently zero the Adam moments and
    reset the optax schedule count on a TP resume — the trainer routes
    restored states through place_state (trainer.py:125), so the restored
    values must survive. Target shardings come from an AOT lowering of
    tx.init over the already-placed params: moment leaves inherit exactly
    the param shardings, scalar leaves (counts) replicate. Falls back to
    a fresh init only when the restored state's tree structure does not
    match this optimizer (e.g. --reset_optimizer semantics,
    /root/reference/src/utils.py:85-90)."""
    abstract = jax.eval_shape(tx.init, params)
    if (jax.tree.structure(abstract) != jax.tree.structure(opt_state)):
        logging.getLogger(__name__).warning(
            "restored optimizer state does not match the current "
            "optimizer's structure; re-initializing (moments reset)")
        return tx.init(params)
    from jax.sharding import NamedSharding, PartitionSpec

    # Eager tx.init over the placed params propagates their shardings to
    # the moment leaves (zeros_like keeps sharding); the fresh zeros are
    # dropped immediately — only their shardings are kept. Scalar leaves
    # (adam/schedule counts) may come back single-device: replicate those.
    fresh = tx.init(params)
    rep = NamedSharding(mesh, PartitionSpec())
    shardings = jax.tree.map(
        lambda x: (x.sharding
                   if len(x.sharding.device_set) == mesh.size else rep),
        fresh)
    for leaf in jax.tree.leaves(fresh):
        leaf.delete()
    return jax.tree.map(
        lambda leaf, s: jax.device_put(jnp.asarray(leaf), s),
        opt_state, shardings)


def place_state(mesh, state, mcfg: bert.BertConfig, tx, tcfg=None):
    """Place a train state on the mesh.

    model axis == 1: fully replicate (the reference's DDP layout, where
    every rank holds the whole model, train.py:482-489). model axis > 1:
    Megatron-style tensor parallelism — encoder params (and, for distill,
    the teacher) sharded over the model axis via partition_specs, the
    optimizer state re-placed onto the sharded params' layout (values
    preserved — see _place_opt_state), queue/step/pointer replicated.
    XLA inserts the row-parallel psums from the annotations.
    """
    from jax.sharding import NamedSharding
    from czechtriever_tpu.parallel import mesh as meshlib

    model = mesh.shape.get(meshlib.MODEL_AXIS, 1)
    if model <= 1:
        return meshlib.replicate(mesh, state)
    specs = bert.partition_specs(mcfg)

    def put(tree, tree_specs):
        return jax.tree.map(
            lambda p, s: jax.device_put(p, NamedSharding(mesh, s)),
            tree, tree_specs)

    rep = meshlib.replicated(mesh)
    repl = lambda tree: jax.tree.map(
        lambda p: jax.device_put(p, rep), tree)

    if isinstance(state, InBatchState):
        params = put(state.params, specs)
        return state.replace(
            params=params,
            opt_state=_place_opt_state(mesh, state.opt_state, params, tx),
            step=jax.device_put(state.step, rep),
            init_params=(None if state.init_params is None
                         else put(state.init_params, specs)))

    params_q = put(state.params_q, specs)
    extra = {}
    if isinstance(state, DistillState):
        tspecs = _teacher_specs(tcfg, model) if tcfg is not None else None
        extra["params_t"] = (repl(state.params_t) if tspecs is None
                             else put(state.params_t, tspecs))
    return state.replace(
        params_q=params_q, params_k=put(state.params_k, specs),
        opt_state=_place_opt_state(mesh, state.opt_state, params_q, tx),
        queue=jax.device_put(state.queue, rep),
        queue_ptr=jax.device_put(state.queue_ptr, rep),
        step=jax.device_put(state.step, rep),
        init_params=(None if state.init_params is None
                     else put(state.init_params, specs)), **extra)


def state_memory_plan(mesh, cfg, mcfg: bert.BertConfig, tcfg=None,
                      teacher_dtype="bfloat16") -> dict:
    """Per-chip resident STATE bytes for a (distill) training run,
    derived from code rather than hand arithmetic: ``jax.eval_shape``
    over ``create_distill_state`` paired with the exact PartitionSpecs
    ``place_state`` uses (``NamedSharding.shard_shape`` does the
    division). Mechanizes the docs/PERF.md "9B bf16 teacher on a v5e-8"
    table so the plan can't rot when partition_specs change (round-4
    ask #7; reference topology: distill.py:504-509).

    ``teacher_dtype``: storage dtype of the loaded teacher checkpoint
    (bge-multilingual-gemma2 ships bf16 shards); float leaves of the
    teacher are costed at this dtype.

    Returns {component: bytes-per-chip} plus a "total" key. Nothing is
    allocated — safe to call at the real 9B geometry on any backend.
    """
    from jax.sharding import NamedSharding, PartitionSpec
    from czechtriever_tpu.parallel import mesh as meshlib

    key = jax.random.key(0)
    if tcfg is None:
        raise ValueError("state_memory_plan costs the distill topology; "
                         "pass tcfg")
    from czechtriever_tpu.models import gemma
    t_init = (gemma.init_params if isinstance(tcfg, gemma.GemmaConfig)
              else bert.init_params)
    t_abs = jax.eval_shape(lambda k: t_init(k, tcfg), key)
    tdt = jnp.dtype(teacher_dtype)
    t_abs = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(
            s.shape, tdt if jnp.issubdtype(s.dtype, jnp.floating)
            else s.dtype), t_abs)

    class _TxStub:  # optimizer stub: only state SHAPES matter here, and
        init = staticmethod(lambda params: None)  # moments are costed
        # explicitly below as 2x params_q (Adam mu+nu, _place_opt_state)

    abstract = jax.eval_shape(
        lambda k, tp: create_distill_state(k, cfg, mcfg, tcfg, _TxStub(),
                                           teacher_params=tp),
        key, t_abs)

    model = mesh.shape.get(meshlib.MODEL_AXIS, 1)
    rep = NamedSharding(mesh, PartitionSpec())

    def per_chip(tree, specs=None) -> int:
        if specs is None:
            shardings = jax.tree.map(lambda _: rep, tree)
        else:
            shardings = jax.tree.map(
                lambda _, s: NamedSharding(mesh, s), tree, specs)
        import math
        total = 0
        for leaf, sh in zip(jax.tree.leaves(tree),
                            jax.tree.leaves(shardings)):
            shard = sh.shard_shape(leaf.shape)
            total += math.prod(shard) * jnp.dtype(leaf.dtype).itemsize
        return total

    sspecs = bert.partition_specs(mcfg) if model > 1 else None
    tspecs = (_teacher_specs(tcfg, model)
              if model > 1 and tcfg is not None else None)
    plan = {
        "teacher_params": per_chip(abstract.params_t, tspecs),
        "student_params_q": per_chip(abstract.params_q, sspecs),
        "student_params_k": per_chip(abstract.params_k, sspecs),
        # Adam mu + nu mirror params_q's placement (_place_opt_state)
        "adam_moments": 2 * per_chip(abstract.params_q, sspecs),
        "queue": per_chip(abstract.queue),
    }
    plan["total"] = sum(plan.values())
    return plan

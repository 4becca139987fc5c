"""Optimizer construction (optax), matching reference set_optim
(/root/reference/src/utils.py:137-166) + the clip behavior of the train
loop (train.py:314-322): clip is applied to the *accumulated* gradients,
before AdamW.

Torch-AdamW <-> optax-adamw parity notes:
  * torch decoupled weight decay multiplies by lr (p -= lr*wd*p); optax
    adamw likewise adds wd*p to the update before the lr scaling — same.
  * when ``weight_decay_from_init`` is on, the reference constructs AdamW
    *without* weight decay (src/utils.py:139-143) and adds an explicit
    L2-from-init term to the loss instead — we do the same.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from czechtriever_tpu.ops.schedules import make_schedule


def make_optimizer(cfg) -> optax.GradientTransformation:
    if cfg.optim not in ("adamw", "sam", "asam"):
        raise NotImplementedError("optimizer class not implemented")

    warmup = max(0, cfg.warmup_steps)
    schedule = make_schedule(cfg.scheduler, cfg.lr, warmup,
                             cfg.total_steps, cfg.lr_min_ratio)
    chain = []
    if cfg.clip_gradients:
        if cfg.max_grad_value is not None:
            chain.append(optax.clip(cfg.max_grad_value))
        elif cfg.max_grad_norm is not None:
            chain.append(optax.clip_by_global_norm(cfg.max_grad_norm))
    wd = 0.0 if cfg.weight_decay_from_init else cfg.weight_decay
    base = optax.adamw(learning_rate=schedule, b1=cfg.beta1,
                       b2=cfg.beta2, eps=cfg.eps, weight_decay=wd)
    if cfg.optim in ("sam", "asam"):
        # sharpness-aware minimization (the reference's SAM branch at
        # finetuning.py:75-80 references a first_step/second_step
        # optimizer it never constructs — this is the working version).
        # optax.contrib.sam alternates a normalized adversarial ascent
        # step (radius rho) with the real descent step, so effective
        # descent steps come every sync_period=2 calls. "asam" uses the
        # adaptive (parameter-scaled) perturbation.
        import optax.contrib as oc
        adv = optax.chain(
            oc.normalize(),
            optax.sgd(learning_rate=cfg.rho),
        )
        # asam: scale the perturbation by |w| before normalizing
        if cfg.optim == "asam":
            adv = optax.chain(_asam_scale(), oc.normalize(),
                              optax.sgd(learning_rate=cfg.rho))
        base = oc.sam(optimizer=base, adv_optimizer=adv, sync_period=2)
    chain.append(base)
    return optax.chain(*chain)


def _asam_scale() -> optax.GradientTransformation:
    """Adaptive SAM: elementwise-scale grads by |param| before the
    normalized ascent step (Kwon et al. 2021)."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        assert params is not None, "asam needs params"
        return (jax.tree.map(lambda g, p: g * jnp.abs(p), updates, params),
                state)

    return optax.GradientTransformation(init, update)

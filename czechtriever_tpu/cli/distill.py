"""Distillation pre-training CLI (reference distill.py).

Trains a MoCo student against a frozen teacher: per step the student
optimizes (1 - w) * contrastive + w * 100 * MSE(sim_student, sim_teacher)
(distill.py:274-284). The reference runs the teacher as a dedicated rank-0
NCCL service process (distill.py:378-419); here the teacher is a second
frozen param tree time-sliced on the same TPU mesh (see
training/distill.py for the topology rationale).

Usage:
  python -m czechtriever_tpu.cli.distill \\
      --train_data corpus.u16bin --distill_weight 0.5 \\
      --teacher_model_id models/teacher --queue_size 131072 ...
"""

from __future__ import annotations

import json
import logging
import os
import sys

import numpy as np

from czechtriever_tpu.config import Config
from czechtriever_tpu.cli import common
from czechtriever_tpu.cli.train import build_val_dataset, make_eval_hook
from czechtriever_tpu.data.datasets import AugmentSpec, PairBatcher
from czechtriever_tpu.data.tokenstream import TokenStream
from czechtriever_tpu.models import bert, hf_interop
from czechtriever_tpu.parallel import mesh as meshlib
from czechtriever_tpu.training.trainer import Trainer
from czechtriever_tpu.utils.logging_utils import MetricsLogger, init_logger

logger = logging.getLogger(__name__)


def resolve_teacher(cfg: Config, mcfg: bert.BertConfig):
    """Teacher config + params. A local HF dir may hold either family:
    a decoder LM with gemma geometry (the reference's actual teacher,
    BAAI/bge-multilingual-gemma2 — distill.py:504-509; detected via
    ``model_type``/GQA keys in config.json) or any BERT-family encoder.
    Falls back to a random-init copy of the student geometry for smoke
    runs."""
    tdir = common.resolve_model_dir(cfg.teacher_model_id)
    if tdir is not None:
        with open(os.path.join(tdir, "config.json")) as f:
            hf_cfg = json.load(f)
        is_decoder_lm = ("gemma" in str(hf_cfg.get("model_type", ""))
                         or "num_key_value_heads" in hf_cfg)
        if is_decoder_lm:
            from czechtriever_tpu.models import gemma
            tcfg = gemma.GemmaConfig.from_hf_dict(hf_cfg)
            tcfg = gemma.GemmaConfig(**{**tcfg.__dict__,
                                        "dtype": cfg.dtype})
            try:
                tparams, tcfg = gemma.load_hf_dir(tdir)
                tcfg = gemma.GemmaConfig(**{**tcfg.__dict__,
                                            "dtype": cfg.dtype})
            except FileNotFoundError:
                import jax
                logger.warning("no weight file in %s; random-init gemma "
                               "teacher", tdir)
                tparams = gemma.init_params(
                    jax.random.key(cfg.seed + 99), tcfg)
        else:
            tcfg = bert.BertConfig.from_hf_dict(hf_cfg)
            tcfg = bert.BertConfig(**{**tcfg.__dict__, "dtype": cfg.dtype,
                                      "hidden_dropout_prob": 0.0,
                                      "attention_probs_dropout_prob": 0.0})
            try:
                tparams, _ = hf_interop.load_hf_dir(tdir)
            except FileNotFoundError:
                import jax
                logger.warning("no weight file in %s; random-init teacher",
                               tdir)
                tparams = bert.init_params(
                    jax.random.key(cfg.seed + 99), tcfg)
        ttok = None
        try:
            from czechtriever_tpu.data.tokenizer import load_tokenizer
            ttok = load_tokenizer(tdir)
        except Exception:
            pass
        return tcfg, tparams, ttok
    logger.warning("teacher %r not found locally; using a random-init "
                   "teacher with the student geometry", cfg.teacher_model_id)
    import jax
    tcfg = bert.BertConfig(**{**mcfg.__dict__, "hidden_dropout_prob": 0.0,
                              "attention_probs_dropout_prob": 0.0})
    return tcfg, bert.init_params(jax.random.key(cfg.seed + 99), tcfg), None


def main(argv=None) -> None:
    cfg = Config.from_args(argv).replace(contrastive_mode="distill")
    init_logger(cfg.output_dir)
    cfg.print_options()
    from czechtriever_tpu.utils.slurm import init_signal_handler
    init_signal_handler()  # SLURM preemption requeue (src/slurm.py:35-40)
    meshlib.init_distributed()
    mesh = meshlib.make_mesh(cfg.mesh_data, cfg.mesh_model)

    params, mcfg, tokenizer = common.resolve_model(cfg)
    tcfg, tparams, teacher_tok = resolve_teacher(cfg, mcfg)
    spec = AugmentSpec.from_config(cfg, tokenizer)
    if spec.bos_token_id is None and tokenizer is None:
        spec.bos_token_id, spec.eos_token_id = 101, 102
        spec.mask_id, spec.vocab_size = 103, mcfg.vocab_size

    if not cfg.train_data:
        raise SystemExit("--train_data is required (uint16 token file)")
    # per-process feeding (see cli/train.py): each process builds only
    # its feed group's rows
    feed_id, num_feeds, n_local = meshlib.data_feed_info(mesh)
    stream = TokenStream(
        cfg.train_data[0], cfg.chunk_length,
        total_tokens=cfg.total_tokens, seed=cfg.seed,
        shard_id=feed_id, num_shards=num_feeds)
    batcher = PairBatcher(stream, spec,
                          batch_size=cfg.per_device_batch_size * n_local,
                          seed=cfg.seed, prefetch=cfg.num_workers)
    val_dataset = build_val_dataset(cfg, spec, tokenizer)

    metrics = MetricsLogger(cfg.output_dir) if meshlib.is_main() else None
    trainer = Trainer(cfg, mcfg, mesh=mesh,
                      init_params=common.init_or_load_params(cfg, mcfg, params),
                      eval_hook=make_eval_hook(cfg, val_dataset, tokenizer,
                                               metrics, mesh),
                      metrics=metrics, local_batches=True,
                      teacher_mcfg=tcfg, teacher_params=tparams)
    # teacher with its own vocabulary: decode + re-tokenize queries with
    # the instruction prompt (distill.py:395-405)
    epoch_fn = batcher.epoch
    if teacher_tok is not None and tokenizer is not None and \
            getattr(teacher_tok, "vocab_size", None) != getattr(
                tokenizer, "vocab_size", None):
        from czechtriever_tpu.data.datasets import (DISTILL_TASK,
                                                    get_detailed_instruct,
                                                    make_teacher_retokenizer)
        # crop-aware static teacher length: instruction prompt + the crop
        # distribution's support + slack, sublane-rounded — the reference
        # pads to the batch max with pad_to_multiple_of=8 (distill.py:
        # 398-405); a fixed 512 would quadruple the (per-token-priced)
        # teacher forward for ~130-token crops
        prompt_tokens = len(teacher_tok.encode(
            get_detailed_instruct(DISTILL_TASK, "")))
        crop_max = int(cfg.chunk_length * min(cfg.ratio_max, 1.0))
        t_len = -(-(prompt_tokens + crop_max + 16) // 8) * 8
        retok = make_teacher_retokenizer(
            tokenizer, teacher_tok,
            max_length=min(tcfg.max_position_embeddings, 512, t_len))

        def epoch_fn():
            return (retok(b) for b in batcher.epoch())

    start = trainer.maybe_resume()
    logger.info("Distilling from step %d (w=%.2f, teacher hidden=%d)",
                start, cfg.distill_weight, tcfg.hidden_size)
    trainer.fit(epoch_fn, on_epoch_start=stream.generate_offset)
    trainer.save("final")
    logger.info("Done at step %d", int(np.asarray(trainer.state.step)))


if __name__ == "__main__":
    main(sys.argv[1:])

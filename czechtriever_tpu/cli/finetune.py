"""Supervised finetuning CLI (reference finetuning.py).

Finetunes an encoder on (query, gold, negatives) triplets with the
InBatch objective where keys = [golds; negatives]
(finetuning.py:25-120); evaluates accuracy + MRR on --eval_data
(finetuning.py:123-196) and optionally BEIR sets at each eval_freq.

Usage:
  python -m czechtriever_tpu.cli.finetune \\
      --train_data train.jsonl --eval_data dev.jsonl \\
      --retriever_model_id models/czert --negative_ctxs 4 \\
      --negative_hard_ratio 0.2 --chunk_length 200 ...
"""

from __future__ import annotations

import logging
import sys

import numpy as np

from czechtriever_tpu.config import Config
from czechtriever_tpu.cli import common
from czechtriever_tpu.data.finetuning import (TripletBatcher, TripletCollator,
                                              TripletDataset)
from czechtriever_tpu.evaluation import beir as beir_eval
from czechtriever_tpu.parallel import mesh as meshlib
from czechtriever_tpu.training.finetune import evaluate_finetune
from czechtriever_tpu.training.trainer import Trainer
from czechtriever_tpu.utils.logging_utils import MetricsLogger, init_logger

logger = logging.getLogger(__name__)


def make_eval_hook(cfg: Config, eval_batcher, tokenizer, metrics, mesh):
    def hook(trainer: Trainer, step: int):
        params = trainer.encoder_params
        if eval_batcher is not None:
            m = evaluate_finetune(params, trainer.mcfg, cfg, eval_batcher,
                                  batch_size=cfg.per_device_eval_batch_size)
            if m and meshlib.is_main():
                logger.info("eval acc: %.2f%% | eval mrr: %.3f @%d",
                            m["eval_acc"], m["mrr"], step)
                if metrics:
                    metrics.log(step, m, prefix="finetune")
        for dataset in cfg.eval_datasets:
            res = beir_eval.evaluate_model(
                params, trainer.mcfg, tokenizer, dataset,
                beir_dir=cfg.eval_datasets_dir, norm_query=cfg.norm_query,
                norm_doc=cfg.norm_doc, lower_case=cfg.lower_case,
                normalize_text=cfg.eval_normalize_text, pooling=cfg.pooling,
                mesh=mesh, is_main=meshlib.is_main(),
                batch_size=cfg.per_device_eval_batch_size)
            if res and metrics:
                metrics.log(step, res, prefix=dataset)
    return hook


def main(argv=None) -> None:
    cfg = Config.from_args(argv).replace(contrastive_mode="inbatch")
    # reference finetuning loads the pre-trained encoder from
    # --model_path (finetuning.py:223, load_retriever with MoCo/InBatch
    # prefix stripping — hf_interop.load_hf_dir applies the same)
    if cfg.model_path and cfg.model_path != "none":
        cfg = cfg.replace(retriever_model_id=cfg.model_path)
    init_logger(cfg.output_dir)
    cfg.print_options()
    from czechtriever_tpu.utils.slurm import init_signal_handler
    init_signal_handler()  # SLURM preemption requeue (src/slurm.py:35-40)
    meshlib.init_distributed()
    mesh = meshlib.make_mesh(cfg.mesh_data, cfg.mesh_model)

    params, mcfg, tokenizer = common.resolve_model(cfg)
    if tokenizer is None:
        raise SystemExit("finetuning needs a tokenizer (local model dir "
                         "with vocab.txt)")
    if not cfg.train_data:
        raise SystemExit("--train_data is required (DPR json/jsonl)")

    collator = TripletCollator(tokenizer, passage_maxlength=cfg.chunk_length)
    # per-process feeding (see cli/train.py): each process builds only
    # its feed group's rows
    feed_id, num_feeds, n_local = meshlib.data_feed_info(mesh)
    train_ds = TripletDataset(
        cfg.train_data, negative_ctxs=cfg.negative_ctxs,
        negative_hard_ratio=cfg.negative_hard_ratio,
        negative_hard_min_idx=cfg.negative_hard_min_idx, training=True,
        shard_id=feed_id if num_feeds > 1 else -1,
        num_shards=num_feeds, maxload=cfg.maxload,
        normalize=cfg.eval_normalize_text, seed=cfg.seed)
    local_batch = cfg.per_device_batch_size * n_local
    train_batcher = TripletBatcher(train_ds, collator, local_batch,
                                   seed=cfg.seed)
    eval_batcher = None
    if cfg.eval_data:
        eval_ds = TripletDataset(
            cfg.eval_data, training=False, maxload=cfg.maxload,
            shard_id=(meshlib.process_index()
                      if meshlib.process_count() > 1 else -1),
            num_shards=meshlib.process_count(),
            normalize=cfg.eval_normalize_text, seed=cfg.seed)
        eval_batcher = TripletBatcher(eval_ds, collator,
                                      cfg.per_device_eval_batch_size,
                                      shuffle=False)

    metrics = MetricsLogger(cfg.output_dir) if meshlib.is_main() else None
    trainer = Trainer(cfg, mcfg, mesh=mesh,
                      init_params=common.init_or_load_params(cfg, mcfg, params),
                      eval_hook=make_eval_hook(cfg, eval_batcher, tokenizer,
                                               metrics, mesh),
                      metrics=metrics, local_batches=True)
    start = trainer.maybe_resume()
    logger.info("Finetuning from step %d on %d examples", start,
                len(train_ds))
    trainer.fit(train_batcher.epoch)
    trainer.save("final")
    logger.info("Done at step %d", int(np.asarray(trainer.state.step)))


if __name__ == "__main__":
    main(sys.argv[1:])

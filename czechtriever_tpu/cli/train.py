"""Contrastive pre-training CLI (reference train.py).

Usage (reference-recipe flags, README.md:36-62):
  python -m czechtriever_tpu.cli.train \\
      --train_data corpus.u16bin --contrastive_mode moco \\
      --queue_size 131072 --temperature 0.05 --momentum 0.9995 \\
      --target_batch_size 2048 --per_device_batch_size 256 \\
      --total_steps 500000 --warmup_steps 20000 --lr 1e-5 \\
      --augmentation delete --prob_augmentation 0.1 \\
      --eval_datasets fit-eval --eval_datasets_dir BEIR/datasets
"""

from __future__ import annotations

import logging
import os
import sys

import numpy as np

from czechtriever_tpu.config import Config
from czechtriever_tpu.cli import common
from czechtriever_tpu.data.datasets import AugmentSpec, InMemoryDataset, PairBatcher
from czechtriever_tpu.data.tokenstream import TokenStream
from czechtriever_tpu.evaluation import beir as beir_eval
from czechtriever_tpu.parallel import mesh as meshlib
from czechtriever_tpu.training.trainer import Trainer
from czechtriever_tpu.training.validate import eval_loss
from czechtriever_tpu.utils.logging_utils import MetricsLogger, init_logger

logger = logging.getLogger(__name__)


def build_val_dataset(cfg: Config, spec: AugmentSpec, tokenizer):
    """Validation docs: binary token stream slice or tokenized jsonl
    (reference load_data val path, src/data.py:130-134)."""
    if not cfg.valid_data:
        return None
    path = cfg.valid_data[0]
    if path.endswith((".jsonl", ".json")) and tokenizer is not None:
        import json
        docs = []
        with open(path, encoding="utf-8") as f:
            for line in f:
                text = json.loads(line)["text"]
                ids = tokenizer.encode(text, add_special_tokens=False)
                if len(ids) > 1:
                    docs.append(np.asarray(ids, np.int32))
    else:
        stream = TokenStream(path, cfg.chunk_length, buffer_size=1000,
                             seed=cfg.seed + 7)
        docs = []
        for i, chunk in enumerate(stream):
            docs.append(chunk)
            if i + 1 >= 2000:
                break
    if not docs:
        return None
    return InMemoryDataset(docs, cfg.chunk_length, spec, seed=cfg.seed)


def make_eval_hook(cfg: Config, val_dataset, tokenizer, metrics, mesh):
    def hook(trainer: Trainer, step: int):
        params = trainer.encoder_params
        for dataset in cfg.eval_datasets:
            res = beir_eval.evaluate_model(
                params, trainer.mcfg, tokenizer, dataset,
                beir_dir=cfg.eval_datasets_dir, norm_query=cfg.norm_query,
                norm_doc=cfg.norm_doc, lower_case=cfg.lower_case,
                normalize_text=cfg.eval_normalize_text, pooling=cfg.pooling,
                mesh=mesh, is_main=meshlib.is_main(),
                batch_size=cfg.per_device_eval_batch_size)
            logger.info("BEIR %s @%d: %s", dataset, step,
                        {k: round(v, 2) for k, v in res.items()
                         if "@10" in k or "@100" in k})
            if metrics and res:
                metrics.log(step, res, prefix=dataset)
        if val_dataset is not None and meshlib.is_main():
            corpus = val_dataset.get_passage_from_all_docs()
            vm = eval_loss(params, trainer.mcfg, cfg, val_dataset, corpus,
                           step, cfg.output_dir)
            logger.info("val @%d: %s", step, vm)
            if metrics and vm:
                metrics.log(step, vm, prefix="val")
    return hook


def main(argv=None) -> None:
    cfg = Config.from_args(argv)
    init_logger(cfg.output_dir)
    cfg.print_options()
    from czechtriever_tpu.utils.slurm import init_signal_handler
    init_signal_handler()  # SLURM preemption requeue (src/slurm.py:35-40)
    meshlib.init_distributed()
    mesh = meshlib.make_mesh(cfg.mesh_data, cfg.mesh_model)

    params, mcfg, tokenizer = common.resolve_model(cfg)
    spec = AugmentSpec.from_config(cfg, tokenizer)
    if spec.bos_token_id is None and tokenizer is None:
        # pure-stream training without a tokenizer: BERT default specials
        spec.bos_token_id, spec.eos_token_id = 101, 102
        spec.mask_id, spec.vocab_size = 103, mcfg.vocab_size

    if not cfg.train_data:
        raise SystemExit("--train_data is required (uint16 token file "
                         "or jsonl)")
    global_batch = (cfg.per_device_batch_size
                    * mesh.shape[meshlib.DATA_AXIS])
    on_epoch_start = None
    if cfg.train_data[0].endswith((".jsonl", ".json")):
        # tokenizer-in-the-loop jsonl paths (reference LazyDataset /
        # LazyDatasetNoBounds, src/data.py:164-420, picked by
        # orig_sampling like load_data at src/data.py:105-136)
        if tokenizer is None:
            raise SystemExit("jsonl training needs a tokenizer "
                             "(local model dir with vocab.txt)")
        from czechtriever_tpu.data import lazy
        from czechtriever_tpu.data.datasets import IndexedPairBatcher
        path = cfg.train_data[0]
        if cfg.orig_sampling:
            if cfg.offsets_file and os.path.exists(cfg.offsets_file):
                offsets, cumsums = lazy.load_line_index(cfg.offsets_file)
            else:
                offsets, cumsums = lazy.build_line_index(path, tokenizer)
            dataset = lazy.LazyJsonlNoBounds(
                path, tokenizer, spec, cfg.chunk_length, offsets, cumsums,
                normalize_text=cfg.normalize_text, seed=cfg.seed)
            on_epoch_start = dataset.generate_offset
        else:
            offsets = None
            if cfg.offsets_file and os.path.exists(cfg.offsets_file):
                offsets, _ = lazy.load_line_index(cfg.offsets_file)
            dataset = lazy.LazyJsonlDataset(
                path, tokenizer, spec, cfg.chunk_length, offsets=offsets,
                normalize_text=cfg.normalize_text, seed=cfg.seed)
        batcher = IndexedPairBatcher(
            dataset, global_batch, max_length=cfg.chunk_length + 2,
            seed=cfg.seed, shard_id=meshlib.process_index(),
            num_shards=meshlib.process_count(), prefetch=cfg.num_workers)
    else:
        stream = TokenStream(
            cfg.train_data[0], cfg.chunk_length,
            total_tokens=cfg.total_tokens, seed=cfg.seed,
            shard_id=meshlib.process_index(),
            num_shards=meshlib.process_count())
        batcher = PairBatcher(stream, spec, batch_size=global_batch,
                              seed=cfg.seed, prefetch=cfg.num_workers)
        on_epoch_start = stream.generate_offset
    val_dataset = build_val_dataset(cfg, spec, tokenizer)

    metrics = MetricsLogger(cfg.output_dir) if meshlib.is_main() else None
    trainer = Trainer(cfg, mcfg, mesh=mesh,
                      init_params=common.init_or_load_params(cfg, mcfg, params),
                      eval_hook=make_eval_hook(cfg, val_dataset, tokenizer,
                                               metrics, mesh),
                      metrics=metrics)
    start = trainer.maybe_resume()
    logger.info("Training from step %d (update_freq=%d, global microbatch=%d)",
                start, trainer.update_freq, trainer.global_micro)
    trainer.fit(batcher.epoch, on_epoch_start=on_epoch_start)
    trainer.save("final")
    logger.info("Done at step %d", int(np.asarray(trainer.state.step)))


if __name__ == "__main__":
    main(sys.argv[1:])

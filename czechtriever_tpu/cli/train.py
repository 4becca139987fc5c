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
from czechtriever_tpu.utils import checkpoint as ckpt
from czechtriever_tpu.utils.logging_utils import MetricsLogger, init_logger

logger = logging.getLogger(__name__)


def _carve_val_from_train(cfg: Config, spec: AugmentSpec, tokenizer):
    """--val_data_ratio fallback when no --valid_data is given: carve
    validation docs out of the training corpus. The reference parses the
    flag but never consumes it (src/options.py:53-59); we implement its
    documented intent ("ratio of training data used for validation" —
    the val docs overlap the train set, exactly like the reference's
    hand-made valid_data files). Capped at 2000 docs so the val sweep
    stays bounded."""
    path = cfg.train_data[0]
    cap = 2000
    if os.path.isdir(path):  # preprocessed shard dir: use --valid_data dirs
        return None
    if path.endswith((".jsonl", ".json")):
        if tokenizer is None:
            return None
        import json
        with open(path, "rb") as f:
            n_lines = sum(1 for _ in f)
        n_val = min(cap, max(1, int(cfg.val_data_ratio * n_lines)))
        take = set(np.linspace(0, n_lines - 1, n_val).astype(int).tolist())
        docs = []
        with open(path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                if i in take:
                    ids = tokenizer.encode(json.loads(line)["text"],
                                           add_special_tokens=False)
                    if len(ids) > 1:
                        docs.append(np.asarray(ids, np.int32))
    else:
        stream = TokenStream(path, cfg.chunk_length,
                             total_tokens=cfg.total_tokens,
                             buffer_size=1000, seed=cfg.seed + 7)
        n_val = min(cap, max(1, int(cfg.val_data_ratio * stream.n_chunks)))
        docs = []
        for i, chunk in enumerate(stream):
            docs.append(chunk)
            if i + 1 >= n_val:
                break
    if not docs:
        return None
    logger.info("No --valid_data: carved %d val docs from the training "
                "data (val_data_ratio=%g)", len(docs), cfg.val_data_ratio)
    return InMemoryDataset(docs, cfg.chunk_length, spec, seed=cfg.seed)


def build_multicorpus_batcher(cfg: Config, spec: AugmentSpec, tokenizer,
                              batch_size: int, shard_id: int = 0,
                              num_shards: int = 1):
    """The full reference ``load_data`` dispatcher (src/data.py:105-136 +
    load_and_tokenize_datasets :58-76): every --train_data path becomes
    one member of a MultiDataset mixture with sampling prob ∝
    len^sampling_coefficient. Sources may be preprocessed shard dirs
    (--data_preprocessed / --loading_mode, src/data.py:140-160), jsonl
    corpora (tokenized fully, like tokenize_jsonl_file), or uint16 token
    streams (random-access memmap view, beyond-reference). Returns
    (batcher, mixture)."""
    from czechtriever_tpu.data import passages
    from czechtriever_tpu.data.datasets import (
        IndexedPairBatcher, MultiDataset, StreamChunkDataset,
        load_tokenized_jsonl)
    sources = {}
    for path in cfg.train_data:
        if os.path.isdir(path):
            docs = passages.load_preprocessed_shards(
                path, cfg.loading_mode,
                shard_id=shard_id, num_shards=num_shards)
            if docs:
                sources[path] = InMemoryDataset(
                    docs, cfg.chunk_length, spec, seed=cfg.seed)
            else:
                logger.warning("no docs loaded from %s; skipping", path)
        elif path.endswith((".jsonl", ".json")):
            if tokenizer is None:
                raise SystemExit("jsonl training needs a tokenizer "
                                 "(local model dir with vocab.txt)")
            docs = load_tokenized_jsonl(path, tokenizer, cfg.normalize_text,
                                        maxload=cfg.maxload)
            sources[path] = InMemoryDataset(
                docs, cfg.chunk_length, spec, seed=cfg.seed)
        else:
            sources[path] = StreamChunkDataset(
                path, cfg.chunk_length, spec,
                total_tokens=cfg.total_tokens, seed=cfg.seed)
    if not sources:
        raise SystemExit("no usable --train_data sources")
    # per-feed sampling seed: each feed group draws its own mixture
    # stream (reference ranks do the same through per-rank torch seeds
    # under DistributedSampler)
    mixture = MultiDataset(sources, seed=cfg.seed + 7919 * shard_id)
    mixture.set_prob(coeff=cfg.sampling_coefficient)  # src/data.py:113
    logger.info("MultiDataset mixture: %s",
                {os.path.basename(p) or p: round(float(pr), 4)
                 for p, pr in zip(mixture.dataset_ids, mixture.prob)})
    batcher = IndexedPairBatcher(
        mixture, batch_size, max_length=cfg.chunk_length + 2,
        seed=cfg.seed, shard_id=shard_id,
        num_shards=num_shards, prefetch=cfg.num_workers,
        permute=False)  # MultiDataset draws randomly per access
    return batcher, mixture


def build_val_dataset(cfg: Config, spec: AugmentSpec, tokenizer):
    """Validation docs: binary token stream slice or tokenized jsonl
    (reference load_data val path, src/data.py:130-134)."""
    if not cfg.valid_data:
        if cfg.train_data and cfg.val_data_ratio and cfg.val_data_ratio > 0:
            return _carve_val_from_train(cfg, spec, tokenizer)
        return None
    path = cfg.valid_data[0]
    if os.path.isdir(path) or cfg.data_preprocessed:
        # preprocessed-shard validation corpora (reference load_data
        # val branch under data_preprocessed, src/data.py:115-121)
        from czechtriever_tpu.data import passages
        from czechtriever_tpu.data.datasets import MultiDataset
        sources = {}
        for p in cfg.valid_data:
            docs = passages.load_preprocessed_shards(p, cfg.loading_mode)
            if docs:
                sources[p] = InMemoryDataset(docs, cfg.chunk_length, spec,
                                             seed=cfg.seed)
        if not sources:
            return None
        if len(sources) == 1:
            return next(iter(sources.values()))
        mixture = MultiDataset(sources, seed=cfg.seed)
        mixture.set_prob(coeff=cfg.sampling_coefficient)
        return mixture
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
                score_function=cfg.score_function,
                batch_size=cfg.per_device_eval_batch_size,
                # corpus encode dominates the in-training eval's
                # wall-clock; reuse the trainer's packing row budget
                pack_rows=cfg.pack_rows)
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
        raise SystemExit("--train_data is required (uint16 token file, "
                         "jsonl, or preprocessed shard dir)")
    # per-process feeding: this process builds ONLY its own rows
    # (per_device_batch_size x its data-axis coords); the trainer
    # assembles the global batch with make_array_from_process_local_data
    # — full per-epoch shard coverage, no pcount-redundant host work
    # (reference: DistributedSampler, train.py:187-193)
    feed_id, num_feeds, n_local = meshlib.data_feed_info(mesh)
    local_batch = cfg.per_device_batch_size * n_local
    on_epoch_start = None
    multi_corpus = (cfg.data_preprocessed or len(cfg.train_data) > 1
                    or os.path.isdir(cfg.train_data[0]))
    if multi_corpus:
        batcher, mixture = build_multicorpus_batcher(
            cfg, spec, tokenizer, local_batch,
            shard_id=feed_id, num_shards=num_feeds)
        on_epoch_start = mixture.generate_offset
    elif cfg.train_data[0].endswith((".jsonl", ".json")):
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
                if cumsums is None and cfg.cumsums_file and \
                        os.path.exists(cfg.cumsums_file):
                    # reference ships offsets and cumulative token
                    # counts as two separate pickles
                    # (src/options.py:88-92); ours bundles them, but a
                    # reference-made pair loads via both flags
                    _, cumsums = lazy.load_line_index(cfg.cumsums_file)
                    if cumsums is None:
                        with open(cfg.cumsums_file, "rb") as f:
                            import pickle
                            cumsums = pickle.load(f)
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
            dataset, local_batch, max_length=cfg.chunk_length + 2,
            seed=cfg.seed, shard_id=feed_id,
            num_shards=num_feeds, prefetch=cfg.num_workers)
    else:
        stream = TokenStream(
            cfg.train_data[0], cfg.chunk_length,
            total_tokens=cfg.total_tokens, seed=cfg.seed,
            shard_id=feed_id, num_shards=num_feeds)
        batcher = PairBatcher(stream, spec, batch_size=local_batch,
                              seed=cfg.seed, prefetch=cfg.num_workers)
        on_epoch_start = stream.generate_offset
    val_dataset = build_val_dataset(cfg, spec, tokenizer)

    metrics = MetricsLogger(cfg.output_dir) if meshlib.is_main() else None
    trainer = Trainer(cfg, mcfg, mesh=mesh,
                      init_params=common.init_or_load_params(cfg, mcfg, params),
                      eval_hook=make_eval_hook(cfg, val_dataset, tokenizer,
                                               metrics, mesh),
                      metrics=metrics, local_batches=True)
    start = trainer.maybe_resume()
    # warm start / continuation from an explicit checkpoint: only when
    # the output dir has no checkpoint of its own (reference precedence,
    # train.py:458-476). --continue_training (or CONTINUE_TRAINING=true,
    # train.py:32-33) keeps optimizer state + step; default resets both.
    if (cfg.model_path not in (None, "", "none")
            and ckpt.latest_path(cfg.save_dir) is None):
        cont = (cfg.continue_training
                or os.getenv("CONTINUE_TRAINING", "False").lower() == "true")
        mp_path = ckpt.latest_path(cfg.model_path) or cfg.model_path
        if not os.path.isdir(mp_path):
            raise SystemExit(
                f"--model_path {cfg.model_path!r} is not a checkpoint "
                "directory (expected a save_dir or checkpoint dir made by "
                "this trainer); for HF-format initial weights use "
                "--retriever_model_id")
        start = trainer.resume_from(mp_path, full=cont)
    logger.info("Training from step %d (update_freq=%d, global microbatch=%d)",
                start, trainer.update_freq, trainer.global_micro)
    trainer.fit(batcher.epoch, on_epoch_start=on_epoch_start)
    trainer.save("final")
    ckpt.wait_pending()  # commit the final save before exiting
    logger.info("Done at step %d", int(np.asarray(trainer.state.step)))


if __name__ == "__main__":
    main(sys.argv[1:])

"""Offline passage retrieval + QA validation
(reference passage_retrieval.py).

Pipeline: load embedding shards -> build a Flat (or PQ) index ->
embed queries -> top-k search -> attach passages -> answer-string
validation (``qa.calculate_matches``) -> write enriched jsonl with
``ctxs`` + ``hasanswer`` and print R@k (passage_retrieval.py:148-200).

Query files are DPR-style json/jsonl with {question, answers}.

Usage:
  python -m czechtriever_tpu.cli.retrieve \\
      --model_name_or_path models/czert --passages passages.tsv \\
      --passages_embeddings "embeddings/passages_*" \\
      --data queries.jsonl --output_dir retrieved
"""

from __future__ import annotations

import argparse
import glob
import json
import logging
import os
import pickle
import sys
import time

import numpy as np

from czechtriever_tpu.cli import common
from czechtriever_tpu.config import Config
from czechtriever_tpu.data.normalize_text import normalize as normalize_fn
from czechtriever_tpu.data.passages import load_passages
from czechtriever_tpu.evaluation import qa
from czechtriever_tpu.evaluation.beir import DenseEncoder
from czechtriever_tpu.retrieval.flat import FlatIndex
from czechtriever_tpu.retrieval.ivf import IVFPQIndex
from czechtriever_tpu.retrieval.pq import PQIndex
from czechtriever_tpu.utils.logging_utils import init_logger

logger = logging.getLogger(__name__)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=str, nargs="+", required=True,
                   help="DPR-style query json/jsonl file(s)")
    p.add_argument("--passages", type=str, required=True)
    p.add_argument("--passages_embeddings", type=str, required=True,
                   help="glob over embedding shard pickles")
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--n_docs", type=int, default=100)
    p.add_argument("--validation_workers", type=int, default=8)
    p.add_argument("--per_gpu_batch_size", type=int, default=64)
    p.add_argument("--question_maxlength", type=int, default=512)
    p.add_argument("--indexing_batch_size", type=int, default=1_000_000)
    p.add_argument("--model_name_or_path", type=str, required=True)
    p.add_argument("--no_fp16", action="store_true")
    p.add_argument("--lowercase", action="store_true")
    p.add_argument("--normalize_text", action="store_true")
    p.add_argument("--pooling", type=str, default="average")
    # PQ compression (src/index.py:17-21): 0 = exact flat inner product
    p.add_argument("--n_subquantizers", type=int, default=0)
    p.add_argument("--n_bits", type=int, default=8)
    # exact re-rank over the compressed candidates (FAISS
    # IndexRefineFlat analogue, retrieval/refine.py): re-score the top
    # refine_factor*k ADC candidates against bf16 originals kept on
    # the host. 0 = off. Only meaningful for pq/ivfpq.
    p.add_argument("--refine_factor", type=int, default=0)
    # inverted-file variant (beyond the reference's flat PQ): probe only
    # the nprobe closest of nlist coarse clusters
    p.add_argument("--index_type", choices=("auto", "flat", "pq", "ivfpq"),
                   default="auto")
    p.add_argument("--nlist", type=int, default=1024)
    p.add_argument("--nprobe", type=int, default=32)
    # adaptive nprobe (opt-in): small query batches raise the probe
    # count until the union targets target_probe_lists lists (default
    # nlist//8). Only helps genuinely starved nprobe configs — at the
    # default np/nlist the pooled sweep measures no recall gap to
    # close (retrieval/ivf.py docstring)
    p.add_argument("--adaptive_nprobe", action="store_true")
    # deprecated no-op: adaptive nprobe defaulted ON for one round;
    # kept one release so round-4 invocations don't break loudly
    p.add_argument("--no_adaptive_nprobe", action="store_true",
                   help=argparse.SUPPRESS)
    p.add_argument("--target_probe_lists", type=int, default=None)
    p.add_argument("--save_or_load_index", action="store_true",
                   help="serialize the index beside the embeddings, or "
                        "load it if already present")
    return p


def load_query_data(path: str):
    """DPR query file reader (passage_retrieval.py:140-150)."""
    if path.endswith(".json"):
        with open(path, encoding="utf-8") as f:
            return json.load(f)
    data = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            data.append(json.loads(line))
    return data


def embed_queries(args, queries, encoder: DenseEncoder) -> np.ndarray:
    texts = []
    for q in queries:
        if args.lowercase:
            q = q.lower()
        if args.normalize_text:
            q = normalize_fn(q)
        texts.append(q)
    return encoder._encode_texts(texts, args.per_gpu_batch_size,
                                 normalize=False)


def index_encoded_data(index, embedding_files, indexing_batch_size):
    """Stream shard pickles into the index
    (passage_retrieval.py:65-90)."""
    for file_path in embedding_files:
        logger.info("Loading %s", file_path)
        try:
            with open(file_path, "rb") as fin:
                ids, embeddings = pickle.load(fin)
        except (pickle.UnpicklingError, EOFError, ValueError) as e:
            # globs like "emb/*" can catch run.log / opt.txt written
            # next to the shards; skip anything that isn't a shard
            logger.warning("Skipping non-shard file %s (%s)",
                           file_path, e)
            continue
        for s in range(0, len(ids), indexing_batch_size):
            index.index_data(list(ids[s:s + indexing_batch_size]),
                             np.asarray(embeddings[s:s + indexing_batch_size]))
    logger.info("Data indexing completed, ntotal=%d", index.ntotal)


def add_passages(data, passages_by_id, top_ids_and_scores):
    """Attach retrieved passages (passage_retrieval.py:108-125)."""
    assert len(data) == len(top_ids_and_scores)
    for d, (ids, scores) in zip(data, top_ids_and_scores):
        d["ctxs"] = [{
            "id": pid,
            "title": passages_by_id[pid].get("title", ""),
            "text": passages_by_id[pid]["text"],
            "score": str(score),
        } for pid, score in zip(ids, scores)]


def validate(data, workers_num: int):
    """Answer-match validation + R@k print
    (passage_retrieval.py:94-105)."""
    match_stats = qa.calculate_matches(data, workers_num)
    top_k_hits = [v / len(data) for v in match_stats.top_k_hits]
    msg = " ".join(f"R@{k}: {top_k_hits[k-1]:.4f}"
                   for k in (5, 10, 20, 100) if k <= len(top_k_hits))
    logger.info("Validation results: %s", msg)
    return match_stats.questions_doc_hits, top_k_hits


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    init_logger(args.output_dir)
    cfg = Config(retriever_model_id=args.model_name_or_path,
                 dtype="float32" if args.no_fp16 else "bfloat16",
                 dropout=0.0, pooling=args.pooling)
    params, mcfg, tokenizer = common.resolve_model(cfg)
    params = common.init_or_load_params(cfg, mcfg, params)
    if tokenizer is None:
        raise SystemExit("model dir must provide a vocab.txt tokenizer")
    encoder = DenseEncoder(params, mcfg, tokenizer,
                           max_length=args.question_maxlength,
                           pooling=args.pooling)

    itype = args.index_type
    if itype == "auto":
        itype = "pq" if args.n_subquantizers > 0 else "flat"
    # all three engines shard over the mesh data axis when more than
    # one device is attached (flat: row shards; pq: code-row shards;
    # ivfpq: inverted-list shards) — corpus capacity and scan work
    # scale with device count
    import jax as _jax
    from czechtriever_tpu.parallel import mesh as meshlib
    mesh = meshlib.make_mesh() if _jax.device_count() > 1 else None
    if itype == "ivfpq":
        index = IVFPQIndex(mcfg.hidden_size,
                           args.n_subquantizers or mcfg.hidden_size // 8,
                           args.n_bits, nlist=args.nlist,
                           nprobe=args.nprobe,
                           adaptive_nprobe=args.adaptive_nprobe,
                           target_probe_lists=args.target_probe_lists,
                           mesh=mesh)
    elif itype == "pq":
        index = PQIndex(mcfg.hidden_size,
                        args.n_subquantizers or mcfg.hidden_size // 8,
                        args.n_bits, mesh=mesh)
    else:
        index = FlatIndex(mcfg.hidden_size, mesh=mesh)
    if args.refine_factor and itype in ("pq", "ivfpq"):
        from czechtriever_tpu.retrieval.refine import RefinedIndex
        index = RefinedIndex(index, refine_factor=args.refine_factor)

    emb_files = sorted(glob.glob(args.passages_embeddings))
    if not emb_files:
        raise SystemExit(f"no embedding shards match "
                         f"{args.passages_embeddings}")
    index_dir = os.path.join(os.path.dirname(emb_files[0]), "index")
    t0 = time.time()
    if args.save_or_load_index and os.path.isdir(index_dir):
        index.deserialize_from(index_dir)
        logger.info("Index loaded from %s in %.1fs", index_dir,
                    time.time() - t0)
    else:
        index_encoded_data(index, emb_files, args.indexing_batch_size)
        logger.info("Indexing time: %.1fs", time.time() - t0)
        if args.save_or_load_index:
            index.serialize(index_dir)

    passages = load_passages(args.passages)
    passages_by_id = {p["id"]: p for p in passages}

    for path in args.data:
        data = load_query_data(path)
        questions = [ex["question"] for ex in data]
        q_emb = embed_queries(args, questions, encoder)
        t0 = time.time()
        top_ids_and_scores = index.search_knn(q_emb, args.n_docs)
        logger.info("Search time: %.1fs for %d queries",
                    time.time() - t0, len(questions))
        add_passages(data, passages_by_id, top_ids_and_scores)
        hasanswer, top_k_hits = validate(data, args.validation_workers)
        for ex, hits in zip(data, hasanswer):
            for ctx, h in zip(ex["ctxs"], hits):
                ctx["hasanswer"] = bool(h)
        out_path = os.path.join(args.output_dir, os.path.basename(path))
        with open(out_path, "w", encoding="utf-8") as f:
            for ex in data:
                f.write(json.dumps(ex, ensure_ascii=False) + "\n")
        logger.info("Saved results to %s", out_path)


if __name__ == "__main__":
    main(sys.argv[1:])

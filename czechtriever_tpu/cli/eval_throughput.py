"""Inference throughput harness (reference eval_throughput.py).

Measures what the reference's pure-inference harness measures
(eval_throughput.py:214-383): encode samples/s and tokens/s over random
variable-length batches, per-batch latency distribution
(min/p25/median/p75/max), a fixed-batch run plus batch-doubling until
OOM to find the maximum batch — adapted to TPU/XLA semantics:

  * static shapes: random lengths live in the attention mask, ids are
    padded to max_seq_length (one compiled program, no recompiles);
  * timing syncs via a scalar readback of the result (under the TPU
    tunnel ``block_until_ready`` does not wait for remote execution);
  * optionally measures retrieval QPS of the Flat vs PQ index at equal
    corpus size — the index-memory parity axis from BASELINE.md;
  * optionally the full translate pipeline (harness 1,
    eval_throughput.py:55-211): Marian cs->en greedy decode feeding the
    retriever encoder, timed end to end.

Prints human-readable results plus one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time

import numpy as np

from czechtriever_tpu.cli import common
from czechtriever_tpu.config import Config
from czechtriever_tpu.models import bert

logger = logging.getLogger(__name__)


def get_random_batch(rng, batch_size, vocab_size, min_len, max_len):
    """Random token batch with variable true lengths in the mask
    (eval_throughput.py:28-39)."""
    ids = rng.integers(5, vocab_size, (batch_size, max_len)).astype(np.int32)
    lens = rng.integers(min_len, max_len + 1, batch_size)
    mask = (np.arange(max_len)[None, :] < lens[:, None]).astype(np.int32)
    return ids * mask, mask


def measure_encode(params, mcfg, batch_size, *, iterations, min_len,
                   max_len, seed=0, pack_rows=0):
    """pack_rows > 0: length-packed encode (data/packing.py +
    encode_packed) — the round-5 inference-MFU lever: no padding FLOPs
    and one dispatch per whole batch. Host-side FFD packing runs INSIDE
    the timed loop (it is part of the pipeline)."""
    import jax
    import jax.numpy as jnp
    from czechtriever_tpu.models.contriever import encode, encode_packed

    rng = np.random.default_rng(seed)
    batches = [get_random_batch(rng, batch_size, mcfg.vocab_size, min_len,
                                max_len) for _ in range(iterations)]

    if pack_rows:
        from czechtriever_tpu.data import packing
        R = max(pack_rows, -(-max_len // 128) * 128)
        # one static block count across batches (max need, quantized)
        nb = packing.quantize_blocks(
            max(packing.blocks_needed(m.sum(axis=1), R)
                for _, m in batches), 8)

        def run(ids, mask):
            lens = mask.astype(np.int64).sum(axis=1)
            seqs = [ids[i, :lens[i]] for i in range(len(ids))]
            t, s, p, _ = packing.pack_sequences(seqs, R, nb)
            return encode_packed(params, mcfg, jnp.asarray(t),
                                 jnp.asarray(s), jnp.asarray(p),
                                 num_segments=batch_size)

        out = run(*batches[0])
        float(np.asarray(out)[0, 0])
        times, tokens = [], 0
        for ids, mask in batches:
            t0 = time.perf_counter()
            out = run(ids, mask)
            float(np.asarray(out)[0, 0])  # sync
            times.append(time.perf_counter() - t0)
            tokens += int(mask.sum())
        total = sum(times)
        tms = np.array(times) * 1000
        return {
            "batch_size": batch_size,
            "pack_rows": R,
            "samples_per_s": batch_size * iterations / total,
            "tokens_per_s": tokens / total,
            "latency_ms_mean": float(tms.mean()),
            "latency_ms_min": float(tms.min()),
            "latency_ms_p25": float(np.quantile(tms, 0.25)),
            "latency_ms_p50": float(np.quantile(tms, 0.50)),
            "latency_ms_p75": float(np.quantile(tms, 0.75)),
            "latency_ms_max": float(tms.max()),
            "avg_seq_length": tokens / (batch_size * iterations),
        }

    fn = jax.jit(lambda p, i, m: encode(p, mcfg, i, m,
                                        deterministic=True))
    # warmup/compile
    out = fn(params, *[jnp.asarray(x) for x in batches[0]])
    float(np.asarray(out)[0, 0])

    times, tokens = [], 0
    for ids, mask in batches:
        jids, jmask = jnp.asarray(ids), jnp.asarray(mask)
        t0 = time.perf_counter()
        out = fn(params, jids, jmask)
        float(np.asarray(out)[0, 0])  # sync
        times.append(time.perf_counter() - t0)
        tokens += int(mask.sum())
    total = sum(times)
    tms = np.array(times) * 1000
    return {
        "batch_size": batch_size,
        "samples_per_s": batch_size * iterations / total,
        "tokens_per_s": tokens / total,
        "latency_ms_mean": float(tms.mean()),
        "latency_ms_min": float(tms.min()),
        "latency_ms_p25": float(np.quantile(tms, 0.25)),
        "latency_ms_p50": float(np.quantile(tms, 0.50)),
        "latency_ms_p75": float(np.quantile(tms, 0.75)),
        "latency_ms_max": float(tms.max()),
        "avg_seq_length": tokens / (batch_size * iterations),
    }


def find_max_batch(params, mcfg, *, start, min_len, max_len,
                   limit=65536) -> int:
    """Batch-doubling until OOM (eval_throughput.py:191-210,360-383)."""
    ok = 0
    b = start
    while b <= limit:
        try:
            measure_encode(params, mcfg, b, iterations=2, min_len=min_len,
                           max_len=max_len)
            ok = b
            b *= 2
        except Exception as e:
            if ("RESOURCE_EXHAUSTED" in str(e)
                    or "Ran out of memory" in str(e)
                    or "out of memory" in str(e).lower()):
                break
            raise
    return ok


def measure_search(dim: int, n_docs: int, n_queries: int, top_k: int,
                   n_subquantizers: int = 0, n_bits: int = 8,
                   iterations: int = 20, seed: int = 0):
    """Flat vs PQ search QPS at a given corpus size."""
    from czechtriever_tpu.retrieval.flat import FlatIndex
    from czechtriever_tpu.retrieval.pq import PQIndex
    rng = np.random.default_rng(seed)
    corpus = rng.normal(size=(n_docs, dim)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.normal(size=(n_queries, dim)).astype(np.float32)

    if n_subquantizers > 0:
        index = PQIndex(dim, n_subquantizers, n_bits)
        mem = None
    else:
        index = FlatIndex(dim)
        mem = n_docs * dim * 4
    t0 = time.perf_counter()
    index.index_data([str(i) for i in range(n_docs)], corpus)
    index.search_knn(queries[:1], top_k)  # build+compile
    build_s = time.perf_counter() - t0
    if mem is None:
        mem = index.memory_bytes()

    t0 = time.perf_counter()
    for _ in range(iterations):
        index.search_knn(queries, top_k)
    dt = (time.perf_counter() - t0) / iterations
    return {
        "index": "pq" if n_subquantizers else "flat",
        "n_docs": n_docs, "top_k": top_k,
        "index_memory_mb": mem / 1e6,
        "build_s": build_s,
        "queries_per_s": n_queries / dt,
        "search_ms_per_batch": dt * 1000,
    }


def measure_translate_encode(params, mcfg, t_params, tcfg, batch_size,
                             *, iterations, min_len, max_len,
                             max_new_tokens=32, seed=0, num_beams=1):
    """Translation pipeline throughput (eval_throughput.py:55-211):
    Marian decode (greedy, or beam search matching the reference's
    num_beams=4 call at eval_throughput.py:16) -> re-encode the
    translated ids. Timing covers both stages per batch."""
    import jax
    import jax.numpy as jnp
    from czechtriever_tpu.models import marian
    from czechtriever_tpu.models.contriever import encode as enc_fn

    def pipeline(tp, p_, ids, mask):
        if num_beams > 1:
            out = marian.beam_search_generate(
                tp, tcfg, ids, mask, num_beams=num_beams,
                max_new_tokens=max_new_tokens)
        else:
            out = marian.greedy_generate_cached(
                tp, tcfg, ids, mask, max_new_tokens=max_new_tokens)
        out_mask = (out != tcfg.pad_token_id).astype(jnp.int32)
        # translated ids feed the retriever encoder directly; vocabs
        # differ in practice but the compute cost is representative
        clipped = jnp.clip(out, 0, mcfg.vocab_size - 1)
        return enc_fn(p_, mcfg, clipped, out_mask, deterministic=True)

    fn = jax.jit(pipeline)
    rng = np.random.default_rng(seed)
    batches = [get_random_batch(rng, batch_size,
                                min(tcfg.vocab_size - 2, mcfg.vocab_size),
                                min_len, max_len)
               for _ in range(iterations)]
    import jax.numpy as jnp2
    out = fn(t_params, params, jnp2.asarray(batches[0][0]),
             jnp2.asarray(batches[0][1]))
    float(np.asarray(out)[0, 0])
    times = []
    for ids, mask in batches:
        t0 = time.perf_counter()
        out = fn(t_params, params, jnp2.asarray(ids), jnp2.asarray(mask))
        float(np.asarray(out)[0, 0])
        times.append(time.perf_counter() - t0)
    total = sum(times)
    return {"batch_size": batch_size,
            "samples_per_s": batch_size * iterations / total,
            "latency_ms_p50": float(np.quantile(np.array(times) * 1e3,
                                                0.5)),
            "max_new_tokens": max_new_tokens, "num_beams": num_beams}


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model_name_or_path", type=str, default="czert")
    p.add_argument("--max_seq_length", type=int, default=128)
    p.add_argument("--min_seq_length", type=int, default=16)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--iterations", type=int, default=100)
    p.add_argument("--find_max_batch", action="store_true")
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--search", action="store_true",
                   help="also measure flat vs PQ search QPS")
    p.add_argument("--search_docs", type=int, default=100_000)
    p.add_argument("--search_queries", type=int, default=256)
    p.add_argument("--top_k", type=int, default=100)
    p.add_argument("--pack_rows", type=int, default=256,
                   help="row budget for the length-packed encode "
                        "measurement (0 skips the packed row)")
    p.add_argument("--translate", action="store_true",
                   help="measure the Marian cs->en translation pipeline "
                        "(harness 1)")
    p.add_argument("--translator_model_path", type=str,
                   default="Helsinki-NLP/opus-mt-cs-en")
    p.add_argument("--max_new_tokens", type=int, default=32)
    p.add_argument("--num_beams", type=int, default=4)  # reference call
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    cfg = Config(retriever_model_id=args.model_name_or_path,
                 dtype=args.dtype, dropout=0.0)
    params, mcfg, _ = common.resolve_model(cfg)
    params = common.init_or_load_params(cfg, mcfg, params)

    res = measure_encode(params, mcfg, args.batch_size,
                         iterations=args.iterations,
                         min_len=args.min_seq_length,
                         max_len=args.max_seq_length)
    logger.info("encode: %.1f samples/s, %.1f tokens/s, "
                "latency ms min/p25/p50/p75/max = "
                "%.2f/%.2f/%.2f/%.2f/%.2f",
                res["samples_per_s"], res["tokens_per_s"],
                res["latency_ms_min"], res["latency_ms_p25"],
                res["latency_ms_p50"], res["latency_ms_p75"],
                res["latency_ms_max"])
    print(json.dumps({"measurement": "encode", **res}))

    if args.pack_rows:
        res_p = measure_encode(params, mcfg, args.batch_size,
                               iterations=args.iterations,
                               min_len=args.min_seq_length,
                               max_len=args.max_seq_length,
                               pack_rows=args.pack_rows)
        logger.info("encode packed(R=%d): %.1f samples/s, %.1f tokens/s",
                    res_p["pack_rows"], res_p["samples_per_s"],
                    res_p["tokens_per_s"])
        print(json.dumps({"measurement": "encode_packed", **res_p}))

    if args.find_max_batch:
        mb = find_max_batch(params, mcfg, start=args.batch_size,
                            min_len=args.min_seq_length,
                            max_len=args.max_seq_length)
        logger.info("max batch size: %d", mb)
        res_mb = measure_encode(params, mcfg, mb, iterations=10,
                                min_len=args.min_seq_length,
                                max_len=args.max_seq_length)
        print(json.dumps({"measurement": "encode_max_batch", **res_mb}))

    if args.translate:
        import os as _os
        import jax as _jax
        from czechtriever_tpu.models import marian
        if _os.path.isdir(args.translator_model_path):
            t_params, tcfg = marian.load_hf_dir(args.translator_model_path)
        else:
            logger.warning("translator %r not found locally; random-init "
                           "opus-mt geometry", args.translator_model_path)
            tcfg = marian.MarianConfig(dtype=args.dtype)
            t_params = marian.init_params(_jax.random.key(0), tcfg)
        res_t = measure_translate_encode(
            params, mcfg, t_params, tcfg, args.batch_size,
            iterations=max(3, args.iterations // 10),
            min_len=args.min_seq_length, max_len=args.max_seq_length,
            max_new_tokens=args.max_new_tokens,
            num_beams=args.num_beams)
        logger.info("translate+encode: %.1f samples/s, p50 %.1f ms",
                    res_t["samples_per_s"], res_t["latency_ms_p50"])
        print(json.dumps({"measurement": "translate_encode", **res_t}))

    if args.search:
        dim = mcfg.hidden_size
        flat = measure_search(dim, args.search_docs, args.search_queries,
                              args.top_k)
        print(json.dumps({"measurement": "search", **flat}))
        pq = measure_search(dim, args.search_docs, args.search_queries,
                            args.top_k, n_subquantizers=dim // 8, n_bits=8)
        print(json.dumps({"measurement": "search", **pq}))


if __name__ == "__main__":
    main(sys.argv[1:])

"""Tie training to the north-star metric in-env (VERDICT r2 next #5).

Builds a synthetic *fit-eval-style* BEIR dataset with topical structure
(the in-env stand-in for the Czech fit-eval set the reference evaluates
during training, /root/reference/src/beir_utils.py:196-245 via
/root/reference/train.py:329-341), a held-out training token stream
drawn from the SAME topic distributions, and runs the real trainer with
the BEIR eval hook live — recording NDCG@10 / Recall@100 at step 0
(untrained) and every ``eval_freq`` steps, plus the BM25 lexical
baseline on the identical set.

Why training should move the metric: documents are bags of topic-
specific + common words; two random crops of one 256-token stream chunk
share a topic, other chunks in the batch/queue mostly don't, so the
contrastive objective is exactly topic discrimination — which is what
the qrels reward. A random-init encoder starts near chance.

Usage:
    python tools/train_ndcg_curve.py --workdir /tmp/ndcg --steps 1000 \\
        --eval_freq 100                      # the chip run
    python tools/train_ndcg_curve.py --quick # CPU smoke (~2 min)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPECIALS = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]


def build_synth(workdir: str, n_topics: int = 50, words_per_topic: int = 40,
                n_common: int = 500, eval_docs_per_topic: int = 40,
                n_queries: int = 100, train_tokens: int = 4_000_000,
                doc_len: int = 120, topic_frac: float = 0.3,
                seed: int = 0) -> dict:
    # topic_frac=0.3 calibrated on-CPU: common words swamp the random-
    # projection shortcut (mean-pooled random-init embeddings), putting
    # the untrained encoder at NDCG@10 ~18 (vs ~53 at 0.7) while the
    # task stays learnable — the contrastive objective must discover
    # which words carry topic signal, the IDF-like behavior real
    # unsupervised retrievers learn.
    """Write vocab.txt, BEIR dir, and the uint16 training stream.

    Returns paths dict. Eval docs and the training stream are disjoint
    samples from the same per-topic word distributions (held-out eval,
    not memorization).
    """
    rng = np.random.default_rng(seed)
    topics = [[f"t{t:02d}w{w:03d}" for w in range(words_per_topic)]
              for t in range(n_topics)]
    common = [f"c{w:04d}" for w in range(n_common)]
    vocab = SPECIALS + common + [w for tp in topics for w in tp]

    os.makedirs(workdir, exist_ok=True)
    vocab_path = os.path.join(workdir, "vocab.txt")
    with open(vocab_path, "w") as f:
        f.write("\n".join(vocab) + "\n")

    def make_doc(topic: int, length: int) -> list:
        n_top = int(round(length * topic_frac))
        words = ([topics[topic][i] for i in
                  rng.integers(0, words_per_topic, n_top)]
                 + [common[i] for i in
                    rng.integers(0, n_common, length - n_top)])
        rng.shuffle(words)
        return words

    # --- BEIR dir (corpus / queries / qrels) -----------------------------
    beir_root = os.path.join(workdir, "beir", "synthfit")
    os.makedirs(os.path.join(beir_root, "qrels"), exist_ok=True)
    doc_topic = {}
    with open(os.path.join(beir_root, "corpus.jsonl"), "w") as f:
        d = 0
        for t in range(n_topics):
            for _ in range(eval_docs_per_topic):
                f.write(json.dumps({
                    "_id": f"d{d}", "title": "",
                    "text": " ".join(make_doc(t, doc_len))}) + "\n")
                doc_topic[f"d{d}"] = t
                d += 1
    q_topics = rng.integers(0, n_topics, n_queries)
    with open(os.path.join(beir_root, "queries.jsonl"), "w") as f:
        for qi, t in enumerate(q_topics):
            f.write(json.dumps({
                "_id": f"q{qi}",
                "text": " ".join(make_doc(int(t), 12))}) + "\n")
    with open(os.path.join(beir_root, "qrels", "test.tsv"), "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        for qi, t in enumerate(q_topics):
            for did, dt in doc_topic.items():
                if dt == t:
                    f.write(f"q{qi}\t{did}\t1\n")

    # --- training token stream (uint16) ----------------------------------
    word_id = {w: i for i, w in enumerate(vocab)}
    stream_path = os.path.join(workdir, "train.bin")
    ids = []
    total = 0
    while total < train_tokens:
        t = int(rng.integers(0, n_topics))
        length = int(rng.integers(doc_len, 3 * doc_len))
        doc_ids = [word_id[w] for w in make_doc(t, length)]
        ids.append(np.asarray(doc_ids, np.uint16))
        total += length
    np.concatenate(ids).astype("<u2").tofile(stream_path)

    # --- model dir: config.json + vocab.txt (random init) ----------------
    model_dir = os.path.join(workdir, "model")
    os.makedirs(model_dir, exist_ok=True)
    mcfg = {"vocab_size": len(vocab), "hidden_size": 256,
            "num_hidden_layers": 4, "num_attention_heads": 4,
            "intermediate_size": 1024, "max_position_embeddings": 512,
            "type_vocab_size": 2, "hidden_act": "gelu",
            "layer_norm_eps": 1e-12}
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump(mcfg, f)
    with open(os.path.join(model_dir, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab) + "\n")

    return {"beir_dir": os.path.join(workdir, "beir"),
            "dataset": "synthfit", "stream": stream_path,
            "model_dir": model_dir, "vocab_size": len(vocab)}


def run(workdir: str, steps: int, eval_freq: int, batch: int,
        synth_kw: dict | None = None, train_extra: list | None = None
        ) -> dict:
    """Build artifacts, run the trainer with the live BEIR hook, return
    {"bm25": {...}, "curve": [{"step": s, "NDCG@10": ..., ...}, ...]}."""
    paths = build_synth(workdir, **(synth_kw or {}))

    from czechtriever_tpu.cli.baseline_eval import evaluate_bm25
    bm25 = evaluate_bm25(os.path.join(paths["beir_dir"], paths["dataset"]))
    print(f"BM25 baseline: NDCG@10 {bm25['NDCG@10']:.2f} "
          f"Recall@100 {bm25['Recall@100']:.2f}", file=sys.stderr)

    out_dir = os.path.join(workdir, "run")
    argv = [
        "--output_dir", out_dir, "--save_dir", out_dir,
        "--train_data", paths["stream"],
        "--retriever_model_id", paths["model_dir"], "--random_init",
        "--eval_datasets", paths["dataset"],
        "--eval_datasets_dir", paths["beir_dir"],
        "--eval_freq", str(eval_freq), "--total_steps", str(steps),
        "--per_gpu_batch_size", str(batch),
        "--target_batch_size", str(batch),
        "--contrastive_mode", "moco", "--queue_size", "8192",
        "--temperature", "0.05", "--momentum", "0.999",
        "--lr", "3e-4", "--warmup_steps", str(max(10, steps // 10)),
        "--log_freq", str(eval_freq),
        "--save_freq", str(10 * steps),  # no periodic ckpt in the curve run
        "--norm_query", "--norm_doc",
    ] + (train_extra or [])
    from czechtriever_tpu.cli import train as train_cli
    train_cli.main(argv)

    # JSONL sink writes flat records with "<dataset>/<metric>" keys
    pre = paths["dataset"] + "/"
    curve = []
    with open(os.path.join(out_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            vals = {k[len(pre):]: round(v, 2) for k, v in rec.items()
                    if k.startswith(pre) and "@" in k}
            if vals:
                curve.append({"step": rec["step"], **vals})
    result = {"bm25": {k: round(v, 2) for k, v in bm25.items()
                       if "@" in k}, "curve": curve}
    with open(os.path.join(workdir, "curve.json"), "w") as f:
        json.dump(result, f, indent=1)
    return result


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/ndcg_curve")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--eval_freq", type=int, default=100)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--pack_rows", type=int, default=0,
                   help="run the trainer with length packing (round-5 "
                        "hot loop); the curve then certifies packed "
                        "training QUALITY, not just throughput")
    p.add_argument("--quick", action="store_true",
                   help="tiny CPU smoke run of the whole harness")
    args = p.parse_args()

    synth_kw = None
    if args.quick:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        import jax
        jax.config.update("jax_platforms", "cpu")
        args.steps, args.eval_freq, args.batch = 30, 15, 16
        synth_kw = dict(n_topics=8, eval_docs_per_topic=6, n_queries=16,
                        train_tokens=200_000)

    extra = (["--pack_rows", str(args.pack_rows)]
             if args.pack_rows else None)
    result = run(args.workdir, args.steps, args.eval_freq, args.batch,
                 synth_kw=synth_kw, train_extra=extra)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""End-to-end offline pipeline tests: preprocess -> embeddings shards ->
index -> retrieve -> QA-validate -> evaluate_retrieved, plus the
standalone BEIR eval CLI (reference scripts:
generate_passage_embeddings.py, passage_retrieval.py,
evaluate_retrieved_passages.py, preprocess.py, eval_beir.py)."""

import glob
import json
import os
import pickle

import numpy as np
import pytest

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
    f"w{i}" for i in range(50)]


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("model")
    with open(d / "config.json", "w") as f:
        json.dump({"vocab_size": len(VOCAB), "hidden_size": 32,
                   "num_hidden_layers": 2, "num_attention_heads": 2,
                   "intermediate_size": 64,
                   "max_position_embeddings": 64}, f)
    with open(d / "vocab.txt", "w") as f:
        f.write("\n".join(VOCAB) + "\n")
    return str(d)


@pytest.fixture(scope="module")
def corpus_tsv(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    p = d / "passages.tsv"
    with open(p, "w") as f:
        f.write("id\ttext\ttitle\n")
        for i in range(30):
            f.write(f"{i}\tw{i} w{(i+1) % 50} answer{i}\ttitle{i}\n")
    return str(p)


class TestGenerateEmbeddings:
    def test_two_shards_cover_corpus(self, tmp_path, model_dir, corpus_tsv):
        from czechtriever_tpu.cli import generate_embeddings as ge
        out = str(tmp_path / "emb")
        for shard in (0, 1):
            ge.main(["--passages", corpus_tsv, "--output_dir", out,
                     "--model_name_or_path", model_dir, "--no_fp16",
                     "--shard_id", str(shard), "--num_shards", "2",
                     "--per_gpu_batch_size", "8",
                     "--passage_maxlength", "16"])
        files = sorted(glob.glob(os.path.join(out, "passages_*")))
        assert len(files) == 2
        total, dim = 0, None
        for fp in files:
            with open(fp, "rb") as f:
                ids, emb = pickle.load(f)
            assert len(ids) == emb.shape[0]
            total += len(ids)
            dim = emb.shape[1]
        assert total == 30
        assert dim == 32


class TestRetrievePipeline:
    @pytest.fixture()
    def query_file(self, tmp_path):
        p = tmp_path / "queries.jsonl"
        with open(p, "w") as f:
            for i in range(6):
                f.write(json.dumps({
                    "question": f"w{i} w{i+1}",
                    "answers": [f"answer{i}"]}) + "\n")
        return str(p)

    def test_end_to_end(self, tmp_path, model_dir, corpus_tsv, query_file):
        from czechtriever_tpu.cli import generate_embeddings as ge
        from czechtriever_tpu.cli import retrieve as rt
        from czechtriever_tpu.cli import evaluate_retrieved as er
        emb_dir = str(tmp_path / "emb")
        ge.main(["--passages", corpus_tsv, "--output_dir", emb_dir,
                 "--model_name_or_path", model_dir, "--no_fp16",
                 "--per_gpu_batch_size", "8", "--passage_maxlength", "16"])
        out = str(tmp_path / "retrieved")
        rt.main(["--data", query_file, "--passages", corpus_tsv,
                 "--passages_embeddings", os.path.join(emb_dir, "passages_*"),
                 "--output_dir", out, "--n_docs", "10",
                 "--model_name_or_path", model_dir, "--no_fp16",
                 "--per_gpu_batch_size", "4", "--question_maxlength", "16",
                 "--validation_workers", "2"])
        out_file = os.path.join(out, "queries.jsonl")
        assert os.path.exists(out_file)
        with open(out_file) as f:
            rows = [json.loads(line) for line in f]
        assert len(rows) == 6
        for r in rows:
            assert len(r["ctxs"]) == 10
            assert all("hasanswer" in c and "score" in c and "text" in c
                       for c in r["ctxs"])
        # every query's answer string exists in exactly one passage, and
        # the 10-passage shortlist of a 30-passage corpus must catch it
        # for at least some queries; sanity: hasanswer flags are not all
        # False across the board
        assert any(c["hasanswer"] for r in rows for c in r["ctxs"])

        # recompute R@k from the saved file (evaluate_retrieved_passages)
        er.main(["--data", out_file, "--validation_workers", "2"])

    def test_ivfpq_index_path(self, tmp_path, model_dir, corpus_tsv,
                              query_file):
        from czechtriever_tpu.cli import generate_embeddings as ge
        from czechtriever_tpu.cli import retrieve as rt
        emb_dir = str(tmp_path / "emb")
        ge.main(["--passages", corpus_tsv, "--output_dir", emb_dir,
                 "--model_name_or_path", model_dir, "--no_fp16",
                 "--per_gpu_batch_size", "8", "--passage_maxlength", "16"])
        out = str(tmp_path / "retrieved_ivf")
        rt.main(["--data", query_file, "--passages", corpus_tsv,
                 "--passages_embeddings", os.path.join(emb_dir, "passages_*"),
                 "--output_dir", out, "--n_docs", "5",
                 "--model_name_or_path", model_dir, "--no_fp16",
                 "--index_type", "ivfpq", "--n_subquantizers", "4",
                 "--nlist", "4", "--nprobe", "4",
                 "--per_gpu_batch_size", "4", "--question_maxlength", "16",
                 "--validation_workers", "2"])
        with open(os.path.join(out, "queries.jsonl")) as f:
            rows = [json.loads(line) for line in f]
        assert all(len(r["ctxs"]) == 5 for r in rows)

    def test_pq_index_path(self, tmp_path, model_dir, corpus_tsv,
                           query_file):
        from czechtriever_tpu.cli import generate_embeddings as ge
        from czechtriever_tpu.cli import retrieve as rt
        emb_dir = str(tmp_path / "emb")
        ge.main(["--passages", corpus_tsv, "--output_dir", emb_dir,
                 "--model_name_or_path", model_dir, "--no_fp16",
                 "--per_gpu_batch_size", "8", "--passage_maxlength", "16"])
        out = str(tmp_path / "retrieved_pq")
        rt.main(["--data", query_file, "--passages", corpus_tsv,
                 "--passages_embeddings", os.path.join(emb_dir, "passages_*"),
                 "--output_dir", out, "--n_docs", "5",
                 "--model_name_or_path", model_dir, "--no_fp16",
                 "--n_subquantizers", "4", "--n_bits", "4",
                 "--per_gpu_batch_size", "4", "--question_maxlength", "16",
                 "--validation_workers", "2"])
        with open(os.path.join(out, "queries.jsonl")) as f:
            rows = [json.loads(line) for line in f]
        assert all(len(r["ctxs"]) == 5 for r in rows)


class TestPreprocess:
    @pytest.fixture()
    def jsonl_corpus(self, tmp_path):
        p = tmp_path / "docs.jsonl"
        with open(p, "w") as f:
            for i in range(20):
                f.write(json.dumps({"text": f"w{i} w{i+1} w{i+2}"}) + "\n")
        return str(p)

    def test_shards_format(self, tmp_path, model_dir, jsonl_corpus):
        from czechtriever_tpu.cli import preprocess as pp
        from czechtriever_tpu.data.passages import load_preprocessed_shards
        out = str(tmp_path / "pp")
        pp.main(["--datapath", jsonl_corpus, "--outdir", out,
                 "--tokenizer", model_dir, "--format", "shards"])
        docs = load_preprocessed_shards(out, loading_mode="full")
        assert len(docs) == 20
        assert all(len(d) == 3 for d in docs)

    def test_stream_format(self, tmp_path, model_dir, jsonl_corpus):
        from czechtriever_tpu.cli import preprocess as pp
        from czechtriever_tpu.data.tokenstream import TokenStream
        out = str(tmp_path / "pp2")
        pp.main(["--datapath", jsonl_corpus, "--outdir", out,
                 "--tokenizer", model_dir, "--format", "stream"])
        f = glob.glob(os.path.join(out, "*.u16bin"))[0]
        stream = TokenStream(f, chunk_length=4)
        chunks = list(stream)
        assert len(chunks) == 15  # 60 tokens / 4
        assert all(c.shape == (4,) for c in chunks)

    def test_no_overwrite(self, tmp_path, model_dir, jsonl_corpus, caplog):
        from czechtriever_tpu.cli import preprocess as pp
        out = str(tmp_path / "pp3")
        argv = ["--datapath", jsonl_corpus, "--outdir", out,
                "--tokenizer", model_dir, "--format", "shards"]
        pp.main(argv)
        mtime = os.path.getmtime(glob.glob(os.path.join(out, "*.npz"))[0])
        pp.main(argv)  # second run must refuse
        assert os.path.getmtime(
            glob.glob(os.path.join(out, "*.npz"))[0]) == mtime


class TestEvalBeirCLI:
    def test_synthetic_dataset(self, tmp_path, model_dir):
        from czechtriever_tpu.cli import eval_beir as eb
        ds = tmp_path / "beir" / "tiny"
        os.makedirs(ds / "qrels")
        with open(ds / "corpus.jsonl", "w") as f:
            for i in range(10):
                f.write(json.dumps({"_id": f"d{i}", "title": "",
                                    "text": f"w{i} w{i+1}"}) + "\n")
        with open(ds / "queries.jsonl", "w") as f:
            for i in range(4):
                f.write(json.dumps({"_id": f"q{i}",
                                    "text": f"w{i} w{i+1}"}) + "\n")
        with open(ds / "qrels" / "test.tsv", "w") as f:
            f.write("query-id\tcorpus-id\tscore\n")
            for i in range(4):
                f.write(f"q{i}\td{i}\t1\n")
        out = str(tmp_path / "beir_out")
        eb.main(["--dataset", "tiny", "--beir_dir",
                 str(tmp_path / "beir"), "--model_name_or_path", model_dir,
                 "--dtype", "float32", "--norm_query", "--norm_doc",
                 "--output_dir", out, "--per_gpu_batch_size", "4"])
        with open(os.path.join(out, "beir_metrics.json")) as f:
            metrics = json.load(f)
        # query text == doc text + normalized embeddings -> perfect nDCG
        assert metrics["tiny"]["NDCG@10"] == pytest.approx(100.0)

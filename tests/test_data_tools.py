"""data_tools CLI tests (reference data_scripts/: split_data,
get_line_offsets, unify_logs, create_data_hist, preprocess_xmkqa)."""

import csv
import json
import os
import pickle

import pytest

from czechtriever_tpu.cli import data_tools

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
    f"w{i}" for i in range(30)]


@pytest.fixture()
def model_dir(tmp_path):
    d = tmp_path / "m"
    os.makedirs(d)
    (d / "vocab.txt").write_text("\n".join(VOCAB) + "\n")
    with open(d / "config.json", "w") as f:
        json.dump({"vocab_size": len(VOCAB)}, f)
    return str(d)


@pytest.fixture()
def jsonl(tmp_path):
    p = tmp_path / "docs.jsonl"
    with open(p, "w") as f:
        for i in range(20):
            f.write(json.dumps({"text": " ".join(
                f"w{(i + j) % 30}" for j in range(i % 4 + 1)),
                "extra": i}) + "\n")
    return str(p)


class TestSplit:
    def test_partition_and_text_only(self, tmp_path, jsonl):
        tr, va = str(tmp_path / "tr.jsonl"), str(tmp_path / "va.jsonl")
        data_tools.main(["split", "--input_file", jsonl, "--train_file", tr,
                         "--valid_file", va, "--validation_samples", "5",
                         "--total_samples", "20"])
        trl = open(tr).read().splitlines()
        val = open(va).read().splitlines()
        assert len(trl) == 15 and len(val) == 5
        assert all(set(json.loads(x)) == {"text"} for x in trl + val)


class TestLineOffsets:
    def test_reference_format_roundtrip(self, tmp_path, jsonl, model_dir):
        out = str(tmp_path / "off.pkl")
        data_tools.main(["line_offsets", "--input_file", jsonl,
                         "--output_file", out,
                         "--tokenizer_path", model_dir])
        with open(out, "rb") as f:
            recs = pickle.load(f)
        assert len(recs) == 20
        assert recs[0] == {"offset": 0, "tokens_before_this_line": 0}
        # cumsums are monotonically increasing token counts
        toks = [r["tokens_before_this_line"] for r in recs]
        assert toks == sorted(toks)
        # and the lazy loaders can consume it
        from czechtriever_tpu.data.lazy import load_line_index
        off, cs = load_line_index(out)
        assert len(off) == len(cs) == 20


class TestUnifyLogs:
    def test_scrapes_metrics(self, tmp_path):
        d = tmp_path / "runs" / "modelA"
        os.makedirs(d)
        (d / "run.log").write_text(
            "[01/01/2026 10:00:00] fit-eval NDCG@10: 42.50\n"
            "noise line\n"
            "2026-01-01 10:00:01 Recall@100: 80.25\n")
        out = str(tmp_path / "unified.csv")
        data_tools.main(["unify_logs", "--input_dir",
                         str(tmp_path / "runs"), "--output_file", out])
        rows = list(csv.DictReader(open(out)))
        assert {(r["model"], r["metric"], r["k"], r["value"])
                for r in rows} == {("modelA", "NDCG", "10", "42.5"),
                                   ("modelA", "Recall", "100", "80.25")}


class TestDataHist:
    def test_histogram(self, tmp_path, jsonl, model_dir):
        out = str(tmp_path / "hist.csv")
        data_tools.main(["data_hist", "--input_file", jsonl,
                         "--output_file", out,
                         "--tokenizer_path", model_dir])
        rows = list(csv.DictReader(open(out)))
        # doc lengths cycle 1..4 over 20 docs -> 5 of each
        assert {(r["token_length"], r["count"]) for r in rows} == {
            ("1", "5"), ("2", "5"), ("3", "5"), ("4", "5")}


class TestXmkqa:
    def test_per_language_split(self, tmp_path):
        src = tmp_path / "mkqa.jsonl"
        ex = {"example_id": 1,
              "queries": {lang: f"q-{lang}" for lang in
                          data_tools.MKQA_LANGS},
              "answers": {"en": [{"type": "entity", "text": "Praha",
                                  "aliases": ["Prague"]}]}}
        bad = {"example_id": 2,
               "queries": {lang: "x" for lang in data_tools.MKQA_LANGS},
               "answers": {"en": [{"type": "unanswerable", "text": None}]}}
        with open(src, "w") as f:
            f.write(json.dumps(ex) + "\n")
            f.write(json.dumps(bad) + "\n")
        out = tmp_path / "xmkqa"
        data_tools.main(["xmkqa", str(src), str(out)])
        with open(out / "en.jsonl") as f:
            rows = [json.loads(line) for line in f]
        assert len(rows) == 1  # unanswerable dropped
        assert rows[0]["answers"] == ["Prague", "Praha"]
        assert rows[0]["question"] == "q-en"
        assert os.path.exists(out / "zh_cn.jsonl")

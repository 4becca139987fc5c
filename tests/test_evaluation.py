"""Evaluation-layer tests: trec metrics vs hand-computed oracles, QA
matching differentially vs the reference implementation, tokenizer parity
with HF, and the BEIR harness end-to-end on a synthetic dataset."""

import math
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

from czechtriever_tpu.evaluation import beir as beir_eval
from czechtriever_tpu.evaluation import metrics as M
from czechtriever_tpu.evaluation import qa


class TestMetrics:
    # hand-computed oracle: 2 queries
    QRELS = {
        "q1": {"d1": 2, "d2": 1, "d9": 1},
        "q2": {"d3": 1},
    }
    RESULTS = {
        "q1": {"d1": 0.9, "d5": 0.8, "d2": 0.7, "d7": 0.6},
        "q2": {"d4": 0.9, "d3": 0.8},
    }

    def test_ndcg10(self):
        # q1: DCG = 2/log2(2) + 1/log2(4) = 2 + 0.5; IDCG = 2/log2(2)
        # + 1/log2(3) + 1/log2(4)
        dcg1 = 2 / 1 + 1 / 2
        idcg1 = 2 + 1 / math.log2(3) + 1 / 2
        # q2: DCG = 1/log2(3); IDCG = 1
        expect = (dcg1 / idcg1 + 1 / math.log2(3)) / 2
        assert abs(M.ndcg_cut(self.QRELS, self.RESULTS, 10) - expect) < 1e-6

    def test_map10(self):
        ap1 = (1 / 1 + 2 / 3) / 3   # hits at rank 1, 3; R=3
        ap2 = (1 / 2) / 1
        expect = (ap1 + ap2) / 2
        assert abs(M.map_cut(self.QRELS, self.RESULTS, 10) - expect) < 1e-6

    def test_recall_precision(self):
        # q1 top2 = [d1, d5] -> {d1}; q2 top2 = [d4, d3] -> {d3}
        assert abs(M.recall(self.QRELS, self.RESULTS, 2)
                   - (1 / 3 + 1 / 1) / 2) < 1e-6
        assert abs(M.precision(self.QRELS, self.RESULTS, 2)
                   - (1 / 2 + 1 / 2) / 2) < 1e-6

    def test_mrr(self):
        assert abs(M.mrr(self.QRELS, self.RESULTS, 10)
                   - (1 / 1 + 1 / 2) / 2) < 1e-6

    def test_recall_cap_and_hole(self):
        assert abs(M.recall_cap(self.QRELS, self.RESULTS, 2)
                   - (1 / 2 + 1 / 1) / 2) < 1e-6
        # q1 top2: d1 judged, d5 not -> 0.5; q2 top2: d4 not, d3 judged -> 0.5
        assert abs(M.hole(self.QRELS, self.RESULTS, 2) - 0.5) < 1e-6

    def test_zero_positive_query_counts_in_denominator(self):
        """pytrec_eval / BEIR averaging: a query judged only with
        rel=0 docs contributes 0 to every metric instead of being
        skipped (pins the parity decision from round 2)."""
        qrels = {**self.QRELS, "q3": {"d8": 0}}  # judged, no positives
        base_n = M.ndcg_cut(self.QRELS, self.RESULTS, 10)
        with_zero = M.ndcg_cut(qrels, self.RESULTS, 10)
        assert with_zero == pytest.approx(base_n * 2 / 3)
        for fn in (M.map_cut, M.recall, M.precision, M.mrr,
                   M.recall_cap, M.top_k_accuracy):
            assert fn(qrels, self.RESULTS, 10) == pytest.approx(
                fn(self.QRELS, self.RESULTS, 10) * 2 / 3), fn.__name__

    def test_tie_break_docid_desc(self):
        ranked = M.trec_sort({"a": 1.0, "b": 1.0, "c": 2.0})
        assert ranked == ["c", "b", "a"]

    def test_evaluate_contract(self):
        ndcg, _map, rec, prec = M.evaluate(self.QRELS, self.RESULTS, (1, 10))
        assert set(ndcg) == {"NDCG@1", "NDCG@10"}
        custom = M.evaluate_custom(self.QRELS, self.RESULTS, (10,), "mrr")
        assert "MRR@10" in custom


class TestQA:
    def test_simple_tokenizer_matches_reference(self):
        from src.evaluation import SimpleTokenizer as RefTok
        ref, ours = RefTok(), qa.SimpleTokenizer()
        for text in ["Hello, world! Praha 123", "čeština-test (x)",
                     "  multi   space ", "a.b.c", ""]:
            assert ours.tokenize(text, True) == ref.tokenize(text, True)

    def test_has_answer_matches_reference(self):
        from src.evaluation import SimpleTokenizer as RefTok
        from src.evaluation import has_answer as ref_has
        ref_tok, our_tok = RefTok(), qa.SimpleTokenizer()
        cases = [
            (["Prague"], "The capital is Prague."),
            (["Karel Čapek"], "Written by Karel Čapek in 1920."),
            (["not here"], "Something else entirely."),
            (["multi word answer"], "contains a multi word answer inside"),
            (["čapek"], "ČAPEK wrote it"),
        ]
        for answers, text in cases:
            assert (qa.has_answer(answers, text, our_tok)
                    == ref_has(answers, text, ref_tok)), (answers, text)

    def test_calculate_matches_curve(self):
        data = [
            {"answers": ["praha"], "ctxs": [{"text": "brno"},
                                            {"text": "praha is here"},
                                            {"text": "x"}]},
            {"answers": ["brno"], "ctxs": [{"text": "brno"},
                                           {"text": "y"}, {"text": "z"}]},
            {"answers": ["zzz"], "ctxs": [{"text": "a"}, {"text": "b"},
                                          {"text": "c"}]},
        ]
        stats = qa.calculate_matches(data, workers_num=2)
        assert stats.top_k_hits == [1, 2, 2]
        assert stats.questions_doc_hits[0] == [False, True, False]

    def test_squad_em_f1_match_reference(self):
        from src import evaluation as ref
        import collections as _c
        ref.Counter = _c.Counter  # reference forgot the import
        cases = [("The Answer!", ["the answer"]), ("a cat", ["the cat"]),
                 ("x y z", ["x q z"])]
        for pred, gts in cases:
            assert qa.exact_match_score(pred, gts) == ref.exact_match_score(pred, gts)
            assert abs(qa.f1_score(pred, gts) - ref.f1_score(pred, gts)) < 1e-9

    def test_count_inversions_matches_reference_quadratic(self):
        from src.evaluation import count_inversions as ref_inv
        rng = np.random.default_rng(0)
        for _ in range(10):
            arr = rng.permutation(30)
            assert qa.count_inversions(arr) == ref_inv(arr)


@pytest.fixture(scope="module")
def tiny_beir(tmp_path_factory):
    """Synthetic BEIR dataset where doc 'd{i}' text == query 'q{i}' text."""
    import json
    root = tmp_path_factory.mktemp("beir") / "toy"
    root.mkdir()
    (root / "qrels").mkdir()
    topics = ["červená kočka skáče", "modrý pes běží rychle",
              "zelený strom roste", "žlutá řeka teče dole"]
    with open(root / "corpus.jsonl", "w") as f:
        for i, t in enumerate(topics):
            f.write(json.dumps({"_id": f"d{i}", "title": "", "text": t}) + "\n")
        for i in range(4, 12):
            f.write(json.dumps({"_id": f"d{i}", "title": "t",
                                "text": f"náhodný dokument číslo {i}"}) + "\n")
    with open(root / "queries.jsonl", "w") as f:
        for i, t in enumerate(topics):
            f.write(json.dumps({"_id": f"q{i}", "text": t}) + "\n")
        f.write(json.dumps({"_id": "q_unjudged", "text": "nic"}) + "\n")
    with open(root / "qrels" / "test.tsv", "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        for i in range(4):
            f.write(f"q{i}\td{i}\t1\n")
    return str(root.parent)


class TestBeirHarness:
    def test_loader(self, tiny_beir):
        corpus, queries, qrels = beir_eval.load_beir_dataset(
            tiny_beir + "/toy", "test")
        assert len(corpus) == 12
        assert len(queries) == 4  # unjudged query dropped
        assert qrels["q0"] == {"d0": 1}

    def test_evaluate_model_identical_text_gets_perfect_ndcg(self, tiny_beir):
        """Identical query/doc text -> identical embeddings -> top-1 hit
        (plumbing check with a random encoder)."""
        from czechtriever_tpu.data.tokenizer import WordPieceTokenizer
        from czechtriever_tpu.models import bert

        words = sorted({w for t in ["červená kočka skáče modrý pes běží "
                                    "rychle zelený strom roste žlutá řeka "
                                    "teče dole náhodný dokument číslo nic t"]
                        for w in t.split()})
        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words + \
            [str(i) for i in range(20)]
        tok = qa and WordPieceTokenizer({w: i for i, w in enumerate(vocab)})
        mcfg = bert.BertConfig.tiny(vocab_size=len(vocab))
        params = bert.init_params(jax.random.key(0), mcfg)
        res = beir_eval.evaluate_model(
            params, mcfg, tok, "toy", beir_dir=tiny_beir,
            norm_query=True, norm_doc=True, k_values=(1, 3))
        assert res["NDCG@1"] == 100.0
        assert res["Recall@1"] == 100.0
        assert res["MRR@3"] == 100.0

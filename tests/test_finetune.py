"""Finetuning tests: triplet dataset sampling semantics, static-shape
collation, InBatch-with-extra-negatives loss, accuracy/MRR eval, and a
tiny end-to-end CLI run (reference: /root/reference/finetuning.py +
src/finetuning_data.py)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from czechtriever_tpu.config import Config
from czechtriever_tpu.data.finetuning import (TripletBatcher, TripletCollator,
                                              TripletDataset)
from czechtriever_tpu.data.tokenizer import WordPieceTokenizer
from czechtriever_tpu.models import bert
from czechtriever_tpu.ops import losses
from czechtriever_tpu.training.finetune import evaluate_finetune

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
    f"w{i}" for i in range(40)]


@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    d = tmp_path_factory.mktemp("ftok")
    vf = d / "vocab.txt"
    vf.write_text("\n".join(VOCAB) + "\n")
    return WordPieceTokenizer.from_vocab_file(str(vf), do_lower_case=True)


def make_examples(n, n_neg=3, n_hard=3):
    exs = []
    for i in range(n):
        exs.append({
            "question": f"w{i}",
            "positive_ctxs": [{"title": "", "text": f"w{i} w{(i+1) % n}"}],
            "negative_ctxs": [{"title": "t", "text": f"w{(i+j+2) % 40}"}
                              for j in range(n_neg)],
            "hard_negative_ctxs": [{"title": "", "text": f"w{(i+j+9) % 40}"}
                                   for j in range(n_hard)],
        })
    return exs


@pytest.fixture()
def data_file(tmp_path):
    p = tmp_path / "train.jsonl"
    with open(p, "w") as f:
        for ex in make_examples(12):
            f.write(json.dumps(ex) + "\n")
    return str(p)


class TestTripletDataset:
    def test_training_sampling(self, data_file):
        ds = TripletDataset([data_file], negative_ctxs=2, training=True,
                            seed=0)
        assert len(ds) == 12
        ex = ds[0]
        assert ex["query"] == "w0"
        assert len(ex["negatives"]) == 2

    def test_hard_ratio_one_samples_hard(self, data_file):
        ds = TripletDataset([data_file], negative_ctxs=2,
                            negative_hard_ratio=1.0, training=True, seed=0)
        # hard negatives have no title -> text only, random ones are
        # "t <text>" (title joined, finetuning_data.py:55-60)
        for _ in range(5):
            ex = ds[1]
            assert all(not n.startswith("t ") for n in ex["negatives"])

    def test_hard_ratio_zero_samples_random(self, data_file):
        ds = TripletDataset([data_file], negative_ctxs=2,
                            negative_hard_ratio=0.0, training=True, seed=0)
        ex = ds[1]
        assert all(n.startswith("t ") for n in ex["negatives"])

    def test_eval_mode_deterministic(self, data_file):
        ds = TripletDataset([data_file], training=False, seed=0)
        ex1, ex2 = ds[3], ds[3]
        assert ex1 == ex2
        assert len(ex1["negatives"]) == 1  # first negative only

    def test_shard_striding(self, data_file):
        a = TripletDataset([data_file], shard_id=0, num_shards=2)
        b = TripletDataset([data_file], shard_id=1, num_shards=2)
        assert len(a) + len(b) == 12
        qa = {ex["question"] for ex in a.data}
        qb = {ex["question"] for ex in b.data}
        assert not (qa & qb)

    def test_maxload(self, data_file):
        ds = TripletDataset([data_file], maxload=5)
        assert len(ds) == 5

    def test_fill_to_negative_ctxs(self, data_file):
        # only 3 negatives exist but 5 requested -> cycled to 5
        ds = TripletDataset([data_file], negative_ctxs=5,
                            negative_hard_ratio=0.0, training=True, seed=0)
        ex = ds[0]
        assert len(ex["negatives"]) == 5


class TestCollator:
    def test_static_shapes(self, data_file, tokenizer):
        ds = TripletDataset([data_file], negative_ctxs=2, training=True,
                            seed=0)
        col = TripletCollator(tokenizer, passage_maxlength=12)
        batch = col([ds[i] for i in range(4)])
        assert batch["q_tokens"].shape == (4, 12)
        assert batch["g_tokens"].shape == (4, 12)
        assert batch["n_tokens"].shape == (8, 12)
        assert batch["k_tokens"].shape == (12, 12)
        np.testing.assert_array_equal(batch["k_tokens"][:4],
                                      batch["g_tokens"])


class TestLossWithNegatives:
    def test_inbatch_loss_more_keys_than_queries(self):
        """keys = [golds; negatives]: labels stay arange(B)
        (inbatch.py:62-75 with the triplet collator's k_tokens)."""
        rng = np.random.default_rng(0)
        q = jnp.array(rng.normal(size=(4, 8)).astype(np.float32))
        k = jnp.array(rng.normal(size=(10, 8)).astype(np.float32))
        loss, stats = losses.inbatch_loss(q, k, 1.0)
        # torch oracle
        import torch
        scores = torch.tensor(np.asarray(q)) @ torch.tensor(np.asarray(k)).T
        ref = torch.nn.functional.cross_entropy(
            scores, torch.arange(4)).item()
        assert abs(float(loss) - ref) < 1e-5


class TestEvalFinetune:
    def test_perfect_retrieval_oracle(self, tmp_path, tokenizer):
        """gold text == query text and L2-normalized embeddings ->
        accuracy 100, MRR 1.0."""
        p = tmp_path / "eval.jsonl"
        with open(p, "w") as f:
            for i in range(8):
                f.write(json.dumps({
                    "question": f"w{i} w{i+1}",
                    "positive_ctxs": [{"title": "", "text": f"w{i} w{i+1}"}],
                    "negative_ctxs": [{"title": "", "text": f"w{i+20}"}],
                }) + "\n")
        ds = TripletDataset([str(p)], training=False)
        col = TripletCollator(tokenizer, passage_maxlength=8)
        batcher = TripletBatcher(ds, col, batch_size=4, shuffle=False)
        mcfg = bert.BertConfig(vocab_size=64, hidden_size=32,
                               num_hidden_layers=2, num_attention_heads=2,
                               intermediate_size=64,
                               max_position_embeddings=16,
                               hidden_dropout_prob=0.0,
                               attention_probs_dropout_prob=0.0,
                               dtype="float32")
        params = bert.init_params(jax.random.key(0), mcfg)
        cfg = Config(norm_query=True, norm_doc=True, pooling="average")
        m = evaluate_finetune(params, mcfg, cfg, batcher, batch_size=4)
        assert m["eval_acc"] == 100.0
        assert abs(m["mrr"] - 1.0) < 1e-6
        assert m["n_queries"] == 8


@pytest.mark.slow
class TestFinetuneCLI:
    def test_end_to_end_tiny(self, tmp_path):
        from czechtriever_tpu.cli import finetune as ft_cli
        # model dir with config + vocab, random init
        mdir = tmp_path / "model"
        os.makedirs(mdir)
        with open(mdir / "config.json", "w") as f:
            json.dump({"vocab_size": len(VOCAB), "hidden_size": 32,
                       "num_hidden_layers": 2, "num_attention_heads": 2,
                       "intermediate_size": 64,
                       "max_position_embeddings": 32}, f)
        with open(mdir / "vocab.txt", "w") as f:
            f.write("\n".join(VOCAB) + "\n")
        train = tmp_path / "train.jsonl"
        with open(train, "w") as f:
            for ex in make_examples(32):
                f.write(json.dumps(ex) + "\n")
        out = str(tmp_path / "run")
        ft_cli.main([
            "--train_data", str(train), "--eval_data", str(train),
            "--retriever_model_id", str(mdir), "--random_init",
            "--output_dir", out, "--save_dir", out,
            "--chunk_length", "12", "--negative_ctxs", "2",
            "--target_batch_size", "16", "--per_device_batch_size", "2",
            "--per_device_eval_batch_size", "8",
            "--total_steps", "3", "--log_freq", "1", "--eval_freq", "2",
            "--lr", "1e-3", "--dtype", "float32",
            "--projection_size", "32", "--maxload", "32",
        ])
        assert os.path.exists(os.path.join(out, "checkpoint", "final"))
        with open(os.path.join(out, "metrics.jsonl")) as f:
            recs = [json.loads(line) for line in f]
        assert any("finetune/eval_acc" in r for r in recs)
        assert any("train/loss" in r for r in recs)

"""Behavioral tests for the previously parse-and-ignore flags wired in
round 4: --model_path/--continue_training (reference train.py:455-476),
--val_data_ratio (src/options.py:53-59), --score_function
(src/beir_utils.py:147,180), --num_workers_valid (train.py:205-210)."""

import os

import jax
import numpy as np
import pytest

from czechtriever_tpu.config import Config
from czechtriever_tpu.data.datasets import AugmentSpec
from czechtriever_tpu.data.tokenstream import write_token_file
from czechtriever_tpu.models import bert
from czechtriever_tpu.training.trainer import Trainer

from tests.test_trainer import micro_epoch, tiny_cfg, tiny_mcfg


class TestContinueTraining:
    @pytest.mark.slow
    def test_model_path_warm_start_vs_continue(self, tmp_path):
        """continue_training=True restores optimizer+step from
        model_path; False takes the model weights but resets both
        (reference utils.load reset_params, train.py:468-476)."""
        src_dir = tmp_path / "src_run"
        cfg = tiny_cfg(src_dir, total_steps=3)
        t = Trainer(cfg, tiny_mcfg())
        t.fit(micro_epoch(0, 100, t.global_micro, 16, 211))
        t.save("lastlog")
        ckpt_latest = str(src_dir / "checkpoint" / "latest")

        # warm start (default): weights from checkpoint, step 0,
        # fresh optimizer
        t_warm = Trainer(tiny_cfg(tmp_path / "warm"), tiny_mcfg())
        step = t_warm.resume_from(ckpt_latest, full=False)
        assert step == 0
        for a, b in zip(jax.tree.leaves(t.state.params_q),
                        jax.tree.leaves(t_warm.state.params_q)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(t.state.queue),
                                      np.asarray(t_warm.state.queue))
        # fresh Adam moments: all zeros
        mu = jax.tree.leaves(t_warm.state.opt_state)
        assert all(float(np.abs(np.asarray(x)).max()) == 0.0
                   for x in mu if hasattr(x, "shape") and np.ndim(x) > 0)

        # continuation: full state incl. step and moments
        t_cont = Trainer(tiny_cfg(tmp_path / "cont", total_steps=5),
                         tiny_mcfg())
        step = t_cont.resume_from(ckpt_latest, full=True)
        assert step == 3
        src_moments = [np.asarray(x) for x in
                       jax.tree.leaves(t.state.opt_state)]
        cont_moments = [np.asarray(x) for x in
                        jax.tree.leaves(t_cont.state.opt_state)]
        for a, b in zip(src_moments, cont_moments):
            np.testing.assert_array_equal(a, b)

    @pytest.mark.slow
    def test_cli_model_path_continue(self, tmp_path):
        """CLI --model_path + --continue_training resumes the step
        counter in a fresh output dir."""
        import json

        from czechtriever_tpu.cli import train as train_cli
        tokens = np.random.default_rng(0).integers(5, 200, 100_000)
        tf = str(tmp_path / "tokens.bin")
        write_token_file(tokens, tf)
        mc = str(tmp_path / "model.json")
        with open(mc, "w") as f:
            json.dump({"vocab_size": 211, "hidden_size": 32,
                       "num_hidden_layers": 2, "num_attention_heads": 2,
                       "intermediate_size": 64,
                       "max_position_embeddings": 64}, f)
        common = [
            "--contrastive_mode", "moco", "--queue_size", "64",
            "--chunk_length", "16", "--target_batch_size", "16",
            "--per_device_batch_size", "2", "--log_freq", "1",
            "--lr", "1e-3", "--random_init", "--retriever_model_id",
            "nonexistent-tiny", "--model_config_file", mc,
            "--dtype", "float32", "--projection_size", "32",
            "--val_data_ratio", "0",
        ]
        run1 = str(tmp_path / "run1")
        train_cli.main(["--train_data", tf, "--output_dir", run1,
                        "--save_dir", run1, "--total_steps", "2"] + common)
        run2 = str(tmp_path / "run2")
        train_cli.main(["--train_data", tf, "--output_dir", run2,
                        "--save_dir", run2, "--total_steps", "4",
                        "--model_path", run1, "--continue_training"]
                       + common)
        # continuation trained steps 3..4 only: metrics start past step 2
        with open(os.path.join(run2, "metrics.jsonl")) as f:
            steps = [json.loads(l)["step"] for l in f]
        assert min(steps) >= 3 and max(steps) == 4

    def test_cli_model_path_rejects_non_checkpoint(self, tmp_path):
        from czechtriever_tpu.cli import train as train_cli
        tf = str(tmp_path / "tokens.bin")
        write_token_file(np.arange(5, 3000) % 200 + 5, tf)
        with pytest.raises(SystemExit, match="model_path"):
            train_cli.main([
                "--train_data", tf, "--output_dir", str(tmp_path / "o"),
                "--model_path", str(tmp_path / "nowhere"),
                "--random_init", "--retriever_model_id", "nonexistent"])


class TestValDataRatio:
    def test_carve_from_stream(self, tmp_path):
        from czechtriever_tpu.cli.train import build_val_dataset
        tf = str(tmp_path / "tokens.bin")
        write_token_file(np.random.default_rng(0).integers(5, 200, 16_000),
                         tf)
        cfg = Config(train_data=[tf], valid_data=[], val_data_ratio=0.1,
                     chunk_length=16, output_dir=str(tmp_path))
        spec = AugmentSpec(ratio_min=0.5, ratio_max=0.9,
                           bos_token_id=2, eos_token_id=3)
        ds = build_val_dataset(cfg, spec, None)
        # 1000 chunks * 0.1 = 100 val docs
        assert ds is not None and len(ds) == 100
        item = ds[0]
        assert item["q_tokens"][0] == 2 and item["q_tokens"][-1] == 3

    def test_ratio_zero_disables(self, tmp_path):
        from czechtriever_tpu.cli.train import build_val_dataset
        tf = str(tmp_path / "tokens.bin")
        write_token_file(np.arange(5, 3000) % 200 + 5, tf)
        cfg = Config(train_data=[tf], valid_data=[], val_data_ratio=0.0,
                     chunk_length=16, output_dir=str(tmp_path))
        spec = AugmentSpec(ratio_min=0.5, ratio_max=0.9)
        assert build_val_dataset(cfg, spec, None) is None

    def test_carve_from_jsonl_strided(self, tmp_path):
        import json

        from czechtriever_tpu.cli.train import build_val_dataset
        from czechtriever_tpu.data.tokenizer import WordPieceTokenizer
        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
            f"w{i}" for i in range(40)]
        vt = tmp_path / "vocab.txt"
        vt.write_text("\n".join(vocab) + "\n")
        tok = WordPieceTokenizer.from_vocab_file(str(vt))
        p = tmp_path / "docs.jsonl"
        with open(p, "w") as f:
            for i in range(200):
                f.write(json.dumps({"text": f"w0 w1 w{i % 40}"}) + "\n")
        cfg = Config(train_data=[str(p)], valid_data=[],
                     val_data_ratio=0.05, chunk_length=16,
                     output_dir=str(tmp_path))
        spec = AugmentSpec(ratio_min=0.9, ratio_max=1.0)
        ds = build_val_dataset(cfg, spec, tok)
        assert ds is not None and len(ds) == 10  # 200 * 0.05


class TestScoreFunction:
    class _StubEncoder:
        """Duck-typed encoder: returns fixed embedding matrices."""

        def __init__(self, q, d):
            self._q, self._d = q, d

        def encode_queries(self, texts, batch_size=128):
            return self._q[:len(texts)]

        def encode_corpus(self, corpus, batch_size=128):
            return self._d[:len(corpus)]

    def test_cos_sim_changes_ranking_vs_dot(self):
        from czechtriever_tpu.evaluation.beir import retrieve
        # doc0 points the right way but has a huge norm; doc1 is the
        # exact (normalized) match. dot prefers doc0, cos_sim doc1.
        q = np.asarray([[1.0, 0.0]], np.float32)
        d = np.asarray([[10.0, 10.0], [0.9, 0.0]], np.float32)
        enc = self._StubEncoder(q, d)
        corpus = {"d0": {"text": "a"}, "d1": {"text": "b"}}
        queries = {"q0": "x"}
        dot = retrieve(enc, corpus, queries, top_k=2)
        cos = retrieve(enc, corpus, queries, top_k=2,
                       score_function="cos_sim")
        top_dot = max(dot["q0"], key=dot["q0"].get)
        top_cos = max(cos["q0"], key=cos["q0"].get)
        assert top_dot == "d0" and top_cos == "d1"
        # cos scores are true cosines
        assert abs(cos["q0"]["d1"] - 1.0) < 1e-5
        assert abs(cos["q0"]["d0"] - np.sqrt(0.5)) < 1e-5

    def test_unknown_score_function_raises(self):
        from czechtriever_tpu.evaluation.beir import retrieve
        enc = self._StubEncoder(np.zeros((1, 2), np.float32),
                                np.zeros((1, 2), np.float32))
        with pytest.raises(ValueError, match="score_function"):
            retrieve(enc, {"d": {"text": "a"}}, {"q": "x"},
                     score_function="l2")


class TestNumWorkersValid:
    def test_prefetched_eval_matches_sync(self, tmp_path):
        """num_workers_valid>0 must not change the metrics, only overlap
        host prep with the device sweep."""
        from czechtriever_tpu.training.validate import eval_loss
        from czechtriever_tpu.data.datasets import InMemoryDataset
        mcfg = tiny_mcfg()
        params = bert.init_params(jax.random.key(0), mcfg)
        spec = AugmentSpec(ratio_min=0.9, ratio_max=1.0,
                           bos_token_id=2, eos_token_id=3)
        rng = np.random.default_rng(0)
        docs = [rng.integers(5, 200, 16).astype(np.int32)
                for _ in range(32)]

        def run(nwv):
            ds = InMemoryDataset(docs, 16, spec, seed=7)
            corpus = ds.get_passage_from_all_docs()
            cfg = tiny_cfg(tmp_path, num_workers_valid=nwv)
            return eval_loss(params, mcfg, cfg, ds, corpus, step=0)

        a, b = run(0), run(3)
        assert a and b
        for k in a:
            assert abs(a[k] - b[k]) < 1e-5, (k, a[k], b[k])

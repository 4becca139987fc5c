"""Multi-corpus / preprocessed-shards training-path tests (round-4 ask
#1): the reference trains from a LIST of corpora wrapped in MultiDataset
with sampling prob ∝ len^coeff (/root/reference/src/data.py:105-136,
423-447) and from preprocessed shard dirs (:140-160). These tests drive
the production dispatcher (cli.train.build_multicorpus_batcher) and the
full CLI over {2 jsonl corpora + 1 preprocessed shard dir}."""

import json
import os
from collections import Counter

import numpy as np
import pytest

from czechtriever_tpu.config import Config
from czechtriever_tpu.data.datasets import AugmentSpec


VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
    f"w{i}" for i in range(40)]


def make_model_dir(tmp_path):
    d = tmp_path / "model"
    os.makedirs(d, exist_ok=True)
    with open(d / "config.json", "w") as f:
        json.dump({"vocab_size": len(VOCAB), "hidden_size": 32,
                   "num_hidden_layers": 2, "num_attention_heads": 2,
                   "intermediate_size": 64,
                   "max_position_embeddings": 64}, f)
    with open(d / "vocab.txt", "w") as f:
        f.write("\n".join(VOCAB) + "\n")
    return str(d)


def make_jsonl(tmp_path, name, n_docs, words=24, seed=0):
    p = tmp_path / name
    rng = np.random.default_rng(seed)
    with open(p, "w") as f:
        for _ in range(n_docs):
            text = " ".join(f"w{rng.integers(0, 40)}" for _ in range(words))
            f.write(json.dumps({"text": text}) + "\n")
    return str(p)


def make_shard_dir(tmp_path, name, n_docs, seed=1):
    from czechtriever_tpu.data import passages
    d = tmp_path / name
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    docs = [rng.integers(5, 44, rng.integers(12, 30)).astype(np.int32)
            for _ in range(n_docs)]
    passages.save_preprocessed_shard(docs, str(d / "shard0.npz"))
    return str(d)


def make_sources(tmp_path, n_a=40, n_b=40, n_pre=40):
    ja = make_jsonl(tmp_path, "corpus_a.jsonl", n_a, seed=0)
    jb = make_jsonl(tmp_path, "corpus_b.jsonl", n_b, seed=1)
    pre = make_shard_dir(tmp_path, "preshards", n_pre)
    return ja, jb, pre


def spec_for(cfg):
    s = AugmentSpec.from_config(cfg)
    s.bos_token_id, s.eos_token_id = 2, 3
    s.mask_id, s.vocab_size = 4, len(VOCAB)
    return s


class TestDispatcher:
    def test_every_source_appears_in_batches(self, tmp_path):
        """Batches drawn through the production dispatcher must contain
        samples from all three sources (the reference silently-dropped
        train_data[1:] failure mode)."""
        from czechtriever_tpu.cli.train import build_multicorpus_batcher
        from czechtriever_tpu.data.tokenizer import load_tokenizer
        model_dir = make_model_dir(tmp_path)
        ja, jb, pre = make_sources(tmp_path)
        cfg = Config(train_data=[ja, jb, pre], chunk_length=16,
                     num_workers=0, seed=0)
        tok = load_tokenizer(model_dir)
        batcher, mixture = build_multicorpus_batcher(
            cfg, spec_for(cfg), tok, batch_size=8)
        assert set(mixture.dataset_ids) == {ja, jb, pre}
        seen = Counter()
        for i, batch in enumerate(batcher.epoch()):
            assert batch["q_tokens"].shape == (8, 18)
            assert "dataset_id" in batch
            seen.update(batch["dataset_id"].tolist())
            if i >= 10:
                break
        assert set(seen) == {ja, jb, pre}, f"missing sources: {seen}"

    def test_sampling_coefficient_shifts_mixture(self, tmp_path):
        """coeff=0 -> uniform over sources regardless of size; coeff=1 ->
        prob ∝ dataset length (src/data.py:441-447)."""
        from czechtriever_tpu.cli.train import build_multicorpus_batcher
        from czechtriever_tpu.data.tokenizer import load_tokenizer
        model_dir = make_model_dir(tmp_path)
        # 10x size skew between sources
        ja = make_jsonl(tmp_path, "small.jsonl", 20, seed=0)
        pre = make_shard_dir(tmp_path, "big_pre", 200)
        tok = load_tokenizer(model_dir)

        def draw(coeff, n=1500):
            cfg = Config(train_data=[ja, pre], chunk_length=16,
                         num_workers=0, sampling_coefficient=coeff, seed=0)
            _, mixture = build_multicorpus_batcher(
                cfg, spec_for(cfg), tok, batch_size=4)
            c = Counter(mixture[i]["dataset_id"] for i in range(n))
            return c[pre] / n

        frac0 = draw(0.0)
        frac1 = draw(1.0)
        assert abs(frac0 - 0.5) < 0.06, f"coeff=0 not uniform: {frac0}"
        # len-proportional: 200/220 ≈ 0.909
        assert abs(frac1 - 200 / 220) < 0.05, f"coeff=1 not ∝ len: {frac1}"

    def test_loading_mode_split_partitions_files(self, tmp_path):
        """loading_mode='split' array-splits the shard files across
        processes (src/data.py:144-147); 'single' takes the first."""
        from czechtriever_tpu.data import passages
        d = tmp_path / "many"
        os.makedirs(d)
        rng = np.random.default_rng(0)
        for i in range(4):
            docs = [rng.integers(5, 44, 10).astype(np.int32)
                    for _ in range(5 + i)]
            passages.save_preprocessed_shard(docs, str(d / f"s{i}.npz"))
        full = passages.load_preprocessed_shards(str(d), "full")
        part0 = passages.load_preprocessed_shards(str(d), "split", 0, 2)
        part1 = passages.load_preprocessed_shards(str(d), "split", 1, 2)
        assert len(part0) + len(part1) == len(full) == 5 + 6 + 7 + 8
        single = passages.load_preprocessed_shards(str(d), "single")
        assert len(single) == 5

    def test_stream_source_joins_mixture(self, tmp_path):
        """uint16 token streams participate via the random-access
        memmap view (beyond-reference)."""
        from czechtriever_tpu.cli.train import build_multicorpus_batcher
        tokens = np.random.default_rng(0).integers(5, 44, 5000)
        tf = str(tmp_path / "tokens.bin")
        with open(tf, "wb") as f:
            f.write(tokens.astype("<u2").tobytes())
        pre = make_shard_dir(tmp_path, "pre", 30)
        cfg = Config(train_data=[tf, pre], chunk_length=16, num_workers=0)
        batcher, mixture = build_multicorpus_batcher(
            cfg, spec_for(cfg), None, batch_size=4)
        assert len(mixture.datasets[tf]) == 5000 // 16
        seen = set()
        for i, batch in enumerate(batcher.epoch()):
            seen.update(batch["dataset_id"].tolist())
            if i >= 20:
                break
        assert seen == {tf, pre}

    def test_stream_chunk_dataset_windows(self, tmp_path):
        """StreamChunkDataset item i covers the i-th chunk window (plus
        the epoch offset) of the flat token file."""
        from czechtriever_tpu.data.datasets import StreamChunkDataset
        tokens = np.arange(5, 5 + 640) % 39 + 5
        tf = str(tmp_path / "tok.bin")
        with open(tf, "wb") as f:
            f.write(tokens.astype("<u2").tobytes())
        spec = AugmentSpec(ratio_min=1.0, ratio_max=1.0)  # identity crop
        ds = StreamChunkDataset(tf, 16, spec, seed=0)
        assert len(ds) == 40
        item = ds[3]
        expected = tokens[3 * 16:4 * 16].astype(np.int32)
        np.testing.assert_array_equal(item["q_tokens"], expected)
        before = len(ds)
        ds.generate_offset()
        assert 0 <= ds.offset < 16
        assert len(ds) in (before, before - 1)


@pytest.mark.slow
class TestMultiCorpusCLI:
    def test_train_from_three_sources(self, tmp_path):
        """End-to-end CLI training over {2 jsonl + 1 preprocessed dir}
        completes and checkpoints (the round-4 done criterion)."""
        from czechtriever_tpu.cli import train as train_cli
        model_dir = make_model_dir(tmp_path)
        ja, jb, pre = make_sources(tmp_path, 30, 30, 30)
        out = str(tmp_path / "run")
        train_cli.main([
            "--train_data", ja, jb, pre, "--output_dir", out,
            "--save_dir", out, "--contrastive_mode", "moco",
            "--queue_size", "64", "--chunk_length", "16",
            "--target_batch_size", "8", "--per_device_batch_size", "1",
            "--total_steps", "3", "--log_freq", "1", "--lr", "1e-3",
            "--random_init", "--retriever_model_id", model_dir,
            "--dtype", "float32", "--projection_size", "32",
            "--val_data_ratio", "0",
        ])
        assert os.path.exists(os.path.join(out, "checkpoint", "final"))

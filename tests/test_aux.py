"""Tests for the auxiliary surface: lazy jsonl datasets, SimCSE baseline,
dataset converters, SLURM signal handlers, throughput harness, demo REPL
(reference: src/data.py:164-420, src/simcse.py, data_scripts/,
src/slurm.py:15-40, eval_throughput.py, demo.py)."""

import io
import json
import os
import signal

import numpy as np
import pytest

from czechtriever_tpu.data.datasets import AugmentSpec
from czechtriever_tpu.data.lazy import (LazyJsonlDataset, LazyJsonlNoBounds,
                                        build_line_index, load_line_index,
                                        save_line_index)
from czechtriever_tpu.data.tokenizer import WordPieceTokenizer

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
    f"w{i}" for i in range(40)]


@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    d = tmp_path_factory.mktemp("tok")
    (d / "vocab.txt").write_text("\n".join(VOCAB) + "\n")
    return WordPieceTokenizer.from_vocab_file(str(d / "vocab.txt"),
                                              do_lower_case=True)


@pytest.fixture(scope="module")
def jsonl_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("lazy")
    p = d / "docs.jsonl"
    with open(p, "w") as f:
        for i in range(10):
            # doc i has 5 tokens: w_i .. w_i+4
            words = " ".join(f"w{(i + j) % 40}" for j in range(5))
            f.write(json.dumps({"text": words}) + "\n")
    return str(p)


def spec():
    return AugmentSpec(ratio_min=0.5, ratio_max=0.9, bos_token_id=2,
                       eos_token_id=3)


class TestLineIndex:
    def test_offsets_point_at_lines(self, jsonl_file, tmp_path):
        offsets, cumsums = build_line_index(jsonl_file)
        assert len(offsets) == 10
        assert cumsums is None
        with open(jsonl_file) as f:
            f.seek(offsets[3])
            d = json.loads(f.readline())
        assert d["text"].startswith("w3")
        save_line_index(offsets, str(tmp_path / "off.pkl"))
        off, cs = load_line_index(str(tmp_path / "off.pkl"))
        assert off == offsets and cs is None

    def test_load_reference_dict_format(self, tmp_path):
        import pickle
        recs = [{"offset": 0, "tokens_before_this_line": 0},
                {"offset": 40, "tokens_before_this_line": 5}]
        p = str(tmp_path / "ref.pkl")
        with open(p, "wb") as f:
            pickle.dump(recs, f)
        off, cs = load_line_index(p)
        assert off == [0, 40] and cs == [0, 5]

    def test_cumsums_count_tokens(self, jsonl_file, tokenizer):
        _, cumsums = build_line_index(jsonl_file, tokenizer)
        # every doc is 5 single-token words
        assert cumsums == [5 * i for i in range(10)]


class TestLazyJsonl:
    def test_pairs_within_doc(self, jsonl_file, tokenizer):
        ds = LazyJsonlDataset(jsonl_file, tokenizer, spec(), chunk_length=4)
        assert len(ds) == 10
        ex = ds[2]
        assert set(ex) == {"q_tokens", "k_tokens"}
        # crops carry bos/eos and tokens from doc 2's vocabulary window
        for key in ("q_tokens", "k_tokens"):
            toks = list(ex[key])
            assert toks[0] == 2 and toks[-1] == 3
            doc2 = {tokenizer.encode(f"w{(2+j) % 40}",
                                     add_special_tokens=False)[0]
                    for j in range(5)}
            assert set(toks[1:-1]) <= doc2

    def test_nobounds_crosses_lines(self, jsonl_file, tokenizer):
        offsets, cumsums = build_line_index(jsonl_file, tokenizer)
        ds = LazyJsonlNoBounds(jsonl_file, tokenizer, spec(),
                               chunk_length=7, offsets=offsets,
                               cumsums=cumsums)
        # 50 tokens total -> 7 windows of 7
        assert len(ds) == 7
        ex = ds[0]  # first window spans doc 0 (5 tokens) + doc 1 (2)
        assert set(ex) == {"q_tokens", "k_tokens"}
        before = len(ds)
        ds.generate_offset()
        assert len(ds) <= before

    def test_nobounds_windows_tile_the_stream(self, jsonl_file, tokenizer):
        offsets, cumsums = build_line_index(jsonl_file, tokenizer)
        wide = AugmentSpec(ratio_min=1.0, ratio_max=1.0)  # identity crop
        ds = LazyJsonlNoBounds(jsonl_file, tokenizer, wide, chunk_length=5,
                               offsets=offsets, cumsums=cumsums)
        # chunk 5 == doc length -> window i is exactly doc i
        for i in (0, 4, 9):
            toks = list(ds[i]["q_tokens"])
            expect = tokenizer.encode(
                " ".join(f"w{(i + j) % 40}" for j in range(5)),
                add_special_tokens=False)
            assert toks == expect


class TestSimCSE:
    @pytest.mark.slow  # >15s on the CPU backend
    def test_cls_pool_geometry(self, tmp_path):
        from czechtriever_tpu.models.simcse import load_simcse
        d = tmp_path / "simcse"
        os.makedirs(d)
        with open(d / "config.json", "w") as f:
            json.dump({"vocab_size": 64, "hidden_size": 32,
                       "num_hidden_layers": 2, "num_attention_heads": 2,
                       "intermediate_size": 64,
                       "max_position_embeddings": 32}, f)
        enc, tok, name = load_simcse(str(d))
        ids = np.random.default_rng(0).integers(5, 60, (4, 10)
                                                ).astype(np.int32)
        mask = np.ones_like(ids)
        emb = np.asarray(enc(ids, mask))
        assert emb.shape == (4, 32)
        # CLS pooling: differs from the mean-pooled contriever encode
        from czechtriever_tpu.models.contriever import encode
        mean = np.asarray(encode(enc.params, enc.mcfg, ids, mask,
                                 pooling_mode="average"))
        assert np.abs(emb - mean).max() > 1e-6

    def test_electra_projection_rejected(self, tmp_path):
        from czechtriever_tpu.models.simcse import load_simcse
        d = tmp_path / "electra"
        os.makedirs(d)
        with open(d / "config.json", "w") as f:
            json.dump({"vocab_size": 64, "hidden_size": 32,
                       "embedding_size": 16, "num_hidden_layers": 2,
                       "num_attention_heads": 2, "intermediate_size": 64,
                       "max_position_embeddings": 32}, f)
        with pytest.raises(ValueError):
            load_simcse(str(d))


class TestConverters:
    def test_mrtydi(self, tmp_path):
        from czechtriever_tpu.cli.convert_datasets import convert_mrtydi
        src = tmp_path / "mrtydi"
        os.makedirs(src / "collection")
        with open(src / "topic.tsv", "w") as f:
            f.write("q1\tfirst question\nq2\tsecond question\n")
        with open(src / "collection" / "docs.jsonl", "w") as f:
            f.write(json.dumps({"id": "d1", "contents": "doc one"}) + "\n")
        with open(src / "qrels.test.txt", "w") as f:
            f.write("q1 0 d1 1\n")
        out = tmp_path / "beir"
        convert_mrtydi(str(src), str(out))
        with open(out / "queries.jsonl") as f:
            qs = [json.loads(line) for line in f]
        assert qs[0] == {"_id": "q1", "text": "first question"}
        with open(out / "corpus.jsonl") as f:
            c = json.loads(f.readline())
        assert c["_id"] == "d1" and c["text"] == "doc one"
        with open(out / "qrels" / "test.tsv") as f:
            lines = f.read().splitlines()
        assert lines[0] == "query-id\tcorpus-id\tscore"
        assert lines[1] == "q1\td1\t1"

    def test_dareczech(self, tmp_path):
        from czechtriever_tpu.cli.convert_datasets import convert_dareczech
        src = tmp_path / "dare.tsv"
        with open(src, "w") as f:
            f.write("id\tquery\ttitle\tdoc\tlabel\n")
            f.write("1\thello\tT\tdoc text\t0.5\n")
            f.write("2\thello\t\tother doc\t1.0\n")
        out = tmp_path / "beir"
        convert_dareczech(str(src), str(out))
        with open(out / "queries.jsonl") as f:
            qs = [json.loads(line) for line in f]
        assert len(qs) == 1  # unique query texts only
        with open(out / "qrels" / "test.tsv") as f:
            lines = f.read().splitlines()
        assert lines[1].split("\t")[2] == "1"   # 2*0.5
        assert lines[2].split("\t")[2] == "2"   # 2*1.0

    def test_annotations(self, tmp_path):
        """create_beir_dataset.py semantics: filter unannotated /
        symmetric records, merge users, dedupe docs with STABLE ids,
        resolve label conflicts by policy, positive->2 else 0."""
        from czechtriever_tpu.cli.convert_datasets import convert_annotations
        src = tmp_path / "dumps"
        os.makedirs(src)

        def rec(user, query, cards, symmetric=False):
            r = {"user": user, "data": {"cards": cards}}
            if not symmetric:
                r["query_string"] = query
            return json.dumps(r, ensure_ascii=False)

        card = lambda text, state, ts="t1": {
            "segments_cz": text, "state": state, "timestamp": ts}
        with open(src / "a.jsonl", "w") as f:
            f.write(rec("u1", "praha", [card("docA", "positive"),
                                        card("docB", "negative")]) + "\n")
            # no annotated cards -> dropped
            f.write(rec("u1", "brno", [card("docC", "neutral")]) + "\n")
            # symmetric (no query_string) -> dropped
            f.write(rec("u1", "x", [card("docD", "positive")],
                        symmetric=True) + "\n")
        with open(src / "b.jsonl", "w") as f:
            # same query, conflicting label on docA + one new doc
            f.write(rec("u2", "praha", [card("docA", "negative"),
                                        card("docE", "positive")]) + "\n")

        out = tmp_path / "beir"
        convert_annotations(str(src), str(out), conflicts="first")
        with open(out / "queries.jsonl") as f:
            qs = [json.loads(line) for line in f]
        assert [q["text"] for q in qs] == ["praha"]
        with open(out / "corpus.jsonl") as f:
            corpus = {c["text"]: c["_id"] for c in map(json.loads, f)}
        assert set(corpus) == {"docA", "docB", "docE"}
        assert sorted(corpus.values()) == ["d0", "d1", "d2"]  # stable ids
        with open(out / "qrels" / "test.tsv") as f:
            rows = [l.split("\t") for l in f.read().splitlines()[1:]]
        scores = {r[1]: r[2] for r in rows}
        # conflicts="first": u1's positive docA annotation wins -> 2
        assert scores[corpus["docA"]] == "2"
        assert scores[corpus["docB"]] == "0"
        assert scores[corpus["docE"]] == "2"

        out2 = tmp_path / "beir2"
        convert_annotations(str(src), str(out2), conflicts="negative")
        with open(out2 / "qrels" / "test.tsv") as f:
            rows = [l.split("\t") for l in f.read().splitlines()[1:]]
        assert {r[1]: r[2] for r in rows}[corpus["docA"]] == "0"


class TestSlurmSignals:
    def test_handlers_installed_and_sigterm_bypassed(self):
        from czechtriever_tpu.utils import slurm
        slurm.init_signal_handler()
        assert signal.getsignal(signal.SIGUSR1) is slurm._usr1_handler
        assert signal.getsignal(signal.SIGTERM) is slurm._term_handler
        # SIGTERM handler is a no-op (src/slurm.py:30-33)
        slurm._term_handler(signal.SIGTERM, None)

    def test_usr1_exits_without_requeue_outside_slurm(self, monkeypatch):
        from czechtriever_tpu.utils import slurm
        monkeypatch.delenv("SLURM_JOB_ID", raising=False)
        monkeypatch.delenv("SLURM_PROCID", raising=False)
        calls = []
        monkeypatch.setattr(os, "system", lambda c: calls.append(c))
        with pytest.raises(SystemExit):
            slurm._usr1_handler(signal.SIGUSR1, None)
        assert calls == []

    def test_usr1_requeues_on_rank0(self, monkeypatch):
        from czechtriever_tpu.utils import slurm
        monkeypatch.setenv("SLURM_JOB_ID", "4242")
        monkeypatch.setenv("SLURM_PROCID", "0")
        calls = []
        monkeypatch.setattr(os, "system", lambda c: calls.append(c))
        with pytest.raises(SystemExit):
            slurm._usr1_handler(signal.SIGUSR1, None)
        assert calls == ["scontrol requeue 4242"]


class TestThroughputHarness:
    def test_encode_measurement_smoke(self, tmp_path):
        from czechtriever_tpu.cli import eval_throughput as et
        from czechtriever_tpu.models import bert
        import jax
        mcfg = bert.BertConfig(vocab_size=64, hidden_size=32,
                               num_hidden_layers=2, num_attention_heads=2,
                               intermediate_size=64,
                               max_position_embeddings=32, dtype="float32")
        params = bert.init_params(jax.random.key(0), mcfg)
        res = et.measure_encode(params, mcfg, 4, iterations=3, min_len=4,
                                max_len=16)
        assert res["samples_per_s"] > 0
        assert res["tokens_per_s"] > 0
        assert res["latency_ms_p25"] <= res["latency_ms_p75"]
        assert 4 <= res["avg_seq_length"] <= 16

    def test_search_measurement_smoke(self):
        from czechtriever_tpu.cli import eval_throughput as et
        res = et.measure_search(16, 500, 8, 10, iterations=2)
        assert res["index"] == "flat"
        assert res["queries_per_s"] > 0
        assert res["index_memory_mb"] == pytest.approx(500 * 16 * 4 / 1e6)


class TestProfiling:
    def test_step_profiler_writes_trace(self, tmp_path):
        import jax
        import jax.numpy as jnp
        from czechtriever_tpu.utils.profiling import StepProfiler
        d = str(tmp_path / "prof")
        prof = StepProfiler(d, start_step=1, num_steps=1)
        f = jax.jit(lambda x: x * 2)
        for step in range(3):
            prof.maybe_start(step)
            f(jnp.ones((4,))).block_until_ready()
            prof.maybe_stop(step + 1)
        prof.close()
        found = [fn for _, _, fs in os.walk(d) for fn in fs]
        assert any(fn.endswith((".xplane.pb", ".trace.json.gz"))
                   for fn in found), found

    def test_trace_if_noop_when_disabled(self, tmp_path):
        from czechtriever_tpu.utils.profiling import trace_if
        with trace_if(str(tmp_path / "x"), enabled=False):
            pass
        assert not os.path.exists(str(tmp_path / "x"))


class TestDemo:
    def test_repl_one_round(self, tmp_path, monkeypatch, capsys):
        from czechtriever_tpu.cli import demo
        d = tmp_path / "model"
        os.makedirs(d)
        with open(d / "config.json", "w") as f:
            json.dump({"vocab_size": len(VOCAB), "hidden_size": 32,
                       "num_hidden_layers": 2, "num_attention_heads": 2,
                       "intermediate_size": 64,
                       "max_position_embeddings": 64}, f)
        with open(d / "vocab.txt", "w") as f:
            f.write("\n".join(VOCAB) + "\n")
        monkeypatch.setattr("sys.stdin", io.StringIO("w1 w2 w3\n"))
        demo.main(["--model_path", str(d), "--window", "8"])
        out = capsys.readouterr().out
        assert "Embedding:" in out
        assert "w1 w2 w3" in out


class TestExportHF:
    @pytest.mark.slow  # >15s on the CPU backend
    def test_checkpoint_to_hf_roundtrip(self, tmp_path):
        """train 2 steps -> export_hf -> reload via transformers and
        match the embeddings (save_contriever parity,
        src/contriever.py:162-166)."""
        import jax
        import jax.numpy as jnp
        from czechtriever_tpu.cli import export_hf
        from czechtriever_tpu.config import Config
        from czechtriever_tpu.models import bert
        from czechtriever_tpu.models.contriever import encode
        from czechtriever_tpu.training.trainer import Trainer

        mcfg = bert.BertConfig(vocab_size=211, hidden_size=32,
                               num_hidden_layers=2, num_attention_heads=2,
                               intermediate_size=64,
                               max_position_embeddings=64,
                               hidden_dropout_prob=0.0,
                               attention_probs_dropout_prob=0.0,
                               dtype="float32")
        out = str(tmp_path / "run")
        cfg = Config(contrastive_mode="inbatch", target_batch_size=8,
                     per_device_batch_size=1, total_steps=2, log_freq=1,
                     eval_freq=0, save_freq=0, output_dir=out,
                     save_dir=out, projection_size=32, lr=1e-3,
                     donate_state=False)
        t = Trainer(cfg, mcfg)
        rng = np.random.default_rng(0)

        def epoch():
            for _ in range(10):
                ids = rng.integers(5, 211, (2, t.global_micro, 12)
                                   ).astype(np.int32)
                mask = np.ones((t.global_micro, 12), np.int32)
                yield {"q_tokens": ids[0], "q_mask": mask,
                       "k_tokens": ids[1], "k_mask": mask}

        t.fit(epoch)
        t.save("final")

        mc = str(tmp_path / "m.json")
        with open(mc, "w") as f:
            json.dump({"vocab_size": 211, "hidden_size": 32,
                       "num_hidden_layers": 2, "num_attention_heads": 2,
                       "intermediate_size": 64,
                       "max_position_embeddings": 64,
                       "hidden_dropout_prob": 0.0,
                       "attention_probs_dropout_prob": 0.0}, f)
        export_dir = str(tmp_path / "export")
        export_hf.main(["--checkpoint",
                        os.path.join(out, "checkpoint", "final"),
                        "--output_dir", export_dir,
                        "--model_config_file", mc])

        from transformers import BertModel
        hf = BertModel.from_pretrained(export_dir,
                                       add_pooling_layer=False).eval()
        import torch
        ids = np.random.default_rng(1).integers(5, 211, (2, 10)
                                                ).astype(np.int32)
        mask = np.ones_like(ids)
        with torch.no_grad():
            ref = hf(input_ids=torch.tensor(ids.astype(np.int64)),
                     attention_mask=torch.tensor(mask.astype(np.int64))
                     ).last_hidden_state.numpy()
        ours = np.asarray(bert.forward(
            jax.tree.map(jnp.asarray, t.encoder_params), mcfg,
            jnp.array(ids), jnp.array(mask)))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


class TestConfigDirMirroring:
    """--output_dir without --save_dir must redirect checkpoints too:
    otherwise the trainer silently resumes from whatever unrelated run
    last wrote the default ./checkpoint/my_experiments/checkpoint/latest
    (both flags + shared default mirror src/options.py:16-29)."""

    def test_save_dir_follows_output_dir(self):
        from czechtriever_tpu.config import Config
        cfg = Config.from_args(["--output_dir", "/tmp/somewhere-else"])
        assert cfg.save_dir == "/tmp/somewhere-else"

    def test_explicit_save_dir_wins(self):
        from czechtriever_tpu.config import Config
        cfg = Config.from_args(["--output_dir", "/tmp/a",
                                "--save_dir", "/tmp/b"])
        assert cfg.save_dir == "/tmp/b"
        assert cfg.output_dir == "/tmp/a"

    def test_defaults_untouched(self):
        from czechtriever_tpu.config import Config
        cfg = Config.from_args([])
        assert cfg.save_dir == Config().save_dir

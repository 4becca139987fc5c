"""Distillation step tests: weighting math vs an independent
re-derivation, parity with the pure MoCo step at w=0, frozen-teacher
invariants, sharded equivalence, and a tiny end-to-end CLI run
(reference semantics: /root/reference/distill.py:228-419)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from czechtriever_tpu.config import Config
from czechtriever_tpu.models import bert
from czechtriever_tpu.models.contriever import encode
from czechtriever_tpu.ops import losses
from czechtriever_tpu.parallel import mesh as meshlib
from czechtriever_tpu.training import distill, optim, state as statelib, steps


def tiny_cfg(**kw):
    d = dict(queue_size=32, temperature=0.05, momentum=0.99, lr=1e-3,
             warmup_steps=0, total_steps=1000, scheduler="linear",
             projection_size=32, contrastive_mode="distill",
             distill_weight=0.5, clip_gradients=False, weight_decay=0.0)
    d.update(kw)
    return Config(**d)


def tiny_mcfg(dropout=0.0, hidden=32):
    return bert.BertConfig(vocab_size=211, hidden_size=hidden,
                           num_hidden_layers=2,
                           num_attention_heads=2, intermediate_size=64,
                           max_position_embeddings=64,
                           hidden_dropout_prob=dropout,
                           attention_probs_dropout_prob=dropout,
                           dtype="float32")


def make_batch(rng, A, B, L, vocab):
    ids = rng.integers(5, vocab, size=(2, A, B, L)).astype(np.int32)
    mask = np.ones((2, A, B, L), np.int32)
    mask[..., L - 3:] = 0
    return {"q_tokens": jnp.array(ids[0]), "q_mask": jnp.array(mask[0]),
            "k_tokens": jnp.array(ids[1]), "k_mask": jnp.array(mask[1])}


def setup(w=0.5, teacher_hidden=48):
    cfg = tiny_cfg(distill_weight=w)
    mcfg = tiny_mcfg()
    # teacher with a different hidden size, like gemma2 3584 vs czert 768
    tcfg = tiny_mcfg(hidden=teacher_hidden)
    tx = optim.make_optimizer(cfg)
    st = statelib.create_distill_state(jax.random.key(0), cfg, mcfg, tcfg, tx)
    step_fn = jax.jit(distill.make_distill_step(cfg, mcfg, tcfg, tx))
    return cfg, mcfg, tcfg, tx, st, step_fn


class TestDistillStep:
    @pytest.mark.slow  # >15s on the CPU backend
    def test_manual_rederivation_oracle(self):
        """Re-derive one full optimizer step with a plain Python loop over
        microbatches using only the public ops, and require the jitted
        scan-based step to reproduce it — EMA ordering, teacher pooling,
        (1-w)/w*100 weighting (distill.py:274-284), queue updates and the
        AdamW apply all have to line up."""
        cfg, mcfg, tcfg, tx, st, step_fn = setup(w=0.3)
        A, B, L = 2, 8, 16
        batch = make_batch(np.random.default_rng(0), A, B, L, mcfg.vocab_size)
        rng0 = jax.random.key(7)

        st2, stats = step_fn(st, batch, rng0)

        # ---- manual path ----
        rng = jax.random.fold_in(rng0, st.step)
        mrngs = jax.random.split(rng, A)
        params_k, queue, ptr = st.params_k, st.queue, st.queue_ptr
        grad_sum = jax.tree.map(jnp.zeros_like, st.params_q)
        for a in range(A):
            qr, kr = jax.random.split(mrngs[a])
            params_k = jax.tree.map(
                lambda pk, pq: pk * cfg.momentum + pq * (1 - cfg.momentum),
                params_k, st.params_q)
            mb = {k: v[a] for k, v in batch.items()}
            k_emb = encode(params_k, mcfg, mb["k_tokens"], mb["k_mask"],
                           dropout_rng=kr, deterministic=False)
            t_emb = encode(st.params_t, tcfg, mb["q_tokens"], mb["q_mask"],
                           deterministic=True, pooling_mode="last")

            def total_loss(p):
                q = encode(p, mcfg, mb["q_tokens"], mb["q_mask"],
                           dropout_rng=qr, deterministic=False)
                c, _ = losses.moco_loss(q, k_emb, queue, cfg.temperature)
                aux = losses.distill_sim_mse(q, t_emb) * 100.0
                return (1 - cfg.distill_weight) * c + cfg.distill_weight * aux

            grads = jax.grad(total_loss)(st.params_q)
            grad_sum = jax.tree.map(jnp.add, grad_sum, grads)
            queue, ptr = losses.queue_update(queue, ptr, k_emb)
        updates, _ = tx.update(grad_sum, st.opt_state, st.params_q)
        expect_q = optax.apply_updates(st.params_q, updates)

        # scan vs python-loop reassociation -> tiny f32 drift
        for a, b in zip(jax.tree.leaves(st2.params_q),
                        jax.tree.leaves(expect_q)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=5e-7)
        np.testing.assert_allclose(np.asarray(st2.queue), np.asarray(queue),
                                   rtol=1e-5, atol=1e-6)
        assert int(st2.queue_ptr) == int(ptr)

    @pytest.mark.slow  # >15s on the CPU backend
    def test_w0_matches_pure_moco(self):
        """distill_weight=0 must reproduce the plain MoCo step exactly
        (MoCoDistill is a near-copy of MoCo, src/moco.py:15-184)."""
        cfg, mcfg, tcfg, tx, st, step_fn = setup(w=0.0)
        batch = make_batch(np.random.default_rng(1), 2, 8, 16, mcfg.vocab_size)
        rng = jax.random.key(3)
        st2, stats_d = step_fn(st, batch, rng)

        moco_st = statelib.MoCoState(
            step=st.step, params_q=st.params_q, params_k=st.params_k,
            opt_state=st.opt_state, queue=st.queue, queue_ptr=st.queue_ptr)
        moco_fn = jax.jit(steps.make_moco_step(cfg, mcfg, tx))
        st3, stats_m = moco_fn(moco_st, batch, rng)

        np.testing.assert_allclose(float(stats_d["loss"]),
                                   float(stats_m["loss"]), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(st2.params_q),
                        jax.tree.leaves(st3.params_q)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-8)

    def test_teacher_frozen_and_stats(self):
        cfg, mcfg, tcfg, tx, st, step_fn = setup(w=0.5)
        batch = make_batch(np.random.default_rng(2), 1, 8, 16, mcfg.vocab_size)
        st2, stats = step_fn(st, batch, jax.random.key(1))
        for a, b in zip(jax.tree.leaves(st2.params_t),
                        jax.tree.leaves(st.params_t)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for key in ("loss", "loss_contrastive", "distill_loss", "accuracy",
                    "stdq", "stdk", "grad_norm"):
            assert key in stats
            assert np.isfinite(float(stats[key]))
        assert int(st2.step) == 1

    def test_distill_loss_decreases(self):
        """With w=1 (pure distillation) the sim-matrix MSE should fall."""
        cfg, mcfg, tcfg, tx, st, step_fn = setup(w=1.0)
        batch = make_batch(np.random.default_rng(3), 1, 16, 16,
                           mcfg.vocab_size)
        seen = []
        for _ in range(30):
            st, stats = step_fn(st, batch, jax.random.key(1))
            seen.append(float(stats["distill_loss"]))
        assert seen[-1] < seen[0]
        assert np.isfinite(seen).all()


@pytest.mark.slow
class TestDistillSharded:
    def test_sharded_matches_single_device(self):
        assert len(jax.devices()) == 8
        cfg, mcfg, tcfg, tx, st, _ = setup(w=0.5)
        fn = distill.make_distill_step(cfg, mcfg, tcfg, tx)
        batch = make_batch(np.random.default_rng(0), 2, 16, 16,
                           mcfg.vocab_size)
        rng = jax.random.key(3)
        st_s, stats_s = jax.jit(fn)(st, batch, rng)

        m = meshlib.make_mesh()
        st_m = meshlib.replicate(m, st)
        batch_m = meshlib.shard_microbatches(m, batch)
        st_p, stats_p = jax.jit(fn)(st_m, batch_m, rng)

        np.testing.assert_allclose(float(stats_p["loss"]),
                                   float(stats_s["loss"]), rtol=1e-5)
        np.testing.assert_allclose(float(stats_p["distill_loss"]),
                                   float(stats_s["distill_loss"]), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(st_s.params_q),
                        jax.tree.leaves(st_p.params_q)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)


@pytest.mark.slow
class TestDistillCLI:
    def test_end_to_end_tiny(self, tmp_path):
        """Full distill CLI run: token file -> a few distill steps ->
        checkpoint with distill stats logged."""
        from czechtriever_tpu.cli import distill as distill_cli
        from czechtriever_tpu.data.tokenstream import write_token_file
        tokens = np.random.default_rng(0).integers(5, 200, 100_000)
        tf = str(tmp_path / "tokens.bin")
        write_token_file(tokens, tf)
        mc = str(tmp_path / "model.json")
        with open(mc, "w") as f:
            json.dump({"vocab_size": 211, "hidden_size": 32,
                       "num_hidden_layers": 2, "num_attention_heads": 2,
                       "intermediate_size": 64,
                       "max_position_embeddings": 64}, f)
        out = str(tmp_path / "run")
        distill_cli.main([
            "--train_data", tf, "--output_dir", out, "--save_dir", out,
            "--queue_size", "64", "--distill_weight", "0.5",
            "--chunk_length", "16", "--target_batch_size", "16",
            "--per_device_batch_size", "2", "--total_steps", "3",
            "--log_freq", "1", "--lr", "1e-3", "--random_init",
            "--retriever_model_id", "nonexistent-tiny",
            "--teacher_model_id", "nonexistent-teacher",
            "--model_config_file", mc, "--dtype", "float32",
            "--projection_size", "32",
        ])
        assert os.path.exists(os.path.join(out, "checkpoint", "final"))
        with open(os.path.join(out, "metrics.jsonl")) as f:
            recs = [json.loads(line) for line in f]
        assert any("train/distill_loss" in r for r in recs)


class TestTeacherRetokenizer:
    def test_adds_teacher_tokens_with_prompt(self, tmp_path):
        from czechtriever_tpu.data.datasets import (DISTILL_TASK,
                                                    get_detailed_instruct,
                                                    make_teacher_retokenizer)
        from czechtriever_tpu.data.tokenizer import WordPieceTokenizer
        svocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "hello",
                  "world", "query"]
        tvocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "hello",
                  "world", "query", "instruct", "web", "search", "given",
                  "retrieve", "relevant", "passages", "that", "answer",
                  "the", "a", ",", ".", "<", ">"]
        (tmp_path / "sv.txt").write_text("\n".join(svocab) + "\n")
        (tmp_path / "tv.txt").write_text("\n".join(tvocab) + "\n")
        st = WordPieceTokenizer.from_vocab_file(str(tmp_path / "sv.txt"),
                                                do_lower_case=True)
        tt = WordPieceTokenizer.from_vocab_file(str(tmp_path / "tv.txt"),
                                                do_lower_case=True)
        import numpy as np
        ids = np.asarray([st.encode("hello world"),
                          st.encode("world query")], np.int32)
        mask = np.ones_like(ids)
        batch = {"q_tokens": ids, "q_mask": mask,
                 "k_tokens": ids, "k_mask": mask}
        retok = make_teacher_retokenizer(st, tt, max_length=32)
        out = retok(batch)
        assert out["t_tokens"].shape == (2, 32)
        assert out["t_mask"].shape == (2, 32)
        # prompt parity with the reference template (distill.py:55-56)
        assert get_detailed_instruct(DISTILL_TASK, "x").startswith(
            "<instruct>")
        decoded = tt.decode(list(out["t_tokens"][0]),
                            skip_special_tokens=True)
        assert "hello world" in decoded
        assert "retrieve relevant passages" in decoded
        # original keys untouched
        np.testing.assert_array_equal(out["q_tokens"], ids)


@pytest.mark.slow
class TestDistillCLITeacherVocab:
    def test_e2e_with_teacher_retokenization(self, tmp_path):
        """Distill CLI with a teacher dir shipping its own (different)
        vocabulary: queries get decoded and re-tokenized with the
        instruction prompt (distill.py:395-405 path)."""
        from czechtriever_tpu.cli import distill as distill_cli
        from czechtriever_tpu.data.tokenstream import write_token_file

        svocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
            f"w{i}" for i in range(40)]
        tvocab = svocab + ["instruct", "query", "web", "search", "given",
                           "retrieve", "relevant", "passages", "that",
                           "answer", "the", "a", ",", ".", "<", ">"]
        sdir = tmp_path / "student"
        tdir = tmp_path / "teacher"
        for d, vocab, hidden in ((sdir, svocab, 32), (tdir, tvocab, 48)):
            os.makedirs(d)
            with open(d / "config.json", "w") as f:
                json.dump({"vocab_size": len(vocab), "hidden_size": hidden,
                           "num_hidden_layers": 2,
                           "num_attention_heads": 2,
                           "intermediate_size": 64,
                           "max_position_embeddings": 128}, f)
            with open(d / "vocab.txt", "w") as f:
                f.write("\n".join(vocab) + "\n")

        tokens = np.random.default_rng(0).integers(5, len(svocab), 60_000)
        tf = str(tmp_path / "tokens.bin")
        write_token_file(tokens, tf)
        out = str(tmp_path / "run")
        distill_cli.main([
            "--train_data", tf, "--output_dir", out, "--save_dir", out,
            "--queue_size", "32", "--distill_weight", "0.5",
            "--chunk_length", "8", "--target_batch_size", "8",
            "--per_device_batch_size", "1", "--total_steps", "2",
            "--log_freq", "1", "--lr", "1e-3", "--random_init",
            "--retriever_model_id", str(sdir),
            "--teacher_model_id", str(tdir),
            "--dtype", "float32", "--projection_size", "32",
        ])
        with open(os.path.join(out, "metrics.jsonl")) as f:
            recs = [json.loads(line) for line in f]
        assert any("train/distill_loss" in r for r in recs)


class TestCausalTeacher:
    """Distillation with the reference's actual teacher architecture — a
    gemma-geometry decoder LM with last-token pooling
    (/root/reference/distill.py:504-509, pooling :407)."""

    def _setup(self, w=0.5):
        from czechtriever_tpu.models import gemma
        cfg = tiny_cfg(distill_weight=w)
        mcfg = tiny_mcfg()
        tcfg = gemma.GemmaConfig.tiny(vocab_size=211)
        tx = optim.make_optimizer(cfg)
        st = statelib.create_distill_state(jax.random.key(0), cfg, mcfg,
                                           tcfg, tx)
        step_fn = jax.jit(distill.make_distill_step(cfg, mcfg, tcfg, tx))
        return cfg, mcfg, tcfg, tx, st, step_fn

    def test_step_runs_and_uses_last_token_pool(self):
        """The step's teacher embedding equals gemma.encode with
        pooling='last' on the same tokens: re-derive the aux loss."""
        from czechtriever_tpu.models import gemma
        cfg, mcfg, tcfg, tx, st, step_fn = self._setup(w=1.0)
        rng = np.random.default_rng(0)
        batch = make_batch(rng, A=1, B=4, L=12, vocab=211)
        st1, stats = step_fn(st, batch, jax.random.key(1))
        assert np.isfinite(float(stats["loss_contrastive"]))
        assert np.isfinite(float(stats["distill_loss"]))

        # independent re-derivation of the distill aux with the causal
        # teacher (EMA + key-encode order mirrors the step)
        teacher_q = gemma.encode(st.params_t, tcfg,
                                 batch["q_tokens"][0], batch["q_mask"][0],
                                 pooling_mode="last")
        srng = jax.random.fold_in(jax.random.key(1), 0)
        qr, _ = jax.random.split(jax.random.split(srng, 1)[0])
        q = encode(st.params_q, mcfg, batch["q_tokens"][0],
                   batch["q_mask"][0], dropout_rng=qr, deterministic=False,
                   pooling_mode=cfg.pooling)
        aux = losses.distill_sim_mse(q, teacher_q) * 100.0
        np.testing.assert_allclose(float(stats["distill_loss"]),
                                   float(aux), rtol=1e-4)

    def test_teacher_frozen(self):
        cfg, mcfg, tcfg, tx, st, step_fn = self._setup()
        rng = np.random.default_rng(1)
        batch = make_batch(rng, A=1, B=4, L=12, vocab=211)
        st1, _ = step_fn(st, batch, jax.random.key(2))
        for a, b in zip(jax.tree.leaves(st.params_t),
                        jax.tree.leaves(st1.params_t)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # and the student actually moved
        moved = any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(st.params_q),
                            jax.tree.leaves(st1.params_q)))
        assert moved

    def test_e2e_cli_with_gemma_teacher(self, tmp_path):
        """Full distill CLI with a gemma-family teacher dir (own vocab ->
        decode + instruction-prompt re-tokenization, distill.py:395-405)."""
        from czechtriever_tpu.cli import distill as distill_cli
        from czechtriever_tpu.data.tokenstream import write_token_file

        svocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
            f"w{i}" for i in range(40)]
        tvocab = svocab + ["instruct", "query", "web", "search", "given",
                           "retrieve", "relevant", "passages", "that",
                           "answer", "the", "a", ",", ".", "<", ">"]
        sdir = tmp_path / "student"
        tdir = tmp_path / "teacher"
        os.makedirs(sdir)
        with open(sdir / "config.json", "w") as f:
            json.dump({"vocab_size": len(svocab), "hidden_size": 32,
                       "num_hidden_layers": 2, "num_attention_heads": 2,
                       "intermediate_size": 64,
                       "max_position_embeddings": 128}, f)
        with open(sdir / "vocab.txt", "w") as f:
            f.write("\n".join(svocab) + "\n")
        os.makedirs(tdir)
        with open(tdir / "config.json", "w") as f:
            json.dump({"model_type": "gemma2",
                       "vocab_size": len(tvocab), "hidden_size": 32,
                       "num_hidden_layers": 2, "num_attention_heads": 4,
                       "num_key_value_heads": 2, "head_dim": 8,
                       "intermediate_size": 64,
                       "query_pre_attn_scalar": 8.0,
                       "sliding_window": 8,
                       "max_position_embeddings": 128}, f)
        with open(tdir / "vocab.txt", "w") as f:
            f.write("\n".join(tvocab) + "\n")

        tokens = np.random.default_rng(0).integers(5, len(svocab), 60_000)
        tf = str(tmp_path / "tokens.bin")
        write_token_file(tokens, tf)
        out = str(tmp_path / "run")
        distill_cli.main([
            "--train_data", tf, "--output_dir", out, "--save_dir", out,
            "--queue_size", "32", "--distill_weight", "0.5",
            "--chunk_length", "8", "--target_batch_size", "8",
            "--per_device_batch_size", "1", "--total_steps", "2",
            "--log_freq", "1", "--lr", "1e-3", "--random_init",
            "--retriever_model_id", str(sdir),
            "--teacher_model_id", str(tdir),
            "--dtype", "float32", "--projection_size", "32",
        ])
        with open(os.path.join(out, "metrics.jsonl")) as f:
            recs = [json.loads(line) for line in f]
        assert any("train/distill_loss" in r for r in recs)

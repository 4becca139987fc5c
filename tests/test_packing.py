"""Length-aware packing tests (data/packing.py + the packed encode path).

Ground truth is always the UNPACKED pipeline on the same crops: packing
is a pure layout change (block-diagonal attention + row-local everything
else), so per-crop outputs must match to fp-accumulation tolerance and
the MoCo loss at dropout 0 must be unchanged (the parity discipline from
docs/PERF.md round-4 pair packing, generalized to variable lengths).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from czechtriever_tpu.data import packing
from czechtriever_tpu.models import bert
from czechtriever_tpu.models.contriever import encode, encode_packed
from czechtriever_tpu.ops import attention_block as AB
from czechtriever_tpu.ops import pooling

from test_attention_block import composed_reference


class TestPacker:
    def test_partition_and_budget(self):
        rng = np.random.default_rng(0)
        lens = rng.integers(5, 21, size=37)
        blocks = packing.pack_lengths(lens, rows=48)
        flat = sorted(i for b in blocks for i in b)
        assert flat == list(range(37))  # every crop exactly once
        for b in blocks:
            assert sum(int(lens[i]) for i in b) <= 48

    def test_overlong_crop_raises(self):
        with pytest.raises(ValueError):
            packing.pack_lengths([10, 60], rows=48)

    def test_pack_sequences_layout(self):
        rng = np.random.default_rng(1)
        seqs = [rng.integers(1, 100, size=n).astype(np.int32)
                for n in rng.integers(4, 15, size=9)]
        R = 32
        tokens, seg, pos, lens = packing.pack_sequences(seqs, R, n_blocks=5)
        assert tokens.shape == seg.shape == pos.shape == (5, R)
        assert list(lens) == [len(s) for s in seqs]
        for i, s in enumerate(seqs):
            rows = np.argwhere(seg == i)
            assert len(rows) == len(s)  # every token placed exactly once
            b = {r[0] for r in rows}
            assert len(b) == 1  # a crop never spans blocks
            cols = sorted(r[1] for r in rows)
            assert cols == list(range(cols[0], cols[0] + len(s)))
            np.testing.assert_array_equal(
                tokens[rows[0][0], cols[0]:cols[0] + len(s)], s)
            np.testing.assert_array_equal(
                pos[rows[0][0], cols[0]:cols[0] + len(s)],
                np.arange(len(s)))
        assert (tokens[seg == -1] == 0).all()

    def test_quantize_blocks(self):
        assert packing.quantize_blocks(1) == 4
        assert packing.quantize_blocks(4) == 4
        assert packing.quantize_blocks(5) == 8


def _pack_qkvx(rng, crops_per_block, R, HD):
    """Build packed q/k/v/x blocks plus the per-crop slices."""
    nb = len(crops_per_block)
    packed = [np.zeros((nb, R, HD), np.float32) for _ in range(4)]
    seg = np.full((nb, R), -1, np.int32)
    crops = []  # (block, offset, arrays)
    for b, lens in enumerate(crops_per_block):
        off = 0
        for ci, n in enumerate(lens):
            arrs = [rng.normal(size=(1, n, HD)).astype(np.float32)
                    for _ in range(4)]
            for t in range(4):
                packed[t][b, off:off + n] = arrs[t][0]
            seg[b, off:off + n] = len(crops)
            crops.append((b, off, arrs))
            off += n
    return [jnp.asarray(p) for p in packed], jnp.asarray(seg), crops


class TestRebalance:
    """Opt-in cross-microbatch pair rebalance (Config.pack_rebalance)."""

    def test_assignment_is_equal_count_partition(self):
        rng = np.random.default_rng(3)
        A, B = 8, 32
        q = rng.integers(28, 131, size=A * B)
        k = rng.integers(28, 131, size=A * B)
        bins = packing.rebalance_assignment(q, k, A, B)
        assert all(len(b) == B for b in bins)
        flat = np.sort(np.concatenate(bins))
        np.testing.assert_array_equal(flat, np.arange(A * B))

    def test_need_never_worse_and_hits_sum_bound(self):
        # the recipe crop distribution (ratio U[0.1,0.5] of 256 + 2)
        rng = np.random.default_rng(0)
        A, B, R = 16, 128, 256
        lens = (rng.uniform(0.1, 0.5, (2, A, B)) * 256).astype(np.int64) + 2
        need0 = max(packing.blocks_needed(lens[s, a], R)
                    for s in range(2) for a in range(A))
        bins = packing.rebalance_assignment(
            lens[0].reshape(-1), lens[1].reshape(-1), A, B)
        flat = lens.reshape(2, A * B)
        need1 = max(packing.blocks_needed(flat[s][b], R)
                    for s in range(2) for b in bins)
        assert need1 <= need0
        # LPT should land every microbatch at (or within one block of)
        # its own sum bound
        sum_bound = max(-(-int(flat[s][b].sum()) // R)
                        for s in range(2) for b in bins)
        assert need1 <= sum_bound + 1

    def test_trainer_rebalance_preserves_pairs(self):
        """_rebalance_micros permutes every row-aligned array with ONE
        index per pair: the multiset of (q_row, k_row) pairs is exactly
        preserved, only microbatch membership changes."""
        import types
        from czechtriever_tpu.training.trainer import Trainer
        rng = np.random.default_rng(1)
        A, B, L = 4, 16, 40
        micros = []
        for a in range(A):
            q_lens = rng.integers(5, L, size=B)
            k_lens = rng.integers(5, L, size=B)
            m = {}
            for p, ln in (("q", q_lens), ("k", k_lens)):
                ids = np.zeros((B, L), np.int32)
                mask = np.zeros((B, L), np.int32)
                for j, n in enumerate(ln):
                    ids[j, :n] = rng.integers(5, 1000, size=n)
                    mask[j, :n] = 1
                m[f"{p}_tokens"] = ids
                m[f"{p}_mask"] = mask
            micros.append(m)

        def key(mb, j):
            return (mb["q_tokens"][j].tobytes(), mb["k_tokens"][j].tobytes())

        before = sorted(key(m, j) for m in micros for j in range(B))
        out = Trainer._rebalance_micros(types.SimpleNamespace(), micros)
        after = sorted(key(m, j) for m in out for j in range(B))
        assert before == after
        assert all(m["q_tokens"].shape == (B, L) for m in out)

    def test_bench_rebalanced_batch_reduces_blocks(self):
        import bench
        rng0 = np.random.default_rng(0)
        _, lens0, nb0 = bench.build_packed_batch(rng0, 128, 16, 256)
        rng1 = np.random.default_rng(0)
        _, lens1, nb1 = bench.build_packed_batch(rng1, 128, 16, 256,
                                                 rebalance=True)
        np.testing.assert_array_equal(np.sort(lens0), np.sort(lens1))
        assert nb1 < nb0  # 42 vs 44 at this seed


class TestKernelSegMode:
    def test_interpret_matches_per_crop_composed(self):
        """Packed kernel rows == the unpacked composed reference run on
        each crop alone: block-diagonal attention + row-local rest."""
        rng = np.random.default_rng(2)
        H, D = 3, 8
        HD = H * D
        (q, k, v, x), seg, crops = _pack_qkvx(
            rng, [[10, 9, 7], [12, 11]], R=32, HD=HD)
        wo = jnp.asarray(rng.normal(size=(HD, HD)) * 0.05, jnp.float32)
        bo = jnp.asarray(rng.normal(size=(HD,)) * 0.1, jnp.float32)
        scale = jnp.asarray(1.0 + 0.1 * rng.normal(size=(HD,)), jnp.float32)
        ln_bias = jnp.asarray(0.1 * rng.normal(size=(HD,)), jnp.float32)

        out = AB.attention_block_interpret(
            q, k, v, x, wo, bo, scale, ln_bias, seg, jnp.int32(0),
            n_heads=H)
        for b, off, (cq, ck, cv, cx) in crops:
            n = cq.shape[1]
            zeros_bias = jnp.zeros((1, n), jnp.float32)
            ref = composed_reference(
                jnp.asarray(cq), jnp.asarray(ck), jnp.asarray(cv),
                jnp.asarray(cx), wo, bo, scale, ln_bias, zeros_bias,
                H, 1e-12)
            np.testing.assert_allclose(
                np.asarray(out[b, off:off + n]), np.asarray(ref[0]),
                rtol=3e-4, atol=3e-4)


def _random_crops(rng, n, lo, hi, vocab):
    return [rng.integers(5, vocab, size=int(ln)).astype(np.int32)
            for ln in rng.integers(lo, hi, size=n)]


def _unpacked_batch(seqs, L):
    from czechtriever_tpu.data.collator import pad_batch
    return pad_batch(seqs, L)


class TestForwardPacked:
    def _cfg(self, **kw):
        return bert.BertConfig.tiny(**kw)

    def test_matches_per_crop_encode(self):
        cfg = self._cfg()
        rng = np.random.default_rng(3)
        params = bert.init_params(jax.random.key(0), cfg)
        seqs = _random_crops(rng, 9, 4, 17, cfg.vocab_size)
        R = 32
        tokens, seg, pos, lens = packing.pack_sequences(seqs, R)
        packed = encode_packed(params, cfg, jnp.asarray(tokens),
                               jnp.asarray(seg), jnp.asarray(pos),
                               num_segments=len(seqs), normalize=True)
        ids, mask = _unpacked_batch(seqs, 24)
        ref = encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                     normalize=True)
        np.testing.assert_allclose(np.asarray(packed), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_flash_block_interpret_matches_naive(self, monkeypatch):
        """forward_packed through the fused-kernel gate (interpret mode)
        == the XLA seg-bias path."""
        rng = np.random.default_rng(4)
        seqs = _random_crops(rng, 6, 4, 15, 1031)
        tokens, seg, pos, lens = packing.pack_sequences(seqs, 32)
        args = tuple(jnp.asarray(a) for a in (tokens, seg, pos))

        cfg_naive = self._cfg(attention_impl="naive")
        params = bert.init_params(jax.random.key(1), cfg_naive)
        ref = bert.forward_packed(params, cfg_naive, *args)

        def interp(q, k, v, x, wo, bo, scale, ln_bias, bias, seed, H,
                   attn_rate=0.0, hidden_rate=0.0, eps=1e-12,
                   deterministic=True):
            return AB.attention_block_interpret(
                q, k, v, x, wo, bo, scale, ln_bias, bias, seed,
                n_heads=H, eps=eps, deterministic=deterministic)

        monkeypatch.setattr(AB, "attention_block", interp)
        cfg_fused = self._cfg(attention_impl="flash_block")
        out = bert.forward_packed.__wrapped__(params, cfg_fused, *args)
        # compare only real-token rows; padding rows are garbage on the
        # fused path by design (pooling ignores them)
        real = np.asarray(seg) >= 0
        np.testing.assert_allclose(np.asarray(out)[real],
                                   np.asarray(ref)[real],
                                   rtol=3e-4, atol=3e-4)

    def test_segment_mean_pool_ignores_padding(self):
        h = jnp.asarray(np.arange(2 * 4 * 3, dtype=np.float32)
                        .reshape(2, 4, 3))
        seg = jnp.asarray([[0, 0, 1, -1], [2, -1, -1, -1]], jnp.int32)
        out = pooling.segment_mean_pool(h, seg, 3)
        np.testing.assert_allclose(out[0], np.asarray(h[0, :2].mean(0)))
        np.testing.assert_allclose(out[1], np.asarray(h[0, 2]))
        np.testing.assert_allclose(out[2], np.asarray(h[1, 0]))


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="compiled Pallas kernels need the real chip")
class TestOnChipSegMode:
    def test_forward_and_grads_match_naive(self):
        """Compiled fused path (seg-id mask in-kernel + custom VJP) vs
        the XLA seg-bias path: same embeddings, same parameter grads."""
        rng = np.random.default_rng(6)
        cfg_n = bert.BertConfig.tiny(attention_impl="naive")
        cfg_f = bert.BertConfig.tiny(attention_impl="flash_block")
        params = bert.init_params(jax.random.key(2), cfg_n)
        seqs = _random_crops(rng, 12, 8, 30, cfg_n.vocab_size)
        tokens, seg, pos, lens = packing.pack_sequences(seqs, 128)
        args = tuple(jnp.asarray(a) for a in (tokens, seg, pos))
        tgt = jnp.asarray(rng.normal(size=(len(seqs), cfg_n.hidden_size)),
                          jnp.float32)

        def loss(p, cfg):
            emb = encode_packed(p, cfg, *args, num_segments=len(seqs))
            return jnp.sum((emb - tgt) ** 2)

        ln, gn = jax.value_and_grad(functools.partial(loss, cfg=cfg_n))(params)
        lf, gf = jax.value_and_grad(functools.partial(loss, cfg=cfg_f))(params)
        np.testing.assert_allclose(float(lf), float(ln), rtol=1e-3)
        flat_n = jax.tree.leaves(gn)
        flat_f = jax.tree.leaves(gf)
        for a, b in zip(flat_f, flat_n):
            # same tolerance as TestOnChip.test_vjp_matches_composed:
            # the fused kernel's f32 accumulation order differs from
            # XLA's, and the sum-of-squares loss amplifies it (~0.04%
            # of elements land at rel ~0.08 with a tighter atol)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-2, atol=3e-2)


class TestDenseEncoderPacked:
    def test_packed_encode_matches_unpacked(self):
        """DenseEncoder(pack_rows=...) returns the same embeddings as
        the unpacked bucketed path (round-5 inference-MFU lever)."""
        from czechtriever_tpu.data.tokenizer import WordPieceTokenizer
        from czechtriever_tpu.evaluation.beir import DenseEncoder
        words = ("červená kočka skáče modrý pes běží rychle zelený "
                 "strom roste").split()
        vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
                 + sorted(set(words)))
        tok = WordPieceTokenizer({w: i for i, w in enumerate(vocab)})
        mcfg = bert.BertConfig.tiny(vocab_size=len(vocab))
        params = bert.init_params(jax.random.key(5), mcfg)
        rng = np.random.default_rng(6)
        texts = [" ".join(rng.choice(words, size=3 + i % 6))
                 for i in range(11)]
        enc_u = DenseEncoder(params, mcfg, tok, max_length=32)
        enc_p = DenseEncoder(params, mcfg, tok, max_length=32,
                             pack_rows=128, pack_group=4)
        eu = enc_u.encode_queries(texts, batch_size=4)
        ep = enc_p.encode_queries(texts, batch_size=4)
        assert ep.shape == eu.shape == (11, mcfg.hidden_size)
        np.testing.assert_allclose(ep, eu, rtol=2e-5, atol=2e-5)


class TestTrainerPacked:
    @pytest.mark.parametrize("rebalance", [False, True])
    def test_cli_train_with_pack_rows(self, tmp_path, rebalance):
        """End-to-end CLI train with --pack_rows: the batcher's padded
        microbatches are packed in Trainer._device_batch, the packed
        step runs, metrics and the final checkpoint land. The rebalance
        variant exercises the opt-in cross-microbatch reassignment
        (accum 8 here, so _rebalance_micros actually runs)."""
        import json
        import os

        from czechtriever_tpu.cli import train as train_cli
        from test_data import write_token_file
        tokens = np.random.default_rng(0).integers(5, 200, 60_000)
        tf = str(tmp_path / "tokens.bin")
        write_token_file(tokens, tf)
        mc = str(tmp_path / "model.json")
        with open(mc, "w") as f:
            json.dump({"vocab_size": 211, "hidden_size": 32,
                       "num_hidden_layers": 2, "num_attention_heads": 2,
                       "intermediate_size": 64,
                       "max_position_embeddings": 64}, f)
        run = str(tmp_path / "run")
        train_cli.main([
            "--train_data", tf, "--output_dir", run, "--save_dir", run,
            "--contrastive_mode", "moco", "--queue_size", "64",
            "--chunk_length", "16", "--target_batch_size", "16",
            "--per_device_batch_size", "2", "--log_freq", "1",
            "--lr", "1e-3", "--random_init", "--retriever_model_id",
            "nonexistent-tiny", "--model_config_file", mc,
            "--dtype", "float32", "--projection_size", "32",
            "--val_data_ratio", "0", "--total_steps", "3",
            "--pack_rows", "24"]
            + (["--pack_rebalance"] if rebalance else []))
        with open(os.path.join(run, "metrics.jsonl")) as f:
            rows = [json.loads(l) for l in f]
        assert any("train/loss" in r for r in rows)
        assert os.path.isdir(os.path.join(run, "checkpoint", "final",
                                          "state"))


class TestMocoPackedParity:
    def test_loss_matches_unpacked_at_dropout0(self):
        """Same crops, packed vs unpacked microbatches: identical MoCo
        loss/accuracy at dropout 0 (packing preserves batch membership)."""
        from czechtriever_tpu.config import Config
        from czechtriever_tpu.training import optim, state as statelib, steps

        mcfg = bert.BertConfig.tiny(hidden_dropout_prob=0.0,
                                    attention_probs_dropout_prob=0.0)
        cfg = Config(queue_size=64, temperature=0.05, momentum=0.999,
                     projection_size=mcfg.hidden_size, lr=1e-4,
                     warmup_steps=2, total_steps=10, scheduler="linear")
        tx = optim.make_optimizer(cfg)
        st = statelib.create_moco_state(jax.random.key(0), cfg, mcfg, tx)
        step = jax.jit(steps.make_moco_step(cfg, mcfg, tx))

        rng = np.random.default_rng(5)
        A, B, L, R = 2, 8, 24, 32
        q_seqs = [_random_crops(rng, B, 4, 17, mcfg.vocab_size)
                  for _ in range(A)]
        k_seqs = [_random_crops(rng, B, 4, 17, mcfg.vocab_size)
                  for _ in range(A)]

        def unpacked(side_seqs):
            ids = np.stack([_unpacked_batch(s, L)[0] for s in side_seqs])
            mask = np.stack([_unpacked_batch(s, L)[1] for s in side_seqs])
            return ids, mask

        qi, qm = unpacked(q_seqs)
        ki, km = unpacked(k_seqs)
        batch_u = {"q_tokens": qi, "q_mask": qm,
                   "k_tokens": ki, "k_mask": km}

        nb = max(packing.blocks_needed([len(s) for s in seqs], R)
                 for seqs in q_seqs + k_seqs)

        def packed(side_seqs, prefix):
            t, s, p, ln = zip(*[packing.pack_sequences(seqs, R, nb)
                                for seqs in side_seqs])
            return {f"{prefix}_tokens": np.stack(t),
                    f"{prefix}_seg": np.stack(s),
                    f"{prefix}_pos": np.stack(p),
                    f"{prefix}_lens": np.stack(ln)}

        batch_p = {**packed(q_seqs, "q"), **packed(k_seqs, "k")}

        key = jax.random.key(7)
        _, stats_u = step(st, jax.tree.map(jnp.asarray, batch_u), key)
        _, stats_p = step(st, jax.tree.map(jnp.asarray, batch_p), key)
        np.testing.assert_allclose(float(stats_p["loss"]),
                                   float(stats_u["loss"]),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(float(stats_p["accuracy"]),
                                   float(stats_u["accuracy"]), atol=1e-6)
        np.testing.assert_allclose(float(stats_p["stdq"]),
                                   float(stats_u["stdq"]),
                                   rtol=2e-4, atol=2e-5)

    def test_convergence_trajectory_matches_unpacked(self):
        """Same-step-count convergence check (round-5 ask #1): training
        5 optimizer steps on the same crop sequence, packed and
        unpacked runs produce the same loss trajectory at dropout 0 —
        packing changes the layout, never the optimization."""
        from czechtriever_tpu.config import Config
        from czechtriever_tpu.training import optim, state as statelib, steps

        mcfg = bert.BertConfig.tiny(hidden_dropout_prob=0.0,
                                    attention_probs_dropout_prob=0.0)
        cfg = Config(queue_size=32, temperature=0.05, momentum=0.99,
                     projection_size=mcfg.hidden_size, lr=1e-3,
                     warmup_steps=1, total_steps=10, scheduler="linear")
        tx = optim.make_optimizer(cfg)
        step = jax.jit(steps.make_moco_step(cfg, mcfg, tx))
        rng = np.random.default_rng(11)
        A, B, L, R = 1, 8, 24, 32
        st_u = statelib.create_moco_state(jax.random.key(3), cfg, mcfg, tx)
        st_p = st_u
        key = jax.random.key(9)
        losses_u, losses_p = [], []
        for it in range(5):
            qs = [_random_crops(rng, B, 4, 17, mcfg.vocab_size)]
            ks = [_random_crops(rng, B, 4, 17, mcfg.vocab_size)]
            bu = {"q_tokens": np.stack([_unpacked_batch(s, L)[0]
                                        for s in qs]),
                  "q_mask": np.stack([_unpacked_batch(s, L)[1]
                                      for s in qs]),
                  "k_tokens": np.stack([_unpacked_batch(s, L)[0]
                                        for s in ks]),
                  "k_mask": np.stack([_unpacked_batch(s, L)[1]
                                      for s in ks])}
            nb = max(packing.blocks_needed([len(s) for s in side], R)
                     for side in qs + ks)

            def pk(sides, p):
                t, s, po, ln = zip(*[packing.pack_sequences(x, R, nb)
                                     for x in sides])
                return {f"{p}_tokens": np.stack(t),
                        f"{p}_seg": np.stack(s),
                        f"{p}_pos": np.stack(po),
                        f"{p}_lens": np.stack(ln)}

            bp = {**pk(qs, "q"), **pk(ks, "k")}
            st_u, su = step(st_u, jax.tree.map(jnp.asarray, bu), key)
            st_p, sp = step(st_p, jax.tree.map(jnp.asarray, bp), key)
            losses_u.append(float(su["loss"]))
            losses_p.append(float(sp["loss"]))
        np.testing.assert_allclose(losses_p, losses_u,
                                   rtol=5e-4, atol=5e-4)

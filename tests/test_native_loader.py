"""Native C++ pair-builder tests (native/pairgen.cpp via
data/native_loader.py): structural invariants shared with the numpy path
(czechtriever_tpu/data/augment.py), determinism, distributional
equivalence of the crop law, and batcher integration."""

import numpy as np
import pytest

from czechtriever_tpu.data import native_loader
from czechtriever_tpu.data.datasets import AugmentSpec, PairBatcher
from czechtriever_tpu.data.tokenstream import TokenStream, write_token_file

pytestmark = pytest.mark.skipif(not native_loader.available(),
                                reason="native pairgen not built")


def spec(**kw):
    d = dict(ratio_min=0.2, ratio_max=0.6, augmentation="none",
             prob_augmentation=0.0, bos_token_id=2, eos_token_id=3,
             mask_id=4, vocab_size=100)
    d.update(kw)
    return AugmentSpec(**d)


def chunks(n=64, L=32, lo=5, hi=99, seed=0):
    return np.random.default_rng(seed).integers(
        lo, hi, (n, L)).astype(np.int32)


class TestStructure:
    def test_shapes_masks_and_specials(self):
        c = chunks()
        b = native_loader.build_pair_batch(c, spec(), seed=1, max_length=34)
        for key in ("q_tokens", "q_mask", "k_tokens", "k_mask"):
            assert b[key].shape == (64, 34)
        for ids, mask in ((b["q_tokens"], b["q_mask"]),
                          (b["k_tokens"], b["k_mask"])):
            lens = mask.sum(axis=1)
            # crop in [0.2, 0.6] of 32 -> 6..19 tokens + bos + eos
            assert (lens >= 2 + 6).all() and (lens <= 2 + 19 + 1).all()
            for i in range(64):
                n = lens[i]
                assert ids[i, 0] == 2           # bos
                assert ids[i, n - 1] == 3       # eos
                assert (ids[i, n:] == 0).all()  # pad
                assert (mask[i, :n] == 1).all()
                # crop body comes from the source chunk's token set
                assert set(ids[i, 1:n - 1]) <= set(c[i])

    def test_deterministic_per_seed(self):
        c = chunks()
        b1 = native_loader.build_pair_batch(c, spec(), seed=7, max_length=34)
        b2 = native_loader.build_pair_batch(c, spec(), seed=7, max_length=34)
        b3 = native_loader.build_pair_batch(c, spec(), seed=8, max_length=34)
        for key in b1:
            np.testing.assert_array_equal(b1[key], b2[key])
        assert any((b1[k] != b3[k]).any() for k in b1)

    def test_thread_count_invariant(self):
        c = chunks()
        b1 = native_loader.build_pair_batch(c, spec(), seed=5,
                                            max_length=34, num_threads=1)
        b4 = native_loader.build_pair_batch(c, spec(), seed=5,
                                            max_length=34, num_threads=4)
        for key in b1:
            np.testing.assert_array_equal(b1[key], b4[key])

    def test_q_and_k_are_independent_crops(self):
        c = chunks()
        b = native_loader.build_pair_batch(c, spec(), seed=3, max_length=34)
        assert (b["q_tokens"] != b["k_tokens"]).any()


class TestDistributions:
    def test_crop_length_law_matches_numpy(self):
        """length = int(L * U[rmin, rmax]): compare means of native vs
        numpy path over many samples."""
        from czechtriever_tpu.data import augment
        c = chunks(n=2000, L=40)
        sp = spec(ratio_min=0.3, ratio_max=0.7)
        b = native_loader.build_pair_batch(c, sp, seed=11, max_length=42)
        native_lens = b["q_mask"].sum(axis=1) - 2  # minus bos/eos
        rng = np.random.default_rng(0)
        ref_lens = [len(augment.random_crop(c[i], 0.3, 0.7, rng))
                    for i in range(2000)]
        assert abs(native_lens.mean() - np.mean(ref_lens)) < 0.5
        assert native_lens.min() >= int(40 * 0.3)
        assert native_lens.max() <= int(40 * 0.7) + 1

    def test_delete_rate(self):
        c = chunks(n=2000, L=40)
        sp = spec(ratio_min=1.0, ratio_max=1.0, augmentation="delete",
                  prob_augmentation=0.3)
        b = native_loader.build_pair_batch(c, sp, seed=13, max_length=42)
        lens = b["q_mask"].sum(axis=1) - 2
        # identity crop of 40 tokens, each kept w.p. 0.7
        assert abs(lens.mean() - 40 * 0.7) < 0.5

    def test_mask_rate(self):
        c = chunks(n=500, L=40, lo=10, hi=99)
        sp = spec(ratio_min=1.0, ratio_max=1.0, augmentation="mask",
                  prob_augmentation=0.25, mask_id=4)
        b = native_loader.build_pair_batch(c, sp, seed=17, max_length=42)
        body = b["q_tokens"][:, 1:41]
        rate = (body == 4).mean()
        assert abs(rate - 0.25) < 0.02

    def test_replace_stays_in_vocab(self):
        c = chunks(n=200, L=40, lo=10, hi=50)
        sp = spec(ratio_min=1.0, ratio_max=1.0, augmentation="replace",
                  prob_augmentation=0.5, vocab_size=60)
        b = native_loader.build_pair_batch(c, sp, seed=19, max_length=42)
        body = b["q_tokens"][:, 1:41]
        assert body.max() < 60 and body.min() >= 0

    def test_shuffle_preserves_multiset(self):
        c = chunks(n=100, L=40)
        sp = spec(ratio_min=1.0, ratio_max=1.0, augmentation="shuffle",
                  prob_augmentation=0.5)
        b = native_loader.build_pair_batch(c, sp, seed=23, max_length=42)
        body = b["q_tokens"][:, 1:41]
        for i in range(100):
            assert sorted(body[i]) == sorted(c[i])
        assert (body != c).any()  # something actually moved


class TestBatcherIntegration:
    def test_native_batcher_feeds_training_shapes(self, tmp_path):
        tokens = np.random.default_rng(0).integers(5, 200, 50_000)
        tf = str(tmp_path / "t.bin")
        write_token_file(tokens, tf)
        stream = TokenStream(tf, chunk_length=16)
        sp = spec(ratio_min=0.4, ratio_max=0.8, vocab_size=211)
        b_native = PairBatcher(stream, sp, batch_size=8, use_native=True,
                               prefetch=0)
        batches = list(b_native.epoch())
        assert len(batches) == 50_000 // 16 // 8
        for b in batches[:3]:
            assert b["q_tokens"].shape == (8, 16)  # crop-aware pad
            assert b["q_mask"].sum() > 0

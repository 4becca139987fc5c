"""Data-layer tests: token stream, augmentations, collation, datasets.

Oracles: distributional checks against the reference sampling semantics
(src/data.py:288-354, 553-652) and exactness checks on padding/masks.
"""

import numpy as np
import pytest

from czechtriever_tpu.data import augment, collator, passages
from czechtriever_tpu.data.datasets import (AugmentSpec, DistillBatcher,
                                            InMemoryDataset, MultiDataset,
                                            PairBatcher)
from czechtriever_tpu.data.tokenstream import TokenStream, write_token_file


@pytest.fixture
def token_file(tmp_path):
    rng = np.random.default_rng(0)
    tokens = rng.integers(5, 30000, size=64_000).astype(np.uint16)
    path = str(tmp_path / "tokens.bin")
    write_token_file(tokens, path)
    return path, tokens


class TestTokenStream:
    def test_file_format_is_uint16_le(self, token_file):
        path, tokens = token_file
        raw = np.fromfile(path, dtype="<u2")
        np.testing.assert_array_equal(raw, tokens)

    def test_epoch_covers_all_buffers_disjointly(self, token_file):
        path, tokens = token_file
        s = TokenStream(path, chunk_length=64, buffer_size=10, seed=1)
        chunks = list(s)
        # n_buffers * buffer_size chunks, each of length 64
        assert len(chunks) == s.n_buffers * 10
        flat = np.sort(np.concatenate([c for c in chunks]))
        ref = np.sort(tokens[: s.n_buffers * 10 * 64].astype(np.int32))
        np.testing.assert_array_equal(flat, ref)

    def test_chunks_are_contiguous_windows(self, token_file):
        path, tokens = token_file
        s = TokenStream(path, chunk_length=64, buffer_size=10, seed=2)
        tok32 = tokens.astype(np.int32)
        for c in list(s)[:20]:
            # find c in the source stream: must be a contiguous window
            # at a multiple of chunk_length + offset
            starts = np.where(tok32 == c[0])[0]
            assert any(np.array_equal(tok32[st:st + 64], c) for st in starts)

    def test_offset_shifts_windows(self, token_file):
        path, tokens = token_file
        s = TokenStream(path, chunk_length=64, buffer_size=10, seed=3)
        s.generate_offset()
        assert 0 <= s.offset < 64
        s.offset = 5
        first = next(iter(s))
        tok32 = tokens.astype(np.int32)
        starts = np.where(tok32 == first[0])[0]
        assert any((st - 5) % 64 == 0 and np.array_equal(tok32[st:st + 64], first)
                   for st in starts)

    def test_sharding_disjoint_and_complete(self, token_file):
        path, tokens = token_file
        all_first_tokens = []
        for shard in range(4):
            s = TokenStream(path, chunk_length=64, buffer_size=10, seed=7,
                            shard_id=shard, num_shards=4)
            all_first_tokens.append(np.concatenate(list(s)))
        # same seed -> same global permutation -> shards are disjoint,
        # union = full epoch
        union = np.sort(np.concatenate(all_first_tokens))
        s_full = TokenStream(path, chunk_length=64, buffer_size=10, seed=7)
        ref = np.sort(np.concatenate(list(s_full)))
        np.testing.assert_array_equal(union, ref)

    def test_sharding_small_corpus_no_empty_shards(self, token_file):
        """A corpus smaller than buffer_size * num_shards chunks must
        still feed every shard: the buffer (the striding unit) shrinks
        so each shard owns at least one. Regression for the 2-OS-process
        CLI hang (shard 1 of a 1-buffer file yielded zero batches)."""
        path, tokens = token_file
        n_chunks = len(tokens) // 64
        shards = []
        for shard in range(2):
            # nominal buffer far larger than the whole corpus
            s = TokenStream(path, chunk_length=64, buffer_size=100_000,
                            seed=7, shard_id=shard, num_shards=2)
            got = list(s)
            assert len(got) >= n_chunks // 4, (shard, len(got))
            shards.append(np.concatenate(got))
        union = np.sort(np.concatenate(shards))
        ref = np.sort(np.concatenate(list(
            TokenStream(path, chunk_length=64, buffer_size=100_000))))
        np.testing.assert_array_equal(union, ref)

    def test_total_tokens_derived_from_filesize(self, token_file):
        path, tokens = token_file
        s = TokenStream(path, chunk_length=64, buffer_size=10)
        assert s.tokens_count == len(tokens)


class TestAugment:
    def test_random_crop_length_distribution(self):
        rng = np.random.default_rng(0)
        x = np.arange(256)
        lengths = [len(augment.random_crop(x, 0.1, 0.5, rng))
                   for _ in range(2000)]
        lengths = np.array(lengths)
        assert lengths.min() >= int(256 * 0.1) - 1
        assert lengths.max() <= int(256 * 0.5)
        # mean ratio ~0.3
        assert abs(lengths.mean() / 256 - 0.3) < 0.02

    def test_crop_is_contiguous(self):
        rng = np.random.default_rng(1)
        x = np.arange(100)
        c = augment.random_crop(x, 0.2, 0.4, rng)
        np.testing.assert_array_equal(c, np.arange(c[0], c[0] + len(c)))

    def test_delete_word_rate(self):
        rng = np.random.default_rng(2)
        x = np.arange(100_000)
        out = augment.delete_word(x, 0.1, rng)
        assert abs(1 - len(out) / len(x) - 0.1) < 0.01

    def test_mask_word(self):
        rng = np.random.default_rng(3)
        x = np.arange(10_000) + 100
        out = augment.mask_word(x, mask_id=4, p=0.1, rng=rng)
        frac = (out == 4).mean()
        assert abs(frac - 0.1) < 0.02
        assert len(out) == len(x)

    def test_replace_word_bounds(self):
        rng = np.random.default_rng(4)
        x = np.full(10_000, 99999)
        out = augment.replace_word(x, 10, 20, 0.5, rng)
        changed = out[out != 99999]
        assert len(changed) > 0
        assert changed.min() >= 10 and changed.max() <= 20

    def test_shuffle_word_is_permutation(self):
        rng = np.random.default_rng(5)
        x = np.arange(1000)
        out = augment.shuffle_word(x, 0.3, rng)
        np.testing.assert_array_equal(np.sort(out), x)
        assert (out != x).any()

    def test_add_bos_eos_all_cases(self):
        x = np.array([5, 6], dtype=np.int32)
        np.testing.assert_array_equal(augment.add_bos_eos(x, 1, 2), [1, 5, 6, 2])
        np.testing.assert_array_equal(augment.add_bos_eos(x, None, 2), [5, 6, 2])
        np.testing.assert_array_equal(augment.add_bos_eos(x, 1, None), [1, 5, 6])
        np.testing.assert_array_equal(augment.add_bos_eos(x, None, None), [5, 6])


class TestCollator:
    def test_pad_batch(self):
        seqs = [np.array([1, 2, 3]), np.array([4])]
        ids, mask = collator.pad_batch(seqs, 5)
        np.testing.assert_array_equal(ids, [[1, 2, 3, 0, 0], [4, 0, 0, 0, 0]])
        np.testing.assert_array_equal(mask, [[1, 1, 1, 0, 0], [1, 0, 0, 0, 0]])

    def test_build_mask_pads_to_longest(self):
        seqs = [np.array([1, 2, 3]), np.array([4])]
        ids, mask = collator.build_mask(seqs)
        assert ids.shape == (2, 3)

    def test_pair_collator_static_shape(self):
        c = collator.PairCollator(max_length=10)
        batch = c([{"q_tokens": np.array([1, 2]), "k_tokens": np.array([3])},
                   {"q_tokens": np.array([4]), "k_tokens": np.array([5, 6, 7])}])
        assert batch["q_tokens"].shape == (2, 10)
        assert batch["k_mask"].sum() == 4


class TestBatchers:
    def _spec(self):
        return AugmentSpec(ratio_min=0.1, ratio_max=0.5, augmentation="delete",
                           prob_augmentation=0.1, bos_token_id=101,
                           eos_token_id=102)

    def test_pair_batcher_shapes_and_specials(self, token_file):
        path, _ = token_file
        s = TokenStream(path, chunk_length=64, buffer_size=10, seed=0)
        b = PairBatcher(s, self._spec(), batch_size=8, prefetch=0)
        batches = list(b.epoch())
        assert len(batches) == len(s) // 8
        for batch in batches[:3]:
            # crop-aware static pad: ratio_max=0.5 of 64 + bos/eos,
            # rounded to the 8-row sublane -> 40 (not chunk+2=66)
            assert batch["q_tokens"].shape == (8, 40)
            lens = batch["q_mask"].sum(axis=1)
            for i in range(8):
                assert batch["q_tokens"][i, 0] == 101
                assert batch["q_tokens"][i, lens[i] - 1] == 102

    def test_pair_batcher_prefetch_matches_sync(self, token_file):
        path, _ = token_file
        def make(prefetch):
            s = TokenStream(path, chunk_length=64, buffer_size=10, seed=5)
            return PairBatcher(s, self._spec(), batch_size=8, seed=5,
                               prefetch=prefetch)
        sync = list(make(0).epoch())
        pre = list(make(4).epoch())
        assert len(sync) == len(pre)
        for a, b in zip(sync, pre):
            np.testing.assert_array_equal(a["q_tokens"], b["q_tokens"])

    def test_distill_batcher(self, token_file):
        path, _ = token_file
        s = TokenStream(path, chunk_length=64, buffer_size=10, seed=0)
        b = DistillBatcher(s, self._spec(), batch_size=4)
        batch = next(b.epoch())
        assert batch["input_ids"].shape == (4, 40)
        assert (batch["input_ids"][:, 0] == 101).all()


class TestDatasets:
    def test_inmemory_dataset_pair(self):
        spec = AugmentSpec(ratio_min=0.2, ratio_max=0.4, bos_token_id=1,
                           eos_token_id=2)
        docs = [np.arange(10, 500), np.arange(600, 700)]
        ds = InMemoryDataset(docs, chunk_length=256, spec=spec, seed=0)
        item = ds[0]
        q = item["q_tokens"]
        assert q[0] == 1 and q[-1] == 2
        inner = q[1:-1]
        # crop of a window of doc0: contiguous, within range
        np.testing.assert_array_equal(inner, np.arange(inner[0], inner[0] + len(inner)))
        assert 10 <= inner[0] < 500

    def test_multidataset_mixture_probs(self):
        spec = AugmentSpec(ratio_min=0.2, ratio_max=0.4)
        d1 = InMemoryDataset([np.arange(100)] * 90, 64, spec)
        d2 = InMemoryDataset([np.arange(100, 200)] * 10, 64, spec)
        md = MultiDataset({"big": d1, "small": d2}, seed=0)
        md.set_prob(coeff=1.0)
        np.testing.assert_allclose(md.prob, [0.9, 0.1])
        md.set_prob(coeff=0.0)
        np.testing.assert_allclose(md.prob, [0.5, 0.5])
        ids = [md[0]["dataset_id"] for _ in range(300)]
        frac_big = np.mean([i == "big" for i in ids])
        assert 0.4 < frac_big < 0.6

    def test_get_passage_from_all_docs(self):
        spec = AugmentSpec(ratio_min=0.2, ratio_max=0.4, bos_token_id=1,
                           eos_token_id=2)
        ds = InMemoryDataset([np.arange(100)] * 5, 64, spec)
        ps = ds.get_passage_from_all_docs()
        assert len(ps) == 5
        assert all(p[0] == 1 and p[-1] == 2 for p in ps)


class TestPassages:
    def test_jsonl(self, tmp_path):
        p = tmp_path / "c.jsonl"
        p.write_text('{"id": "1", "text": "hello", "title": "t"}\n'
                     '{"id": "2", "text": "world", "title": "u"}\n')
        out = passages.load_passages(str(p))
        assert out[1]["text"] == "world"

    def test_dpr_tsv(self, tmp_path):
        p = tmp_path / "c.tsv"
        p.write_text("id\ttext\ttitle\n7\tsome text\tsome title\n")
        out = passages.load_passages(str(p))
        assert out == [{"id": "7", "title": "some title", "text": "some text"}]

    def test_missing_returns_none(self):
        assert passages.load_passages("/nonexistent/x.jsonl") is None

    def test_npz_shard_roundtrip(self, tmp_path):
        docs = [np.arange(5), np.arange(10, 13)]
        passages.save_preprocessed_shard(docs, str(tmp_path / "s0.npz"))
        out = passages.load_preprocessed_shards(str(tmp_path), "full")
        assert len(out) == 2
        np.testing.assert_array_equal(out[0], docs[0])
        np.testing.assert_array_equal(out[1], docs[1])

    def test_split_mode_disjoint(self, tmp_path):
        for i in range(4):
            passages.save_preprocessed_shard(
                [np.array([i])], str(tmp_path / f"s{i}.npz"))
        a = passages.load_preprocessed_shards(str(tmp_path), "split", 0, 2)
        b = passages.load_preprocessed_shards(str(tmp_path), "split", 1, 2)
        assert len(a) == 2 and len(b) == 2
        vals = sorted(int(d[0]) for d in a + b)
        assert vals == [0, 1, 2, 3]

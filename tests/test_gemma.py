"""Differential tests of the Gemma-2-geometry causal LM teacher against
``transformers.Gemma2Model`` (torch CPU) — the architecture of the
reference's distillation teacher ``BAAI/bge-multilingual-gemma2``
(/root/reference/distill.py:504-509, last-token pooling :407).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from czechtriever_tpu.models import gemma
from czechtriever_tpu.ops import pooling


@pytest.fixture(scope="module")
def tiny_pair():
    """A tiny random HF Gemma2Model and the converted jax params. The
    config keeps every wrinkle live: GQA (4 heads / 2 kv), logit
    softcapping, a sliding window (8) shorter than the test sequences so
    the even-layer windowed mask actually bites, head_dim != D/H."""
    from transformers import Gemma2Config as HFConfig, Gemma2Model

    hf_cfg = HFConfig(
        vocab_size=503, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, max_position_embeddings=128,
        rms_norm_eps=1e-6, rope_theta=10000.0,
        query_pre_attn_scalar=8.0, attn_logit_softcapping=50.0,
        sliding_window=8, attention_dropout=0.0, pad_token_id=0,
    )
    torch.manual_seed(0)
    hf_model = Gemma2Model(hf_cfg).eval()
    cfg = gemma.GemmaConfig.from_hf_dict(hf_cfg.to_dict())
    assert cfg.dtype == "bfloat16"
    cfg = gemma.GemmaConfig(**{**cfg.__dict__, "dtype": "float32"})
    params = gemma.params_from_hf_state_dict(hf_model.state_dict(), cfg)
    return hf_model, params, cfg


def _random_batch(rng, vocab, B=3, L=21):
    ids = rng.integers(5, vocab, size=(B, L))
    mask = np.ones((B, L), dtype=np.int32)
    mask[0, L - 6:] = 0  # right padding: the teacher path's real shape
    if B > 1:
        mask[1, L - 10:] = 0
    ids = ids * mask
    return ids.astype(np.int32), mask


class TestGemmaParity:
    def test_last_hidden_matches_hf(self, tiny_pair):
        hf_model, params, cfg = tiny_pair
        ids, mask = _random_batch(np.random.default_rng(0), cfg.vocab_size)

        with torch.no_grad():
            ref = hf_model(input_ids=torch.tensor(ids.astype(np.int64)),
                           attention_mask=torch.tensor(mask.astype(np.int64)))
            ref = ref.last_hidden_state.numpy()

        out = np.asarray(gemma.forward(params, cfg, jnp.array(ids),
                                       jnp.array(mask)))
        m = mask.astype(bool)
        np.testing.assert_allclose(out[m], ref[m], rtol=2e-4, atol=2e-4)

    def test_sliding_window_bites(self, tiny_pair):
        """Perturbing a token beyond every even-layer window must still
        change late positions only through the odd (full-attention)
        layers — and at L > window the windowed mask must differ from
        full causal: a pure-causal forward (window >= L) must NOT match."""
        hf_model, params, cfg = tiny_pair
        ids, mask = _random_batch(np.random.default_rng(1), cfg.vocab_size,
                                  B=1, L=24)
        out = np.asarray(gemma.forward(params, cfg, jnp.array(ids),
                                       jnp.array(mask)))
        cfg_nowin = gemma.GemmaConfig(
            **{**cfg.__dict__, "sliding_window": 1024})
        out_nowin = np.asarray(gemma.forward(params, cfg_nowin,
                                             jnp.array(ids),
                                             jnp.array(mask)))
        assert np.abs(out - out_nowin).max() > 1e-5

    def test_last_token_pool_matches_reference_math(self, tiny_pair):
        """last_token_pool parity with the reference implementation
        (distill.py:396-407): right padding -> index mask.sum-1."""
        hf_model, params, cfg = tiny_pair
        ids, mask = _random_batch(np.random.default_rng(2), cfg.vocab_size)
        emb = np.asarray(gemma.encode(params, cfg, jnp.array(ids),
                                      jnp.array(mask),
                                      pooling_mode="last"))
        h = np.asarray(gemma.forward(params, cfg, jnp.array(ids),
                                     jnp.array(mask)))
        lengths = mask.sum(axis=1) - 1
        ref = h[np.arange(h.shape[0]), lengths]
        np.testing.assert_allclose(emb, ref, rtol=1e-6, atol=1e-6)

    def test_causality(self, tiny_pair):
        """Changing a future token must not change past hidden states."""
        hf_model, params, cfg = tiny_pair
        rng = np.random.default_rng(3)
        ids, mask = _random_batch(rng, cfg.vocab_size, B=1, L=16)
        mask[:] = 1
        ids2 = ids.copy()
        ids2[0, 12] = (ids2[0, 12] + 7) % cfg.vocab_size
        h1 = np.asarray(gemma.forward(params, cfg, jnp.array(ids),
                                      jnp.array(mask)))
        h2 = np.asarray(gemma.forward(params, cfg, jnp.array(ids2),
                                      jnp.array(mask)))
        np.testing.assert_allclose(h1[0, :12], h2[0, :12],
                                   rtol=1e-5, atol=1e-6)
        assert np.abs(h1[0, 12:] - h2[0, 12:]).max() > 1e-5

    def test_hf_dir_roundtrip(self, tiny_pair, tmp_path):
        """load_hf_dir reads a saved HF checkpoint directory."""
        hf_model, params, cfg = tiny_pair
        hf_model.save_pretrained(tmp_path)
        params2, cfg2 = gemma.load_hf_dir(str(tmp_path))
        assert cfg2.num_key_value_heads == cfg.num_key_value_heads
        assert cfg2.query_pre_attn_scalar == cfg.query_pre_attn_scalar
        a = jax.tree.leaves(params)
        b = jax.tree.leaves(params2)
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-6, atol=1e-6)


class TestRealCheckpointLayouts:
    """Interop rehearsal against the layouts a REAL teacher download
    ships (VERDICT r2 next #6): a true bge-multilingual-gemma2 is 42
    layers stored as multiple bf16 safetensors shards plus
    model.safetensors.index.json — none of which the happy-path
    single-file f32 roundtrip above exercises."""

    @pytest.fixture(scope="class")
    def deep_pair(self):
        from transformers import Gemma2Config as HFConfig, Gemma2Model

        hf_cfg = HFConfig(
            vocab_size=128, hidden_size=16, intermediate_size=32,
            num_hidden_layers=42, num_attention_heads=2,
            num_key_value_heads=1, head_dim=8,
            max_position_embeddings=64, query_pre_attn_scalar=8.0,
            attn_logit_softcapping=50.0, sliding_window=8,
            attention_dropout=0.0, pad_token_id=0)
        torch.manual_seed(1)
        hf_model = Gemma2Model(hf_cfg).eval()
        cfg = gemma.GemmaConfig.from_hf_dict(hf_cfg.to_dict())
        cfg = gemma.GemmaConfig(**{**cfg.__dict__, "dtype": "float32"})
        oracle = gemma.params_from_hf_state_dict(hf_model.state_dict(), cfg)
        return hf_model, oracle, cfg

    def _assert_matches(self, params, oracle, atol):
        a, b = jax.tree.leaves(oracle), jax.tree.leaves(params)
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=0, atol=atol)

    def test_sharded_fp16_safetensors(self, deep_pair, tmp_path):
        """42 layers, fp16 storage, >=2 safetensors shards + index json
        (transformers' own sharding writer, so the layout is exactly
        what a hub download produces)."""
        import copy

        hf_model, oracle, cfg = deep_pair
        d = tmp_path / "fp16_sharded"
        copy.deepcopy(hf_model).half().save_pretrained(
            d, max_shard_size="100KB")
        shards = [f for f in d.iterdir() if f.suffix == ".safetensors"]
        assert len(shards) >= 2, "checkpoint did not shard; shrink limit"
        assert (d / "model.safetensors.index.json").exists()

        params, cfg2 = gemma.load_hf_dir(str(d))
        assert cfg2.num_hidden_layers == 42
        # fp16 has a 10-bit mantissa; init weights are ~N(0, 0.02)
        self._assert_matches(params, oracle, atol=2e-4)

    def test_bf16_safetensors(self, deep_pair, tmp_path):
        """bf16 storage dtype (the real teacher's) — numpy cannot even
        represent it, so the loader must route through torch."""
        import copy

        import torch as _torch

        hf_model, oracle, cfg = deep_pair
        d = tmp_path / "bf16"
        copy.deepcopy(hf_model).to(_torch.bfloat16).save_pretrained(d)
        params, _ = gemma.load_hf_dir(str(d))
        self._assert_matches(params, oracle, atol=2e-3)  # 8-bit mantissa

    def test_sharded_torch_bin(self, deep_pair, tmp_path):
        """Legacy layout: pytorch_model-0000x-of-0000N.bin + index."""
        hf_model, oracle, cfg = deep_pair
        d = tmp_path / "bin_sharded"
        hf_model.save_pretrained(d, max_shard_size="100KB",
                                 safe_serialization=False)
        bins = [f for f in d.iterdir() if f.suffix == ".bin"]
        assert len(bins) >= 2
        params, _ = gemma.load_hf_dir(str(d))
        self._assert_matches(params, oracle, atol=0)

"""Golden parity tests of the functional BERT encoder against
HuggingFace ``transformers.BertModel`` (torch CPU), which is the exact
encoder the reference wraps (/root/reference/src/contriever.py:11-55).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from czechtriever_tpu.models import bert, contriever, hf_interop


@pytest.fixture(scope="module")
def tiny_pair():
    """A tiny random HF BertModel and the converted jax params."""
    from transformers import BertConfig as HFBertConfig, BertModel

    hf_cfg = HFBertConfig(
        vocab_size=1031, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=128, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf_model = BertModel(hf_cfg, add_pooling_layer=False).eval()
    cfg = bert.BertConfig.from_hf_dict(hf_cfg.to_dict())
    cfg = bert.BertConfig(**{**cfg.__dict__, "dtype": "float32"})
    params = hf_interop.params_from_state_dict(hf_model.state_dict(), cfg)
    return hf_model, params, cfg


def _random_batch(rng, vocab, B=3, L=17):
    ids = rng.integers(5, vocab, size=(B, L))
    mask = np.ones((B, L), dtype=np.int32)
    # ragged padding
    mask[0, 12:] = 0
    mask[1, 9:] = 0
    ids = ids * mask
    return ids.astype(np.int32), mask


class TestGoldenParity:
    def test_last_hidden_matches_hf(self, tiny_pair):
        hf_model, params, cfg = tiny_pair
        ids, mask = _random_batch(np.random.default_rng(0), cfg.vocab_size)

        with torch.no_grad():
            ref = hf_model(input_ids=torch.tensor(ids.astype(np.int64)),
                           attention_mask=torch.tensor(mask.astype(np.int64)))
            ref = ref.last_hidden_state.numpy()

        out = np.asarray(bert.forward(params, cfg, jnp.array(ids),
                                      jnp.array(mask)))
        # compare only non-pad positions (pad rows differ: HF lets pads
        # attend, both get masked at pooling anyway)
        m = mask.astype(bool)
        np.testing.assert_allclose(out[m], ref[m], rtol=1e-4, atol=1e-4)

    def test_encode_matches_reference_pipeline(self, tiny_pair):
        """encode() == HF forward + masked_fill + mean pool + normalize
        (src/contriever.py:45-55)."""
        hf_model, params, cfg = tiny_pair
        ids, mask = _random_batch(np.random.default_rng(1), cfg.vocab_size)

        with torch.no_grad():
            h = hf_model(input_ids=torch.tensor(ids.astype(np.int64)),
                         attention_mask=torch.tensor(mask.astype(np.int64)))
            h = h.last_hidden_state
            tm = torch.tensor(mask)
            h = h.masked_fill(~tm[..., None].bool(), 0.0)
            ref = h.sum(dim=1) / tm.sum(dim=1)[..., None]
            ref_norm = torch.nn.functional.normalize(ref, dim=-1).numpy()

        out = np.asarray(contriever.encode(
            params, cfg, jnp.array(ids), jnp.array(mask),
            pooling_mode="average", normalize=True))
        np.testing.assert_allclose(out, ref_norm, rtol=1e-4, atol=1e-4)

    def test_cls_pooling(self, tiny_pair):
        hf_model, params, cfg = tiny_pair
        ids, mask = _random_batch(np.random.default_rng(2), cfg.vocab_size)
        with torch.no_grad():
            ref = hf_model(input_ids=torch.tensor(ids.astype(np.int64)),
                           attention_mask=torch.tensor(mask.astype(np.int64)))
            ref = ref.last_hidden_state[:, 0].numpy()
        out = np.asarray(contriever.encode(
            params, cfg, jnp.array(ids), jnp.array(mask), pooling_mode="cls"))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_state_dict_roundtrip(self, tiny_pair):
        hf_model, params, cfg = tiny_pair
        sd = hf_interop.params_to_state_dict(params)
        params2 = hf_interop.params_from_state_dict(sd, cfg)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_save_load_hf_dir(self, tiny_pair, tmp_path):
        _, params, cfg = tiny_pair
        hf_interop.save_hf_dir(params, cfg, str(tmp_path / "m"))
        params2, cfg2 = hf_interop.load_hf_dir(str(tmp_path / "m"))
        assert cfg2.hidden_size == cfg.hidden_size
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


class TestForwardProperties:
    def test_remat_matches(self, tiny_pair):
        _, params, cfg = tiny_pair
        ids, mask = _random_batch(np.random.default_rng(3), cfg.vocab_size)
        a = bert.forward(params, cfg, jnp.array(ids), jnp.array(mask), remat=False)
        b = bert.forward(params, cfg, jnp.array(ids), jnp.array(mask), remat=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)

    def test_dropout_determinism_flag(self, tiny_pair):
        _, params, cfg = tiny_pair
        cfg_drop = bert.BertConfig(**{**cfg.__dict__,
                                      "hidden_dropout_prob": 0.5,
                                      "attention_probs_dropout_prob": 0.5})
        ids, mask = _random_batch(np.random.default_rng(4), cfg.vocab_size)
        r = jax.random.key(0)
        a = bert.forward(params, cfg_drop, jnp.array(ids), jnp.array(mask),
                         dropout_rng=r, deterministic=False)
        b = bert.forward(params, cfg_drop, jnp.array(ids), jnp.array(mask),
                         dropout_rng=r, deterministic=False)
        c = bert.forward(params, cfg_drop, jnp.array(ids), jnp.array(mask),
                         dropout_rng=jax.random.key(1), deterministic=False)
        det = bert.forward(params, cfg_drop, jnp.array(ids), jnp.array(mask),
                           deterministic=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-6
        assert np.abs(np.asarray(a) - np.asarray(det)).max() > 1e-6

    def test_python_layer_loop_matches_scan(self, tiny_pair):
        """scan_layers=False (plain loop, no scan-stacked residuals)
        must be numerically identical to the scan, including the
        per-layer dropout rng fold_in and gradients."""
        _, params, cfg = tiny_pair
        cfg_loop = bert.BertConfig(**{**cfg.__dict__,
                                      "scan_layers": False})
        ids, mask = _random_batch(np.random.default_rng(5), cfg.vocab_size)
        a = bert.forward(params, cfg, jnp.array(ids), jnp.array(mask))
        b = bert.forward(params, cfg_loop, jnp.array(ids), jnp.array(mask))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)

        # dropout path: same rng -> same mask sequence in both modes
        cfg_d = bert.BertConfig(**{**cfg.__dict__,
                                   "hidden_dropout_prob": 0.5})
        cfg_ld = bert.BertConfig(**{**cfg_d.__dict__, "scan_layers": False})
        r = jax.random.key(3)
        da = bert.forward(params, cfg_d, jnp.array(ids), jnp.array(mask),
                          dropout_rng=r, deterministic=False)
        db = bert.forward(params, cfg_ld, jnp.array(ids), jnp.array(mask),
                          dropout_rng=r, deterministic=False)
        np.testing.assert_allclose(np.asarray(da), np.asarray(db),
                                   rtol=1e-6, atol=1e-6)

        def loss(p, c):
            return bert.forward(p, c, jnp.array(ids),
                                jnp.array(mask)).sum()

        ga = jax.grad(lambda p: loss(p, cfg))(params)
        gb = jax.grad(lambda p: loss(p, cfg_loop))(params)
        for ka, (la, lb) in zip(
                jax.tree_util.tree_leaves_with_path(ga),
                zip(jax.tree.leaves(ga), jax.tree.leaves(gb))):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=1e-5, atol=1e-5,
                                       err_msg=str(ka[0]))

    def test_random_init_runs(self):
        cfg = bert.BertConfig.tiny()
        params = bert.init_params(jax.random.key(0), cfg)
        ids = jnp.ones((2, 9), jnp.int32)
        mask = jnp.ones((2, 9), jnp.int32)
        out = bert.forward(params, cfg, ids, mask)
        assert out.shape == (2, 9, cfg.hidden_size)
        assert np.isfinite(np.asarray(out)).all()


class TestXLMRobertaParity:
    """The reference's XLMRetriever wraps XLMRobertaModel
    (src/contriever.py:58-100); our encoder covers it with
    position_style='roberta' (mask-cumsum position ids offset by the pad
    id) and the shared layer stack."""

    @pytest.fixture(scope="class")
    def xlmr_pair(self):
        from transformers import XLMRobertaConfig, XLMRobertaModel

        hf_cfg = XLMRobertaConfig(
            vocab_size=509, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
            max_position_embeddings=130, type_vocab_size=1,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            pad_token_id=1,
        )
        torch.manual_seed(1)
        hf_model = XLMRobertaModel(hf_cfg, add_pooling_layer=False).eval()
        cfg = bert.BertConfig.from_hf_dict(hf_cfg.to_dict())
        cfg = bert.BertConfig(**{**cfg.__dict__, "dtype": "float32"})
        params = hf_interop.params_from_state_dict(hf_model.state_dict(),
                                                   cfg)
        return hf_model, params, cfg

    def test_config_detects_roberta(self, xlmr_pair):
        _, _, cfg = xlmr_pair
        assert cfg.position_style == "roberta"
        assert cfg.pad_token_id == 1

    def test_last_hidden_matches_hf(self, xlmr_pair):
        hf_model, params, cfg = xlmr_pair
        ids, mask = _random_batch(np.random.default_rng(5), cfg.vocab_size)
        ids = np.where(mask.astype(bool), ids, cfg.pad_token_id)
        with torch.no_grad():
            ref = hf_model(
                input_ids=torch.tensor(ids.astype(np.int64)),
                attention_mask=torch.tensor(mask.astype(np.int64)))
            ref = ref.last_hidden_state.numpy()
        out = np.asarray(bert.forward(params, cfg, jnp.array(ids),
                                      jnp.array(mask)))
        m = mask.astype(bool)
        np.testing.assert_allclose(out[m], ref[m], rtol=1e-4, atol=1e-4)

    def test_mean_pool_encode_matches(self, xlmr_pair):
        hf_model, params, cfg = xlmr_pair
        ids, mask = _random_batch(np.random.default_rng(6), cfg.vocab_size)
        ids = np.where(mask.astype(bool), ids, cfg.pad_token_id)
        with torch.no_grad():
            h = hf_model(
                input_ids=torch.tensor(ids.astype(np.int64)),
                attention_mask=torch.tensor(mask.astype(np.int64))
            ).last_hidden_state
            tm = torch.tensor(mask)
            h = h.masked_fill(~tm[..., None].bool(), 0.0)
            ref = (h.sum(dim=1) / tm.sum(dim=1)[..., None]).numpy()
        out = np.asarray(contriever.encode(
            params, cfg, jnp.array(ids), jnp.array(mask),
            pooling_mode="average"))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


class TestRematPolicies:
    @pytest.mark.slow  # >15s on the CPU backend
    def test_grads_match_across_remat_modes(self):
        """remat=False / True / 'dots' change memory, never numbers."""
        cfg = bert.BertConfig.tiny()
        params = bert.init_params(jax.random.key(0), cfg)
        ids = jnp.asarray(np.random.default_rng(0).integers(
            5, cfg.vocab_size, (4, 12)), jnp.int32)
        mask = jnp.ones_like(ids)

        def loss(p, remat):
            return bert.forward(p, cfg, ids, mask, remat=remat).sum()

        g_none = jax.grad(lambda p: loss(p, False))(params)
        g_full = jax.grad(lambda p: loss(p, True))(params)
        g_dots = jax.grad(lambda p: loss(p, "dots"))(params)
        for a, b, c in zip(jax.tree.leaves(g_none), jax.tree.leaves(g_full),
                           jax.tree.leaves(g_dots)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=1e-5, atol=1e-6)


class TestRealCheckpointLayouts:
    """hf_interop.load_hf_dir against real download layouts (VERDICT r2
    next #6): sharded safetensors + index json and fp16 storage — the
    happy-path roundtrip above only covers single-file f32."""

    def test_sharded_fp16_safetensors(self, tiny_pair, tmp_path):
        import copy

        hf_model, params, cfg = tiny_pair
        d = tmp_path / "fp16_sharded"
        copy.deepcopy(hf_model).half().save_pretrained(
            d, max_shard_size="50KB")
        shards = [f for f in d.iterdir() if f.suffix == ".safetensors"]
        assert len(shards) >= 2, "checkpoint did not shard; shrink limit"
        assert (d / "model.safetensors.index.json").exists()

        params2, cfg2 = hf_interop.load_hf_dir(str(d))
        assert cfg2.hidden_size == cfg.hidden_size
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=2e-3)

    def test_bf16_safetensors(self, tiny_pair, tmp_path):
        import copy

        hf_model, params, cfg = tiny_pair
        d = tmp_path / "bf16"
        copy.deepcopy(hf_model).to(torch.bfloat16).save_pretrained(d)
        params2, _ = hf_interop.load_hf_dir(str(d))
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=2e-2)

    def test_no_torch_safetensors_reader_matches_torch(self, tmp_path):
        """The torch-free reader (jax-only deployment envs) must decode
        f32/f16/bf16 tensors bitwise-identically to safetensors.torch."""
        from safetensors.torch import load_file, save_file

        g = torch.Generator().manual_seed(0)
        tensors = {
            "w32": torch.randn(7, 5, generator=g),
            "w16": torch.randn(3, 11, generator=g).half(),
            "wbf": torch.randn(4, 6, generator=g).to(torch.bfloat16),
            "ids": torch.arange(12, dtype=torch.int64).reshape(3, 4),
        }
        path = str(tmp_path / "mixed.safetensors")
        save_file(tensors, path)

        via_torch = {k: hf_interop._to_numpy(v)
                     for k, v in load_file(path).items()}
        no_torch = {k: hf_interop._to_numpy(v) for k, v in
                    hf_interop._load_safetensors_no_torch(path).items()}
        assert via_torch.keys() == no_torch.keys()
        for k in via_torch:
            assert via_torch[k].dtype == no_torch[k].dtype, k
            np.testing.assert_array_equal(via_torch[k], no_torch[k],
                                          err_msg=k)

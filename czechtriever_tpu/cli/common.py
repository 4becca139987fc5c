"""Shared CLI plumbing: model/tokenizer resolution.

Mirrors the reference's loader conventions (src/moco.py:226-252,
src/contriever.py:104-159): 'czert' resolves to a local ``models/czert``
HF directory; any local HF directory loads config+weights+tokenizer;
otherwise a randomly initialized BERT-base-shaped encoder is built (no
network access exists here, so hub ids without local copies are an
error unless --random_init).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Optional, Tuple

import jax

from czechtriever_tpu.config import Config
from czechtriever_tpu.data.tokenizer import WordPieceTokenizer, load_tokenizer
from czechtriever_tpu.models import bert, hf_interop

logger = logging.getLogger(__name__)


def resolve_model_dir(model_id: str) -> Optional[str]:
    if os.path.isdir(model_id) and os.path.exists(
            os.path.join(model_id, "config.json")):
        return model_id
    if "czert" in model_id and os.path.isdir("models/czert"):
        return "models/czert"
    return None


def resolve_model(cfg: Config, dtype: Optional[str] = None
                  ) -> Tuple[Optional[bert.Params], bert.BertConfig, object]:
    """-> (params or None if random init requested, model config,
    tokenizer or None)."""
    dtype = dtype or cfg.dtype
    # every CLI resolves its model through here — switch on the
    # persistent XLA compilation cache so eval/retrieve tools stop
    # paying ~30-60 s per shape per RUN over the tunnel (bench.py and
    # the Trainer already did; the eval CLIs measured 2x wall on cold
    # compiles alone)
    from czechtriever_tpu.config import (enable_compilation_cache,
                                         resolve_scan_layers)
    enable_compilation_cache(getattr(cfg, "compilation_cache_dir", None))
    model_dir = resolve_model_dir(cfg.retriever_model_id)
    tokenizer = None
    if model_dir is not None:
        with open(os.path.join(model_dir, "config.json")) as f:
            mcfg = bert.BertConfig.from_hf_dict(json.load(f))
        mcfg = bert.BertConfig(**{**mcfg.__dict__, "dtype": dtype,
                                  "hidden_dropout_prob": cfg.dropout,
                                  "attention_probs_dropout_prob": cfg.dropout,
                                  "attention_impl": cfg.attention_impl,
                                  "ffn_impl": cfg.ffn_impl,
                                  "scan_layers": resolve_scan_layers(
                                      cfg.scan_layers,
                                      mcfg.num_hidden_layers)})
        try:
            tokenizer = load_tokenizer(model_dir)
        except Exception:
            vt = os.path.join(model_dir, "vocab.txt")
            if os.path.exists(vt):
                tokenizer = WordPieceTokenizer.from_vocab_file(vt)
        if cfg.random_init:
            params = None
        else:
            try:
                params, _ = hf_interop.load_hf_dir(model_dir)
            except FileNotFoundError:
                logger.warning("no weight file in %s; using random init",
                               model_dir)
                params = None
        return params, mcfg, tokenizer

    if cfg.model_config_file:
        with open(cfg.model_config_file) as f:
            mcfg = bert.BertConfig.from_hf_dict(json.load(f))
        mcfg = bert.BertConfig(**{**mcfg.__dict__, "dtype": dtype,
                                  "hidden_dropout_prob": cfg.dropout,
                                  "attention_probs_dropout_prob": cfg.dropout,
                                  "attention_impl": cfg.attention_impl,
                                  "ffn_impl": cfg.ffn_impl,
                                  "scan_layers": resolve_scan_layers(
                                      cfg.scan_layers,
                                      mcfg.num_hidden_layers)})
        return None, mcfg, None

    logger.warning("model id %r not found locally; using random-init "
                   "BERT-base geometry", cfg.retriever_model_id)
    base_layers = bert.BertConfig().num_hidden_layers
    mcfg = bert.BertConfig(dtype=dtype, hidden_dropout_prob=cfg.dropout,
                           attention_probs_dropout_prob=cfg.dropout,
                           attention_impl=cfg.attention_impl,
                           ffn_impl=cfg.ffn_impl,
                           scan_layers=resolve_scan_layers(
                               cfg.scan_layers, base_layers))
    return None, mcfg, None


def init_or_load_params(cfg: Config, mcfg: bert.BertConfig, params):
    if params is None:
        params = bert.init_params(jax.random.key(cfg.seed), mcfg)
    return params

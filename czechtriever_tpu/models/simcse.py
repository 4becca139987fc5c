"""SimCSE baseline encoder (reference src/simcse.py).

The reference wraps ``Seznam/simcse-small-e-czech`` and CLS-pools the
last hidden state (simcse.py:40-41); it exists purely as a throughput /
quality baseline next to the contriever models. Here it is the same
functional BERT core with CLS pooling and no normalization, loaded from
a local HF directory.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from czechtriever_tpu.models import bert, hf_interop
from czechtriever_tpu.models.contriever import encode

logger = logging.getLogger(__name__)

DEFAULT_MODEL_ID = "Seznam/simcse-small-e-czech"  # simcse.py:10


class SimCSEEncoder:
    """CLS-pooled sentence encoder (simcse.py:13-41)."""

    def __init__(self, params: bert.Params, mcfg: bert.BertConfig):
        self.params = params
        self.mcfg = mcfg

    def __call__(self, input_ids, attention_mask,
                 token_type_ids=None, normalize: bool = False):
        # the reference's ``normalize`` kwarg is accepted but unused
        # upstream; CLS pooling only (simcse.py:25,40)
        del normalize
        return encode(self.params, self.mcfg, input_ids, attention_mask,
                      token_type_ids=token_type_ids, pooling_mode="cls",
                      deterministic=True)


def load_simcse(model_dir: Optional[str] = None, seed: int = 0
                ) -> Tuple[SimCSEEncoder, object, str]:
    """(encoder, tokenizer, model_id) — load_simcse parity
    (simcse.py:44-47). Looks for a local HF dir; hub ids without local
    copies fall back to a random-init electra-small-shaped encoder
    (no network in this environment)."""
    from czechtriever_tpu.data.tokenizer import load_tokenizer

    name = model_dir or DEFAULT_MODEL_ID
    tokenizer = None
    if os.path.isdir(name) and os.path.exists(
            os.path.join(name, "config.json")):
        with open(os.path.join(name, "config.json")) as f:
            d = json.load(f)
        if d.get("embedding_size", d.get("hidden_size")) != d.get(
                "hidden_size"):
            raise ValueError(
                "electra-style embedding projection (embedding_size != "
                "hidden_size) is not supported by the BERT core")
        mcfg = bert.BertConfig.from_hf_dict(d)
        try:
            params, _ = hf_interop.load_hf_dir(name)
        except FileNotFoundError:
            params = bert.init_params(jax.random.key(seed), mcfg)
        try:
            tokenizer = load_tokenizer(name)
        except Exception:
            pass
    else:
        logger.warning("%s not found locally; random-init electra-small "
                       "geometry", name)
        # electra-small-e-czech geometry: 12 layers, hidden 256
        mcfg = bert.BertConfig(vocab_size=30522, hidden_size=256,
                               num_hidden_layers=12, num_attention_heads=4,
                               intermediate_size=1024)
        params = bert.init_params(jax.random.key(seed), mcfg)
    return SimCSEEncoder(params, mcfg), tokenizer, name

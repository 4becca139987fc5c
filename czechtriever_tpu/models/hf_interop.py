"""HuggingFace BERT weight interop.

Converts between HF ``BertModel`` state dicts (torch tensors or numpy) and
our stacked-layer param pytree (models/bert.py). This replaces the
reference's reliance on ``transformers`` for weight loading
(/root/reference/src/contriever.py:104-166, src/utils.py:268-276): Czert /
mBERT checkpoints import directly into the TPU encoder, and trained
encoders export back to an HF-loadable state dict.

Also implements the reference's checkpoint prefix-stripping semantics
(src/contriever.py:128-144): MoCo checkpoints prefix weights with
``encoder_q.``, InBatch with ``encoder.``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import numpy as np

from czechtriever_tpu.models.bert import BertConfig, Params

# (hf prefixless name, needs transpose) for the non-layer tensors
_EMB_MAP = {
    "embeddings.word_embeddings.weight": ("embeddings", "word"),
    "embeddings.position_embeddings.weight": ("embeddings", "position"),
    "embeddings.token_type_embeddings.weight": ("embeddings", "token_type"),
    "embeddings.LayerNorm.weight": ("embeddings", "ln", "scale"),
    "embeddings.LayerNorm.bias": ("embeddings", "ln", "bias"),
}

# per-layer: our key -> (hf suffix, transpose)
_LAYER_MAP = {
    "q_kernel": ("attention.self.query.weight", True),
    "q_bias": ("attention.self.query.bias", False),
    "k_kernel": ("attention.self.key.weight", True),
    "k_bias": ("attention.self.key.bias", False),
    "v_kernel": ("attention.self.value.weight", True),
    "v_bias": ("attention.self.value.bias", False),
    "attn_out_kernel": ("attention.output.dense.weight", True),
    "attn_out_bias": ("attention.output.dense.bias", False),
    ("attn_ln", "scale"): ("attention.output.LayerNorm.weight", False),
    ("attn_ln", "bias"): ("attention.output.LayerNorm.bias", False),
    "ffn_in_kernel": ("intermediate.dense.weight", True),
    "ffn_in_bias": ("intermediate.dense.bias", False),
    "ffn_out_kernel": ("output.dense.weight", True),
    "ffn_out_bias": ("output.dense.bias", False),
    ("ffn_ln", "scale"): ("output.LayerNorm.weight", False),
    ("ffn_ln", "bias"): ("output.LayerNorm.bias", False),
}


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        if t.dtype.name == "bfloat16":  # ml_dtypes, from the no-torch reader
            return t.astype(np.float32)
        return t
    # torch tensor without importing torch at module scope
    if hasattr(t, "detach"):
        t = t.detach().cpu()
        if str(t.dtype) == "torch.bfloat16":  # numpy has no bfloat16
            t = t.float()
        return t.numpy()
    return np.asarray(t)


def _load_safetensors_no_torch(path: str) -> Dict[str, np.ndarray]:
    """Torch-free safetensors reader (jax-only deployment envs).

    The format is an 8-byte LE header length, a JSON header of
    {name: {dtype, shape, data_offsets}}, then raw little-endian tensor
    bytes. bf16 decodes via ml_dtypes (which jax ships); fp16/fp32 map
    straight to numpy. Upcasting to f32 is left to ``_to_numpy`` so the
    two loaders return identical dtypes.

    The data section is memory-mapped, not read into RAM: multi-GB
    shards (the 4-shard bf16 gemma2 case) would otherwise double peak
    host memory vs the mmap-based safetensors loader. Returned arrays
    are read-only views into the map; every downstream consumer
    upcasts/copies before mutation."""
    import ml_dtypes
    dtypes = {"F64": np.float64, "F32": np.float32, "F16": np.float16,
              "BF16": ml_dtypes.bfloat16, "I64": np.int64,
              "I32": np.int32, "I16": np.int16, "I8": np.int8,
              "U8": np.uint8, "U16": np.uint16, "U32": np.uint32,
              "U64": np.uint64,
              "F8_E4M3": getattr(ml_dtypes, "float8_e4m3fn", None),
              "F8_E5M2": getattr(ml_dtypes, "float8_e5m2", None),
              "BOOL": np.bool_}
    with open(path, "rb") as f:
        hlen = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(hlen))
    data = np.memmap(path, dtype=np.uint8, mode="r", offset=8 + hlen)
    out: Dict[str, np.ndarray] = {}
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        dt = dtypes.get(meta["dtype"])
        if dt is None:
            raise ValueError(f"unsupported safetensors dtype "
                             f"{meta['dtype']!r} for tensor {name!r}")
        dt = np.dtype(dt)
        start, end = meta["data_offsets"]
        count = int(np.prod(meta["shape"], dtype=np.int64))
        if end - start != count * dt.itemsize:
            raise ValueError(
                f"corrupt safetensors header: tensor {name!r} spans "
                f"{end - start} bytes but shape {meta['shape']} x "
                f"{meta['dtype']} needs {count * dt.itemsize}")
        out[name] = data[start:end].view(dt).reshape(meta["shape"])
    return out


def load_hf_state_dict(model_dir: str) -> Dict[str, np.ndarray]:
    """Load weights from a local HF checkpoint directory in any layout a
    real download ships: single-file or sharded safetensors
    (``model-0000X-of-0000N.safetensors`` + ``model.safetensors.index.json``)
    or torch ``pytorch_model*.bin`` (+ index), any storage dtype
    (fp32/fp16/bf16 — a real bge-multilingual-gemma2 is 4 bf16 shards,
    Czert is fp32 single-file). Returns {name: numpy}, bf16 upcast to
    f32 since numpy has no bfloat16. Local-first, never hits the hub
    (reference contract /root/reference/src/utils.py:268-276)."""
    files = None
    for idx_name in ("model.safetensors.index.json",
                     "pytorch_model.bin.index.json"):
        idx_path = os.path.join(model_dir, idx_name)
        if os.path.exists(idx_path):
            with open(idx_path) as f:
                files = sorted(set(json.load(f)["weight_map"].values()))
            break
    if files is None:
        names = os.listdir(model_dir)
        files = sorted(n for n in names if n.endswith(".safetensors"))
        if not files:
            files = sorted(n for n in names if n.startswith("pytorch_model")
                           and n.endswith(".bin"))
    if not files:
        raise FileNotFoundError(f"no weight files in {model_dir}")

    sd: Dict[str, np.ndarray] = {}
    for name in files:
        path = os.path.join(model_dir, name)
        if name.endswith(".safetensors"):
            try:
                # the torch loader handles every storage dtype incl.
                # bf16 (safetensors.numpy raises on bf16 tensors)
                from safetensors.torch import load_file
                shard = load_file(path)
            except ImportError:
                # torch-free deployment envs: read the format directly
                shard = _load_safetensors_no_torch(path)
        else:
            import torch
            shard = torch.load(path, map_location="cpu", weights_only=True)
        sd.update({k: _to_numpy(v) for k, v in shard.items()})
    return sd


def strip_prefix(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Strip MoCo/InBatch wrapper prefixes (src/contriever.py:128-144)."""
    if any("encoder_q." in k for k in state_dict):
        return {k.replace("encoder_q.", ""): v for k, v in state_dict.items()
                if "encoder_q." in k}
    if any("encoder." in k and not k.startswith("encoder.layer") for k in state_dict):
        sd = {k.replace("encoder.", "", 1): v for k, v in state_dict.items()
              if k.startswith("encoder.")}
        if sd:
            return sd
    return state_dict


def params_from_state_dict(state_dict: Dict[str, Any],
                           cfg: BertConfig) -> Params:
    """HF BertModel state dict -> stacked param pytree. Ignores the pooler
    (the reference uses add_pooling_layer=False, src/contriever.py:13)."""
    sd = {k.removeprefix("bert.").removeprefix("roberta."): _to_numpy(v)
          for k, v in state_dict.items()}
    L = cfg.num_hidden_layers

    params: Dict[str, Any] = {"embeddings": {"ln": {}}, "layers": {}}
    for hf_name, path in _EMB_MAP.items():
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = sd[hf_name].astype(np.float32)
    # position table may be longer than our max_position_embeddings
    params["embeddings"]["position"] = (
        params["embeddings"]["position"][: cfg.max_position_embeddings])

    for our_key, (suffix, transpose) in _LAYER_MAP.items():
        per_layer = []
        for i in range(L):
            w = sd[f"encoder.layer.{i}.{suffix}"].astype(np.float32)
            per_layer.append(w.T if transpose else w)
        stacked = np.stack(per_layer, axis=0)
        if isinstance(our_key, tuple):
            params["layers"].setdefault(our_key[0], {})[our_key[1]] = stacked
        else:
            params["layers"][our_key] = stacked
    return params


def params_to_state_dict(params: Params) -> Dict[str, np.ndarray]:
    """Stacked param pytree -> HF BertModel state dict (numpy)."""
    import jax

    params = jax.tree.map(lambda x: np.asarray(x, dtype=np.float32), params)
    sd: Dict[str, np.ndarray] = {}
    for hf_name, path in _EMB_MAP.items():
        node = params
        for p in path:
            node = node[p]
        sd[hf_name] = node
    layers = params["layers"]
    L = layers["q_kernel"].shape[0]
    for our_key, (suffix, transpose) in _LAYER_MAP.items():
        stacked = (layers[our_key[0]][our_key[1]]
                   if isinstance(our_key, tuple) else layers[our_key])
        for i in range(L):
            w = stacked[i]
            sd[f"encoder.layer.{i}.{suffix}"] = w.T.copy() if transpose else w
    return sd


def load_hf_dir(model_dir: str) -> Tuple[Params, BertConfig]:
    """Load an HF-format local model directory (config.json + weights).

    Local-first semantics matching src/utils.py:268-276 — no network access
    is attempted.
    """
    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = BertConfig.from_hf_dict(json.load(f))

    sd = load_hf_state_dict(model_dir)
    return params_from_state_dict(strip_prefix(sd), cfg), cfg


def save_hf_dir(params: Params, cfg: BertConfig, out_dir: str) -> None:
    """Export to an HF-loadable directory (config.json + safetensors),
    parity with save_contriever (src/contriever.py:162-166)."""
    os.makedirs(out_dir, exist_ok=True)
    hf_cfg = {
        "architectures": ["BertModel"], "model_type": "bert",
        "vocab_size": cfg.vocab_size, "hidden_size": cfg.hidden_size,
        "num_hidden_layers": cfg.num_hidden_layers,
        "num_attention_heads": cfg.num_attention_heads,
        "intermediate_size": cfg.intermediate_size,
        "max_position_embeddings": cfg.max_position_embeddings,
        "type_vocab_size": cfg.type_vocab_size,
        "layer_norm_eps": cfg.layer_norm_eps,
        "hidden_dropout_prob": cfg.hidden_dropout_prob,
        "attention_probs_dropout_prob": cfg.attention_probs_dropout_prob,
        "hidden_act": "gelu", "pad_token_id": cfg.pad_token_id,
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)
    sd = params_to_state_dict(params)
    try:
        from safetensors.numpy import save_file
        save_file(sd, os.path.join(out_dir, "model.safetensors"))
    except ImportError:
        import torch
        torch.save({k: torch.from_numpy(v) for k, v in sd.items()},
                   os.path.join(out_dir, "pytorch_model.bin"))

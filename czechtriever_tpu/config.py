"""Typed configuration for czechtriever-tpu.

TPU-native replacement for the reference's single argparse Namespace
(/root/reference/src/options.py:9-266). Instead of threading an untyped
Namespace through every constructor, we use one frozen-ish dataclass that is

  * constructible from CLI args with ``Config.from_args()`` (parse_known_args
    semantics, matching src/options.py:264),
  * JSON round-trippable so it rides along in checkpoints (the reference
    pickles the Namespace into checkpoint.pth, src/utils.py:67),
  * hashable-by-value where needed for jit static args.

Flag names and defaults mirror the reference one-to-one so recipes written
for the reference (README.md:36-62) port directly.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
from dataclasses import dataclass, field
from typing import List, Optional


# scan_layers="auto" crossover: the Python layer loop compiles each
# layer's HLO separately (compile time ~ depth; the 12-layer flagship
# measured ~3x the scan's uncached compile, docs/PERF.md round-7) but
# steps ~6-9% faster. Up to this depth the one-time compile cost —
# amortized further by the persistent XLA cache — is worth the
# steady-state win; past it (e.g. the 42-layer gemma teacher) scan wins.
SCAN_AUTO_MAX_LAYERS = 16


def resolve_scan_layers(value, num_hidden_layers: int) -> bool:
    """Resolve the tri-state scan_layers config ("auto"/True/False) to a
    concrete bool for a model of the given depth. Logs the auto choice."""
    if isinstance(value, str) and value.lower() == "auto":
        use_scan = num_hidden_layers > SCAN_AUTO_MAX_LAYERS
        import logging
        logging.getLogger(__name__).info(
            "scan_layers=auto -> %s (%d layers %s %d-layer crossover)",
            "lax.scan" if use_scan else "python loop", num_hidden_layers,
            ">" if use_scan else "<=", SCAN_AUTO_MAX_LAYERS)
        return use_scan
    if isinstance(value, str):
        raise ValueError(f"scan_layers must be 'auto', true, or false; "
                         f"got {value!r}")
    return bool(value)


def enable_compilation_cache(cache_dir: str) -> None:
    """Point jax's persistent XLA compilation cache at ``cache_dir``
    (no-op for empty/None or if jax already has one configured). Safe to
    call before or after backend init; lazily imports jax so plain
    config parsing stays jax-free."""
    if not cache_dir:
        return
    import jax
    if jax.config.jax_compilation_cache_dir:
        return
    path = os.path.expanduser(cache_dir)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache even fast compiles: over a tunneled backend everything
        # is worth caching
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # unwritable cache dir must never kill a run
        pass


@dataclass
class Config:
    # --- basic / IO (src/options.py:18-89) ---
    output_dir: str = "./checkpoint/my_experiments"
    save_dir: str = "./checkpoint/my_experiments"
    train_data: List[str] = field(default_factory=list)
    offsets_file: Optional[str] = None
    cumsums_file: str = "data/line-offsets.pkl"
    valid_data: List[str] = field(default_factory=list)
    val_data_ratio: float = 0.05
    eval_data: List[str] = field(default_factory=list)
    eval_datasets: List[str] = field(default_factory=list)
    eval_datasets_dir: str = "./"
    orig_sampling: bool = False
    model_path: str = "none"
    continue_training: bool = False
    num_workers: int = 5
    num_workers_valid: int = 1

    # --- data (src/options.py:91-110) ---
    chunk_length: int = 256
    loading_mode: str = "split"
    data_preprocessed: bool = False
    lower_case: bool = False
    normalize_text: bool = False
    sampling_coefficient: float = 0.0
    augmentation: str = "none"
    prob_augmentation: float = 0.0
    # total token count of the binary stream; None = derive from file size.
    # (replaces the hard-coded 71,493,853,087 at src/data.py:296)
    total_tokens: Optional[int] = None

    # --- model (src/options.py:112-139) ---
    dropout: float = 0.1
    # encoder attention path: "auto" (flash kernel on TPU, XLA naive
    # elsewhere), "flash", "naive", or "flash_block" (fused MHA +
    # out-proj + dropout + residual + LN kernel, ops/attention_block.py
    # — fastest measured train config on v5e, see docs/PERF.md)
    attention_impl: str = "auto"
    # "fused" runs the FFN half as the fused ffn_block kernel — the
    # default: it is inert unless the layer runs the fused attention
    # block (explicit attention_impl="flash_block", or packed batches
    # auto-routed there on TPU), and there it measured +5% train step
    # (docs/PERF.md). fp accumulation order and dropout streams differ
    # from the XLA FFN (same caveat class as packing — see the README
    # numerics note); "xla" restores the old path
    ffn_impl: str = "fused"
    # encoder layer iteration: "auto" (default) resolves per model depth
    # via resolve_scan_layers — the Python loop for shallow encoders
    # (each layer's saved activations stay standalone buffers instead of
    # being scan-stacked via dynamic-update-slice: measured +9.4%
    # full-256 / +6.6% recipe-shape step throughput on v5e, docs/PERF.md)
    # and lax.scan (O(1) compile time in depth) for deep ones, where the
    # loop's depth-proportional compile would dominate one-shot runs.
    # True forces scan, False forces the loop.
    scan_layers: object = "auto"
    rho: float = 0.05  # SAM neighborhood size (finetuning.py:75-80)
    contrastive_mode: str = "moco"
    queue_size: int = 65536
    # storage dtype of the MoCo negative queue. The queue holds
    # L2-normalized key embeddings (activation data, not master
    # weights): bf16 halves the [queue_size, 768] ring buffer's HBM
    # footprint and lets the l_neg logits matmul run at bf16 MXU rate
    # (the reference keeps a f32 torch buffer, src/moco.py:218-221 —
    # pass --queue_dtype float32 for strict parity)
    queue_dtype: str = "bfloat16"
    temperature: float = 1.0
    momentum: float = 0.999
    distill_weight: float = 0.5
    # True (default): the MoCo key encoder runs with dropout ON during
    # training. The reference's argparse default is False, but its
    # eval() branch is dead during training — encoder_k is in train
    # mode, so ``if not self.encoder_k.training and not
    # self.moco_train_mode_encoder_k`` (src/moco.py:316-317) never
    # fires and keys are ALWAYS encoded with dropout. Our default
    # preserves that actual behavior; ``--no-moco_train_mode_encoder_k``
    # gives what the flag intends: a deterministic (eval-mode) key
    # encoder. Threaded through steps.make_moco_step + distill.
    moco_train_mode_encoder_k: bool = True
    eval_normalize_text: bool = False
    norm_query: bool = False
    norm_doc: bool = False
    projection_size: int = 768
    ratio_min: float = 0.1
    ratio_max: float = 0.5
    score_function: str = "dot"
    retriever_model_id: str = "czert"
    teacher_model_id: str = "facebook/contriever"
    translator_model_id: str = "Helsinki-NLP/opus-mt-cs-en"
    pooling: str = "average"
    random_init: bool = False
    # explicit architecture override: path to an HF-style BertConfig json
    # (used when retriever_model_id has no local weights directory)
    model_config_file: Optional[str] = None

    # --- batching (src/options.py:142-162) ---
    target_batch_size: int = 2048
    per_device_batch_size: int = 64  # reference: per_gpu_batch_size
    per_device_eval_batch_size: int = 256  # reference: per_gpu_eval_batch_size
    total_steps: int = 1000
    warmup_steps: int = -1

    # --- distributed (src/options.py:164-184) ---
    main_port: int = 10001
    seed: int = 0
    # TPU mesh shape: data-parallel x model-parallel. model axis > 1 enables
    # tensor parallelism over the encoder (a capability the reference lacks).
    mesh_data: int = -1  # -1 = all devices on the data axis
    mesh_model: int = 1

    # --- optimization (src/options.py:186-239) ---
    optim: str = "adamw"
    scheduler: str = "linear"
    lr: float = 1e-4
    lr_min_ratio: float = 0.0
    weight_decay_from_init: bool = False
    weight_decay: float = 0.01
    beta1: float = 0.9
    beta2: float = 0.98
    eps: float = 1e-6
    clip_gradients: bool = False
    max_grad_norm: Optional[float] = None
    max_grad_value: Optional[float] = None
    log_freq: int = 100
    eval_freq: int = 1000
    save_freq: int = 50000
    # per-parameter gradient-norm logging (reference train.py:295-309)
    log_param_grad_norms: bool = False
    # hoist the MoCo EMA out of the microbatch scan: one momentum^A
    # update per optimizer step (final key params identical; microbatch
    # keys deviate by <= accum*(1-momentum), ~0.4% at the reference
    # recipe). Off = exact reference semantics.
    ema_every_step: bool = False
    maxload: Optional[int] = None
    label_smoothing: float = 0.0

    # --- finetuning (src/options.py:242-244) ---
    negative_ctxs: int = 1
    negative_hard_min_idx: int = 0
    negative_hard_ratio: float = 0.0

    # --- TPU-specific knobs (new; no reference equivalent) ---
    # strict-parity preset: one flag that pins every numerics knob whose
    # TPU-tuned default deviates from the reference, so a user
    # reproducing the reference recipe doesn't have to know the list:
    #   queue_dtype   -> float32   (reference keeps an f32 torch buffer,
    #                               src/moco.py:218-221)
    #   ema_every_step -> False    (per-microbatch EMA, src/moco.py:260-269)
    #   ffn_impl       -> "xla"    (the fused FFN block changes fp
    #                               accumulation order/dropout streams)
    #   pack_rows      -> 0        (length packing likewise)
    # The encoder activation (erf vs tanh gelu) already follows the
    # checkpoint's config.json; the attention kernel choice is
    # numerics-equivalent to fp tolerance (pinned by tests). Applied in
    # __post_init__, overriding explicit conflicting flags.
    parity: bool = False
    dtype: str = "bfloat16"  # compute dtype on the MXU
    param_dtype: str = "float32"
    # rematerialization over encoder layers: False, True (full
    # jax.checkpoint), or "dots" (save matmul outputs, recompute
    # elementwise only — the default sweet spot on v5e)
    remat: object = False
    donate_state: bool = True
    # length-aware packing (data/packing.py): > 0 packs each
    # microbatch's variable-length crops into row blocks of this many
    # tokens before device transfer — at the recipe crop distribution
    # (mean ~80 real tokens vs the 136-column static pad) this turns
    # the ~40% padding FLOPs into throughput (bench.py --workload
    # packed). 0 = off (the unpacked static-bucket pipeline). Packing
    # keeps batch membership, so the loss at dropout 0 is unchanged;
    # fp accumulation order and dropout streams differ (see README
    # numerics note). Rows must be a multiple of 8; lane-multiple
    # (128/256/384/512) recommended
    pack_rows: int = 0
    # opt-in cross-microbatch pair rebalance under pack_rows: LPT-
    # reassigns each step's (q, k) pairs across its microbatches so the
    # rectangular [A, nb, R] stack packs at the per-micro sum bound
    # (measured nb 44 -> 42, density 0.886 -> 0.928 at B=128/R=256)
    # instead of the worst single packing. Unlike plain packing this
    # CHANGES batch membership — which keys share a microbatch, hence
    # the MoCo queue's within-step enqueue order (epsilon at queue
    # 131k) — so it defaults off; the accumulated gradient at dropout 0
    # remains a mean over the identical pair multiset
    pack_rebalance: bool = False
    # overlap checkpoint commits with training: the step loop pays only
    # the device->host snapshot (~7 s on the tunneled chip); orbax's
    # background thread does the ~21 s file commit and `latest` flips
    # only once the commit is confirmed (utils/checkpoint.py). The
    # reference's torch.save blocks identically, so False is parity and
    # True is the TPU-first beat
    async_save: bool = True
    # run the host->device batch transfer one optimizer step ahead in a
    # background thread (Trainer.fit): overlaps H2D + dispatch latency
    # with device compute — the 362-vs-526 pairs/s e2e gap on the
    # tunneled v5e was host serialization, not transfer volume
    device_prefetch: bool = True
    # dropout/init PRNG: 'rbg' drives the TPU hardware RNG and is
    # partitionable under GSPMD; 'threefry2x32' is jax's (slow) default —
    # per-fwd dropout mask generation alone costs ~30ms at B=128,L=256
    prng_impl: str = "rbg"
    # jax.profiler trace of steps [profile_start_step, +profile_steps)
    # written here; empty = profiling off (SURVEY.md §5.1)
    # persistent XLA compilation cache: first compile of the full train
    # step over a tunneled/remote TPU runs 5-10 min; with the cache a
    # process restart (SLURM requeue, crash-resume, chunked runs)
    # re-loads it in seconds. Empty string disables.
    compilation_cache_dir: str = "~/.cache/czechtriever_tpu/xla"
    profile_dir: str = ""
    profile_start_step: int = 10
    profile_steps: int = 3

    # ------------------------------------------------------------------
    def __post_init__(self):
        if self.warmup_steps is not None and self.warmup_steps < 0:
            # reference leaves -1; schedule code treats <=0 as no warmup
            pass
        if self.parity:
            self.queue_dtype = "float32"
            self.ema_every_step = False
            # fp-accumulation-order deviations (model quality identical,
            # loss curves not bit-reproducible vs reference numerics)
            self.ffn_impl = "xla"
            self.pack_rows = 0

    # Alias kept so code written against reference flag names still reads.
    @property
    def per_gpu_batch_size(self) -> int:
        return self.per_device_batch_size

    @property
    def per_gpu_eval_batch_size(self) -> int:
        return self.per_device_eval_batch_size

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    # --- (de)serialization -------------------------------------------------
    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    @classmethod
    def from_json(cls, s: str) -> "Config":
        return cls.from_dict(json.loads(s))

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path) as f:
            return cls.from_json(f.read())

    # --- CLI ---------------------------------------------------------------
    @classmethod
    def build_parser(cls) -> argparse.ArgumentParser:
        p = argparse.ArgumentParser(
            formatter_class=argparse.ArgumentDefaultsHelpFormatter
        )
        for f in dataclasses.fields(cls):
            name = "--" + f.name
            if f.default_factory is not dataclasses.MISSING:  # type: ignore[misc]
                p.add_argument(name, nargs="+", default=f.default_factory())
                continue
            if f.name in ("remat", "scan_layers"):  # bool-or-string tri-state
                def _tri(v):
                    return {"false": False, "none": False, "true": True,
                            "full": True}.get(v.lower(), v)
                p.add_argument(name, type=_tri, default=f.default)
                continue
            if f.type in ("bool", bool):
                # BooleanOptionalAction adds --<flag>/--no-<flag>, so
                # default-True flags (e.g. donate_state) stay disableable
                p.add_argument(name, action=argparse.BooleanOptionalAction,
                               default=f.default)
            elif f.default is None:
                # Optional[int]/Optional[float]/Optional[str]
                typ = float if "float" in str(f.type) else (
                    int if "int" in str(f.type) else str
                )
                p.add_argument(name, type=typ, default=None)
            else:
                p.add_argument(name, type=type(f.default), default=f.default)
        # reference-compat aliases
        p.add_argument("--per_gpu_batch_size", type=int, default=None)
        p.add_argument("--per_gpu_eval_batch_size", type=int, default=None)
        return p

    @classmethod
    def from_args(cls, argv: Optional[List[str]] = None) -> "Config":
        opt, _unknown = cls.build_parser().parse_known_args(argv)
        d = vars(opt)
        alias_b = d.pop("per_gpu_batch_size", None)
        alias_e = d.pop("per_gpu_eval_batch_size", None)
        cfg = cls.from_dict(d)
        if alias_b is not None:
            cfg = cfg.replace(per_device_batch_size=alias_b)
        if alias_e is not None:
            cfg = cfg.replace(per_device_eval_batch_size=alias_e)
        # --output_dir without --save_dir: checkpoints follow the output
        # dir. Both flags exist for reference parity (src/options.py:
        # 16-29, same "./checkpoint/my_experiments" default), but leaving
        # save_dir at the default while redirecting output_dir would make
        # the trainer silently RESUME from whatever unrelated experiment
        # last wrote ./checkpoint/my_experiments/checkpoint/latest.
        # Explicitness is detected from argv so a deliberate
        # "--save_dir <the default>" is honored.
        given = argv if argv is not None else sys.argv[1:]
        save_dir_given = any(a == "--save_dir"
                             or a.startswith("--save_dir=") for a in given)
        default_dir = Config.__dataclass_fields__["save_dir"].default
        if (not save_dir_given and cfg.save_dir == default_dir
                and cfg.output_dir != default_dir):
            cfg = cfg.replace(save_dir=cfg.output_dir)
        enable_compilation_cache(cfg.compilation_cache_dir)
        return cfg

    def print_options(self, parser: Optional[argparse.ArgumentParser] = None) -> str:
        """Human-readable dump with [default: x] annotations, written to
        <output_dir>/opt.txt (parity with src/options.py:246-261)."""
        defaults = Config()
        lines = []
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            dv = getattr(defaults, f.name)
            comment = "" if v == dv else f"\t[default: {dv}]"
            lines.append(f"{f.name:>40}: {str(v):<40}{comment}")
        message = "\n".join(lines) + "\n"
        os.makedirs(os.path.join(self.output_dir, "models"), exist_ok=True)
        with open(os.path.join(self.output_dir, "opt.txt"), "w") as f:
            f.write(message + "\n")
        return message

"""Headline benchmark: MoCo contrastive train-step throughput on the
flagship (Czert-base / BERT-base) encoder — the reference's hot loop
(/root/reference/train.py:256-327: two BERT forwards + backward + queue
matmul + EMA + AdamW per pair).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md): vs_baseline is the
ratio against REFERENCE_SAMPLES_PER_S below — the reference recipe's
effective rate needed to finish its published training plan (500k steps x
2048 global batch on one GPU, README.md:36-62) in the 14-day SGE
wall-clock the example cluster script requests
(example_scripts/czechtriever.sh), i.e. ~846 pairs/s. That is the honest
"reference machinery on its own hardware budget" yardstick until a
measured number exists.

WORKLOAD SHAPE. The recipe's training pairs are random crops of ratio
0.1-0.5 from 256-token chunks (README.md:53-59, src/options.py:91-110),
and the reference pads each batch to its longest member
(src/data.py:563-573) — so the hot loop the 846 pairs/s yardstick refers
to processes sequences of at most int(0.5*256) + bos/eos = 130 tokens,
never 256. The default ``--workload recipe`` therefore measures at
seq=136 (130 rounded to the 8-row sublane, exactly the static shape the
training pipeline emits at this recipe — data/datasets.py
_crop_max_length). ``--workload full`` measures the strictly harder
full-256 shape; both numbers are printed to stderr every run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REFERENCE_SAMPLES_PER_S = 846.0  # 500k * 2048 / (14 * 86400)


V5E_PEAK_FLOPS = 197e12  # bf16 peak of one v5e chip


def model_flops_per_pair(mcfg, seq: int, queue_size: int,
                         remat) -> float:
    """FLOPs per contrastive pair for the MFU estimate: q fwd+bwd
    (x3, +1 recompute under remat) + k fwd (x1) over the non-embedding
    matmuls and attention, plus the queue logits matmul fwd+bwd."""
    D, F, L = (mcfg.hidden_size, mcfg.intermediate_size,
               mcfg.num_hidden_layers)
    per_layer_mm = 2 * (4 * D * D + 2 * D * F)       # qkvo + ffn, fwd
    attn_mm = 2 * 2 * seq * D                        # QK^T + PV, fwd/token
    fwd_per_token = L * (per_layer_mm + attn_mm)
    # full remat recomputes the fwd matmuls in bwd; 'dots' recomputes
    # only elementwise, so its matmul FLOPs match no-remat
    passes = (4 if remat in (True, "full") else 3) + 1
    # the queue is stop-gradient: only the l_neg forward and the dq
    # grad matmul exist — 2 passes, not 3 (there is no d(queue))
    queue_mm = 2 * 2 * mcfg.hidden_size * queue_size
    return passes * fwd_per_token * seq + queue_mm


def recipe_lengths(rng, shape, chunk: int = 256, ratio_min: float = 0.1,
                   ratio_max: float = 0.5, n_special: int = 2):
    """Sample real crop lengths from the reference recipe's crop
    distribution: ratio ~ U(0.1, 0.5) of a 256-token chunk plus bos/eos
    (src/options.py:109-110, src/data.py add_bos_eos)."""
    ratio = rng.uniform(ratio_min, ratio_max, shape)
    return (ratio * chunk).astype(np.int64) + n_special


def packed_flops_per_pair(mcfg, lengths, queue_size: int, remat) -> float:
    """Useful FLOPs per pair for the packed workload's MFU: the same
    accounting as model_flops_per_pair but summed over the REAL crop
    lengths (the packed step spends no FLOPs on inter-crop padding
    except block-tail slack, which is excluded here — MFU counts only
    useful work, so slack shows up as lost MFU, as it should)."""
    D, F, L = (mcfg.hidden_size, mcfg.intermediate_size,
               mcfg.num_hidden_layers)
    per_layer_mm = 2 * (4 * D * D + 2 * D * F)
    passes = (4 if remat in (True, "full") else 3) + 1
    ell = np.asarray(lengths, np.float64)
    # per crop: passes * L * (per_layer_mm * ell + 4 * D * ell^2).
    # `passes` already lumps the pair's q side (3 passes) and k side
    # (1 pass) exactly like model_flops_per_pair, and `lengths` pools
    # both sides' iid crop lengths — so FLOPs per PAIR is the plain
    # mean, NOT 2x it
    per_crop = passes * L * (per_layer_mm * ell + 4 * D * ell ** 2)
    queue_mm = 2 * 2 * mcfg.hidden_size * queue_size
    return float(per_crop.mean()) + queue_mm


def build_packed_batch(rng, batch: int, accum: int, rows: int,
                       rebalance: bool = False):
    """Synthetic packed microbatches at the recipe crop distribution.

    Returns the packed batch dict ([A, nb, R] arrays + [A, N] lengths)
    and the flat length samples for the MFU accounting. nb is the max
    FFD block count over all 2A microbatch packings, quantized so a real
    trainer would see few distinct shapes. ``rebalance`` applies the
    opt-in cross-microbatch pair reassignment (Config.pack_rebalance,
    data/packing.py rebalance_assignment) the trainer would."""
    from czechtriever_tpu.data import packing
    lens = recipe_lengths(rng, (2, accum, batch))
    flat_lens = lens.reshape(2, accum * batch)
    # flat generation in (side, a, b) order keeps the rng stream — and
    # therefore the non-rebalanced batch — bit-identical across modes
    seqs_flat = [[rng.integers(5, 30000, size=int(n)).astype(np.int32)
                  for n in flat_lens[side]] for side in range(2)]
    if rebalance:
        bins = packing.rebalance_assignment(
            flat_lens[0], flat_lens[1], accum, batch)
    else:
        bins = [np.arange(a * batch, (a + 1) * batch) for a in range(accum)]
    packs = {}
    nb_needed = 0
    for side in range(2):
        for a in range(accum):
            seqs = [seqs_flat[side][int(i)] for i in bins[a]]
            packs[(side, a)] = seqs
            nb_needed = max(nb_needed, packing.blocks_needed(
                [len(s) for s in seqs], rows))
    # quantum 2: measured IDENTICAL to quantum 4 at this distribution
    # (the block count is set by the max-need microbatch, 43-44 at
    # B=128/R=256, not by the quantum; density 0.886 either way). The
    # residual ~11% slack is cross-microbatch variance — all A
    # microbatches stack to the worst packing's nb. Strict batch-
    # membership parity forbids fixing it (rebalancing changes which
    # keys share a microbatch and the MoCo queue order), which is why
    # --pack_rebalance is opt-in: LPT reassignment lands every
    # microbatch at the sum bound (nb 44 -> 42, density 0.928).
    nb = packing.quantize_blocks(nb_needed, 2)
    out = {}
    for prefix, side in (("q", 0), ("k", 1)):
        t, s, p, ln = zip(*[packing.pack_sequences(packs[(side, a)], rows, nb)
                            for a in range(accum)])
        out[f"{prefix}_tokens"] = np.stack(t)
        out[f"{prefix}_seg"] = np.stack(s)
        out[f"{prefix}_pos"] = np.stack(p)
        out[f"{prefix}_lens"] = np.stack(ln)
    return out, lens.reshape(-1), nb


def build(batch: int, accum: int, seq: int, queue_size: int, remat,
          attention_impl: str = "auto", hidden_act: str = "gelu_tanh",
          unroll: int = 1, ema_every_step: bool = False,
          ffn_impl: str = "xla", scan_layers: bool = True,
          dropout: float = 0.1, pack_pairs: bool = True,
          pack_rows: int = 0, queue_dtype: str = "bfloat16",
          pack_rebalance: bool = False):
    import jax
    import jax.numpy as jnp
    from czechtriever_tpu.config import Config, enable_compilation_cache
    enable_compilation_cache("~/.cache/czechtriever_tpu/xla")
    from czechtriever_tpu.models import bert
    from czechtriever_tpu.parallel import mesh as meshlib
    from czechtriever_tpu.training import optim, state as statelib, steps

    # gelu_tanh: the erf gelu costs ~11ms/fwd on v5e for identical
    # model quality; the exact form stays available via --gelu gelu
    mcfg = bert.BertConfig(vocab_size=30522, hidden_size=768,
                           num_hidden_layers=12, num_attention_heads=12,
                           intermediate_size=3072,
                           max_position_embeddings=512, dtype="bfloat16",
                           attention_impl=attention_impl,
                           hidden_act=hidden_act, scan_unroll=unroll,
                           ffn_impl=ffn_impl, scan_layers=scan_layers,
                           hidden_dropout_prob=dropout,
                           attention_probs_dropout_prob=dropout,
                           attention_pack_pairs=pack_pairs)
    remat_arg = {"none": False, "full": True, "dots": "dots"}.get(
        remat, remat)
    cfg = Config(queue_size=queue_size, temperature=0.05, momentum=0.9995,
                 projection_size=768, lr=1e-5, warmup_steps=20000,
                 total_steps=500000, scheduler="linear",
                 clip_gradients=False, remat=remat_arg,
                 ema_every_step=ema_every_step, queue_dtype=queue_dtype)
    mesh = meshlib.make_mesh()
    tx = optim.make_optimizer(cfg)
    st = statelib.create_moco_state(jax.random.key(0), cfg, mcfg, tx)
    st = meshlib.replicate(mesh, st)

    rng = np.random.default_rng(0)
    lens = None
    if pack_rows:
        b, lens, nb = build_packed_batch(rng, batch, accum, pack_rows,
                                         rebalance=pack_rebalance)
        print(f"packed: rows={pack_rows} blocks={nb} "
              f"density={lens.sum() / (2 * accum * nb * pack_rows):.3f} "
              f"mean_len={lens.mean():.1f}", file=sys.stderr)
    else:
        ids = rng.integers(5, mcfg.vocab_size,
                           (2, accum, batch, seq)).astype(np.int32)
        mask = np.ones((accum, batch, seq), np.int32)
        b = {"q_tokens": ids[0], "q_mask": mask,
             "k_tokens": ids[1], "k_mask": mask}
    b = meshlib.shard_microbatches(mesh, b)

    step_fn = jax.jit(steps.make_moco_step(cfg, mcfg, tx), donate_argnums=0)
    return step_fn, st, b, cfg, lens


def run(batch: int, accum: int, seq: int, queue_size: int, steps_n: int,
        remat, attention_impl: str = "auto",
        hidden_act: str = "gelu_tanh", unroll: int = 1,
        ema_every_step: bool = False, ffn_impl: str = "xla",
        scan_layers: bool = True, dropout: float = 0.1,
        pack_pairs: bool = True, pack_rows: int = 0,
        queue_dtype: str = "bfloat16", pack_rebalance: bool = False):
    import jax
    step_fn, st, b, cfg, lens = build(batch, accum, seq, queue_size, remat,
                                      attention_impl, hidden_act, unroll,
                                      ema_every_step, ffn_impl, scan_layers,
                                      dropout, pack_pairs, pack_rows,
                                      queue_dtype, pack_rebalance)
    rng = jax.random.key(1, impl=cfg.prng_impl)
    # warmup + compile. NOTE: under the axon TPU tunnel,
    # block_until_ready does not actually wait for remote execution —
    # a scalar readback is the only reliable sync, so we fetch the loss
    # (which transitively depends on the whole step chain).
    for _ in range(3):
        st, stats = step_fn(st, b, rng)
    float(stats["loss"])
    t0 = time.perf_counter()
    for _ in range(steps_n):
        st, stats = step_fn(st, b, rng)
    loss = float(stats["loss"])
    dt = time.perf_counter() - t0
    # CZT_ATTN_NO_SOFTMAX is a timing-only kernel A/B with intentionally
    # wrong numerics (ops/attention_block.py) — loss may be non-finite
    if os.environ.get("CZT_ATTN_NO_SOFTMAX") != "1":
        assert np.isfinite(loss), f"non-finite loss {loss}"
    pairs = batch * accum * steps_n
    return pairs / dt, dt / steps_n, loss, lens


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--accum", type=int, default=16)
    # round-4 re-sweep with both fused block kernels: B=128 x accum 16
    # (the reference's exact 2048 global batch) 555.3 pairs/s > B=128 x 4
    # 551.6 > B=64 x 8 543.2 > B=32 x 16 526.3; B=256 OOMs to the dots
    # ladder and loses. Larger microbatches amortize per-program kernel
    # dispatch + the stacked-save DUS traffic per pair
    p.add_argument("--workload", default="both",
                   choices=("both", "packed", "recipe", "full"))
    # packed: the recipe crop distribution through the length-packed
    # pipeline (data/packing.py) — the shape the training pipeline
    # actually runs with pack_rows > 0; recipe: the fixed 136-column
    # unpacked bucket (what the pipeline emits with packing off);
    # full: all-256
    p.add_argument("--pack_rows", type=int, default=256,
                   help="row budget per packed block (the packed "
                        "workload's R); 0 disables")
    # recipe: seq 136 = the static pair shape the reference recipe's
    # crop distribution produces (see module docstring); full: seq 256;
    # both (default): measure the two shapes and emit them in ONE JSON
    # line so the driver-captured bench artifact is self-describing
    p.add_argument("--seq", type=int, default=None)
    p.add_argument("--queue_size", type=int, default=131072)
    p.add_argument("--steps", type=int, default=6)
    # 6 steps x 2048 pairs keeps the timed section ~22s; more adds
    # tunnel-session risk without measurement value
    p.add_argument("--remat", default="none",
                   choices=("none", "full", "dots"))
    # no-remat default: 492 vs 482 pairs/s under 'dots' at B=32 x
    # accum 16 once the bf16 wgrad/activation work made the saved
    # activations fit HBM; the OOM ladder below degrades none -> dots
    # -> smaller batch on tighter chips
    p.add_argument("--no-remat", dest="remat", action="store_const",
                   const="none")
    p.add_argument("--attention", default="flash_block",
                   choices=("auto", "flash", "naive", "flash_block"))
    # flash_block (fused MHA+out-proj+dropout+residual+LN kernel):
    # 503.0 vs 492.6 pairs/s with the separate flash kernel; correct-
    # ness pinned on chip (fwd vs composed reference, VJP vs composed
    # autodiff, dropout fwd/bwd mask consistency)
    p.add_argument("--gelu", default="gelu_tanh",
                   choices=("gelu", "gelu_tanh"))
    p.add_argument("--queue_dtype", default="bfloat16",
                   choices=("bfloat16", "float32"))
    # --strict_parity: reference numerics end to end — exact erf gelu,
    # f32 queue, per-microbatch EMA (already default), NO pair packing
    # and NO length packing (packing changes fp accumulation order).
    # One measured row so the TPU-tuned-vs-reference-numerics delta is
    # a number, not a footnote (VERDICT r4 #6).
    p.add_argument("--strict_parity", action="store_true")
    p.add_argument("--unroll", type=int, default=1)
    p.add_argument("--layer_loop", default="python",
                   choices=("scan", "python"))
    # python (default): plain loop over layers — per-layer saved
    # activations stay standalone buffers instead of scan-stacked via
    # DUS (the ~300 ms/step stacking-save cost in the round-5
    # roofline). Measured full-256 636.8 -> 696.5 pairs/s (+9.4%),
    # recipe 968.3 -> 1032.8 (+6.7%); --layer_loop scan for the O(1)
    # compile-time form
    p.add_argument("--ema_every_step", action="store_true")
    p.add_argument("--ffn", default="fused", choices=("xla", "fused"))
    p.add_argument("--dropout", type=float, default=0.1,
                   help="encoder dropout rate; 0 is the kernel A/B "
                        "measuring the in-kernel PRNG/mask VPU cost")
    p.add_argument("--no_pack_pairs", dest="pack_pairs",
                   action="store_false", default=True,
                   help="disable pair packing (2 batch elements per "
                        "fused-attention row-block; recipe-shape "
                        "lane-padding lever, +8.2%% measured — "
                        "models/bert.py attention_pack_pairs)")
    p.add_argument("--pack_rebalance", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="cross-microbatch pair rebalance for the packed "
                        "workload (Config.pack_rebalance; the trainer "
                        "enables it via --pack_rebalance): packs every "
                        "microbatch at the sum bound, nb 44 -> 42 at "
                        "B=128/R=256, +3.2%% measured. On by default "
                        "here like the other tuned-numerics defaults "
                        "(bf16 queue, gelu_tanh) — it changes MoCo "
                        "batch membership / within-step queue order "
                        "(epsilon at queue 131k); --no-pack_rebalance "
                        "restores membership-preserving packing")
    # fused FFN block (ops/ffn_block.py): 526.3 vs 501.4 pairs/s with
    # the XLA FFN chain (both under flash_block attention)
    args = p.parse_args()
    if args.strict_parity:
        args.gelu = "gelu"
        args.queue_dtype = "float32"
        args.pack_pairs = False
        if args.workload in ("both", "packed"):
            args.workload = "recipe"

    def measure(seq, pack_rows=0):
        """One workload shape, with the OOM degradation ladder."""
        batch = args.batch
        remat = args.remat
        retried_same = False
        while True:
            try:
                sps, spstep, loss, lens = run(
                    batch, args.accum, seq, args.queue_size, args.steps,
                    remat, args.attention, args.gelu, args.unroll,
                    args.ema_every_step, args.ffn,
                    args.layer_loop == "scan", args.dropout,
                    args.pack_pairs, pack_rows, args.queue_dtype,
                    args.pack_rebalance)
                break
            except Exception as e:
                oom = ("RESOURCE_EXHAUSTED" in str(e)
                       or "Ran out of memory" in str(e))
                if oom and not retried_same:
                    # transient: the tunnel server can still hold a
                    # previous client's HBM when this one starts, so a
                    # first OOM is not proof the config doesn't fit —
                    # observed flaky at B=128 (fits at 8.1 GB of 16,
                    # docs/PERF.md shakeout)
                    print(f"OOM at batch {batch}/{remat}; retrying same "
                          f"config once before degrading", file=sys.stderr)
                    retried_same = True
                    time.sleep(10)
                elif oom and remat == "none":
                    print("OOM without remat, retrying with 'dots'",
                          file=sys.stderr)
                    remat = "dots"
                    retried_same = False
                elif oom and batch > 8:
                    print(f"OOM at batch {batch}, halving", file=sys.stderr)
                    batch //= 2
                    retried_same = False
                else:
                    raise
        from czechtriever_tpu.models import bert as bertlib
        mcfg = bertlib.BertConfig(vocab_size=30522)
        if pack_rows:
            fpp = packed_flops_per_pair(mcfg, lens, args.queue_size, remat)
        else:
            fpp = model_flops_per_pair(mcfg, seq, args.queue_size, remat)
        mfu = sps * fpp / V5E_PEAK_FLOPS
        shape_lbl = f"packed(R={pack_rows})" if pack_rows else f"seq={seq}"
        print(f"{shape_lbl} batch={batch} accum={args.accum} "
              f"step={spstep*1000:.1f}ms loss={loss:.4f} "
              f"attention={args.attention} remat={remat} "
              f"mfu={100*mfu:.1f}%", file=sys.stderr)
        out = {"value": round(sps, 2),
               "vs_baseline": round(sps / REFERENCE_SAMPLES_PER_S, 3),
               "mfu_pct": round(100 * mfu, 1), "seq": seq}
        if pack_rows:
            out["pack_rows"] = pack_rows
            out["pack_rebalance"] = bool(args.pack_rebalance)
            out["mean_crop_len"] = round(float(np.mean(lens)), 1)
        return out

    shapes = {"recipe": 136, "full": 256}
    if args.seq is not None:
        if args.workload in ("both", "packed"):
            # silently measuring the default shapes under a custom --seq
            # would mislabel the run; require an explicit workload
            p.error("--seq requires an explicit --workload (recipe|full)")
        shapes[args.workload] = args.seq
    want = ("packed", "recipe", "full") if args.workload == "both" \
        else (args.workload,)
    results = {}
    for w in want:
        if w == "packed":
            results[w] = measure(shapes["recipe"], pack_rows=args.pack_rows)
        else:
            results[w] = measure(shapes[w])

    print("(packed = the recipe crop distribution [mean ~80 real tokens] "
          "through the length-packed pipeline, the training pipeline's "
          "actual hot loop with packing on; recipe = the same crops in "
          "the fixed 136-column unpacked bucket [crops<=130 padded to "
          "136, src/data.py:563-573]; full_256 is the strictly harder "
          "all-256 shape the recipe never sees)", file=sys.stderr)
    headline = (results.get("packed") or results.get("recipe")
                or results["full"])
    wl = ("packed" if "packed" in results
          else "recipe" if "recipe" in results else "full")
    out = {
        "metric": "moco_train_pairs_per_s",
        "value": headline["value"],
        "unit": "pairs/s",
        "vs_baseline": headline["vs_baseline"],
        "mfu_pct": headline["mfu_pct"],
        "workload": wl,
        "seq": headline["seq"],
    }
    if "pack_rebalance" in headline:
        # self-describing artifact: record whether the headline packed
        # row ran membership-preserving or rebalanced packing
        out["pack_rebalance"] = headline["pack_rebalance"]
    for extra, key in (("recipe", "recipe_unpacked_136"),
                       ("full", "full_256")):
        if extra in results and extra != wl:
            out[key] = results[extra]
    print(json.dumps(out))


if __name__ == "__main__":
    main()

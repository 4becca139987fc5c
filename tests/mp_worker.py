"""Subprocess worker for the real multi-process trainer tests
(tests/test_multiprocess.py). Each OS process contributes
``4 // nproc`` virtual CPU devices to a global 4-device (data, model)
mesh via ``jax.distributed`` (Gloo collectives), runs 3 identical MoCo
optimizer steps, and writes its replicated scalars to a JSON file.

Modes:
  * ``single``   — one process, 4 local devices, no jax.distributed
                   (the parity oracle);
  * ``explicit`` — parallel.mesh.init_distributed with an explicit
                   coordinator (the generic launcher path);
  * ``slurm``    — only SLURM_* env vars set; init_distributed must
                   trigger off SLURM_NTASKS and jax's SlurmCluster must
                   parse the coordinator from SLURM_STEP_NODELIST +
                   SLURM_JOB_ID (replacing the reference's env-var
                   translation, /root/reference/src/slurm.py:51-74);
  * ``eval_single`` / ``eval_explicit`` — BEIR evaluate_model on a
                   synthetic dataset under <out>/beir: multi-process
                   rank-split encode + varsize gather must reproduce
                   the single-process metrics exactly (the reference's
                   distributed eval, src/beir_utils.py:52-58,93-99);
  * ``distill_single`` / ``distill_explicit`` — the distill step on a
                   (data=2, model=2) mesh with the gemma teacher
                   TP-sharded over a model axis that CROSSES the
                   process boundary in the explicit variant — the 9B
                   bge-multilingual-gemma2 layout the reference's
                   config-5 multi-host scenario needs
                   (/root/reference/distill.py:466-470,504-509);
  * ``finetune_single`` / ``finetune_explicit`` — the supervised
                   finetune path: 3 InBatch steps (differentiable key
                   all-gather crossing the process boundary,
                   src/inbatch.py:67-71) + evaluate_finetune on
                   rank-strided eval shards (gold/negative allgather +
                   label offset, /root/reference/finetuning.py:123-196);
  * 4 processes — plain ``explicit`` with nproc=4 (1 device each); the
                   test compares against the same single-process oracle.
"""

import json
import os
import sys


def run_eval(mode: str, proc_id: int, nproc: int, out: str) -> None:
    """BEIR evaluate_model on the dataset the test wrote to <out>/beir.

    Every process computes the metrics (is_main=True) so the test can
    assert both cross-process agreement and parity with the
    single-process oracle."""
    import jax
    import numpy as np

    from czechtriever_tpu.data.tokenizer import WordPieceTokenizer
    from czechtriever_tpu.evaluation import beir as beir_eval
    from czechtriever_tpu.models import bert
    from czechtriever_tpu.parallel import mesh as meshlib

    with open(os.path.join(out, "beir", "vocab.json")) as f:
        vocab = json.load(f)
    tok = WordPieceTokenizer({w: i for i, w in enumerate(vocab)})
    mcfg = bert.BertConfig.tiny(vocab_size=len(vocab))
    params = bert.init_params(jax.random.key(0), mcfg)
    mesh = meshlib.make_mesh()
    # place the params on the GLOBAL mesh as device arrays — what the
    # cli/train.py eval hook passes (trainer.encoder_params); the
    # evaluator must pull them to host (mesh.host_safe) before its
    # local-mesh re-placement, or device_put raises a cross-host error
    params = meshlib.replicate(mesh, params)
    res = beir_eval.evaluate_model(
        params, mcfg, tok, "toy", beir_dir=os.path.join(out, "beir"),
        norm_query=True, norm_doc=True, k_values=(1, 3, 5), mesh=mesh,
        is_main=True, batch_size=4)
    res_tp = res
    if mode == "eval_explicit":
        # TP-sharded params whose model axis CROSSES the process
        # boundary (the 9B-teacher layout): host_safe must gather them
        # with process_allgather — np.asarray alone raises
        # NotImplementedError on non-fully-addressable sharded arrays
        from jax.sharding import Mesh, NamedSharding

        devs = np.array(jax.devices()).reshape(2, 2).T
        tp_mesh = Mesh(devs, (meshlib.DATA_AXIS, meshlib.MODEL_AXIS))
        assert len({d.process_index for d in devs[0]}) == 2
        specs = bert.partition_specs(mcfg)
        params_tp = jax.tree.map(
            lambda p, s: jax.device_put(p, NamedSharding(tp_mesh, s)),
            jax.tree.map(np.asarray, params), specs)
        res_tp = beir_eval.evaluate_model(
            params_tp, mcfg, tok, "toy", beir_dir=os.path.join(out, "beir"),
            norm_query=True, norm_doc=True, k_values=(1, 3, 5), mesh=tp_mesh,
            is_main=True, batch_size=4)

    result = {
        "mode": mode, "proc_id": proc_id,
        "process_count": meshlib.process_count(),
        "is_main": meshlib.is_main(),
        "metrics": res,
        "metrics_tp": res_tp,
    }
    with open(os.path.join(out, f"proc{proc_id}.json"), "w") as f:
        json.dump(result, f)


def run_distill(mode: str, proc_id: int, nproc: int, out: str) -> None:
    """Distill step on a (data=2, model=2) mesh whose MODEL axis crosses
    the process boundary in the 2-process variant — the layout a 9B
    bge-multilingual-gemma2 teacher needs on a v5e-8 pod slice
    (/root/reference/distill.py:466-470,504-509)."""
    import jax
    import numpy as np
    import optax
    from jax.sharding import Mesh

    from czechtriever_tpu.config import Config
    from czechtriever_tpu.models import bert, gemma
    from czechtriever_tpu.parallel import mesh as meshlib
    from czechtriever_tpu.training import distill, optim, state as statelib

    cfg = Config(queue_size=32, temperature=0.05, momentum=0.99, lr=1e-3,
                 warmup_steps=0, total_steps=100, scheduler="linear",
                 projection_size=32, clip_gradients=False,
                 queue_dtype="float32", distill_weight=0.3)
    mcfg = bert.BertConfig(vocab_size=211, hidden_size=32,
                           num_hidden_layers=2, num_attention_heads=2,
                           intermediate_size=64,
                           max_position_embeddings=64, dtype="float32",
                           hidden_dropout_prob=0.0,
                           attention_probs_dropout_prob=0.0)
    tcfg = gemma.GemmaConfig.tiny(vocab_size=211)  # GQA 4q/2kv: TP=2 ok

    # jax.devices() orders process 0's devices first, so a plain
    # reshape(2, 2) would keep the model axis inside one process; the
    # transpose pairs device i of process 0 with device i of process 1
    # along MODEL — the cross-host TP layout under test.
    devs = np.array(jax.devices()).reshape(2, 2).T
    mesh = Mesh(devs, (meshlib.DATA_AXIS, meshlib.MODEL_AXIS))
    if mode == "distill_explicit":
        procs_per_tp_group = {d.process_index for d in devs[0]}
        assert len(procs_per_tp_group) == 2, (
            f"model axis does not span processes: {devs}")

    tx = optim.make_optimizer(cfg)
    st = statelib.create_distill_state(jax.random.key(0), cfg, mcfg, tcfg,
                                       tx)
    st = statelib.place_state(mesh, st, mcfg, tx, tcfg=tcfg)
    # the teacher must actually be TP-sharded (not the replication
    # fallback _teacher_specs warns about)
    t_leaf = jax.tree.leaves(st.params_t)[0]
    teacher_sharded = any(
        any(ax is not None for ax in x.sharding.spec)
        for x in jax.tree.leaves(st.params_t) if x.ndim >= 2)

    step_fn = jax.jit(distill.make_distill_step(cfg, mcfg, tcfg, tx))
    rng = jax.random.key(1)
    data_rng = np.random.default_rng(0)
    stats = None
    for _ in range(3):
        ids = data_rng.integers(5, 211, (2, 2, 8, 12)).astype(np.int32)
        mask = np.ones((2, 8, 12), np.int32)
        b = {"q_tokens": ids[0], "q_mask": mask,
             "k_tokens": ids[1], "k_mask": mask}
        b = meshlib.shard_microbatches(mesh, b)
        st, stats = step_fn(st, b, rng)

    result = {
        "mode": mode, "proc_id": proc_id,
        "process_count": meshlib.process_count(),
        "teacher_sharded": bool(teacher_sharded),
        "teacher_leaf_devices": len(t_leaf.sharding.device_set),
        "loss": float(stats["loss"]),
        "distill_loss": float(stats["distill_loss"]),
        "accuracy": float(stats["accuracy"]),
        "queue_ptr": int(np.asarray(st.queue_ptr)),
        "param_norm": float(jax.jit(optax.global_norm)(st.params_q)),
        "teacher_norm": float(jax.jit(optax.global_norm)(st.params_t)),
    }
    with open(os.path.join(out, f"proc{proc_id}.json"), "w") as f:
        json.dump(result, f)


def run_finetune(mode: str, proc_id: int, nproc: int, out: str) -> None:
    """Supervised finetune across processes: InBatch train steps whose
    differentiable key all-gather crosses the process boundary, then
    evaluate_finetune where each process encodes a rank-strided eval
    shard and golds/negatives are allgathered with label offsets
    (/root/reference/finetuning.py:123-196). Scalars and global eval
    metrics must match the single-process oracle."""
    import jax
    import numpy as np
    import optax

    from czechtriever_tpu.config import Config
    from czechtriever_tpu.models import bert
    from czechtriever_tpu.parallel import mesh as meshlib
    from czechtriever_tpu.training import optim, state as statelib, steps
    from czechtriever_tpu.training.finetune import evaluate_finetune

    cfg = Config(temperature=0.05, lr=1e-3, warmup_steps=0,
                 total_steps=100, scheduler="linear", clip_gradients=False,
                 contrastive_mode="inbatch", norm_query=True,
                 norm_doc=True)
    mcfg = bert.BertConfig(vocab_size=211, hidden_size=32,
                           num_hidden_layers=2, num_attention_heads=2,
                           intermediate_size=64,
                           max_position_embeddings=64, dtype="float32",
                           hidden_dropout_prob=0.0,
                           attention_probs_dropout_prob=0.0)
    mesh = meshlib.make_mesh()
    tx = optim.make_optimizer(cfg)
    st = statelib.create_inbatch_state(jax.random.key(0), cfg, mcfg, tx)
    st = meshlib.replicate(mesh, st)
    step_fn = jax.jit(steps.make_inbatch_step(cfg, mcfg, tx))
    rng = jax.random.key(1)

    # identical global triplet batches everywhere; keys = golds (the
    # reference finetune objective is InBatch over the triplet collator)
    data_rng = np.random.default_rng(0)
    stats = None
    for _ in range(3):
        ids = data_rng.integers(5, 211, (2, 2, 8, 12)).astype(np.int32)
        mask = np.ones((2, 8, 12), np.int32)
        b = {"q_tokens": ids[0], "q_mask": mask,
             "k_tokens": ids[1], "k_mask": mask}
        b = meshlib.shard_microbatches(mesh, b)
        st, stats = step_fn(st, b, rng)

    # eval set: 8 (query, gold, 2 negatives) triplets; multi-process
    # takes rank-strided shards, the oracle sees the whole set
    eval_rng = np.random.default_rng(7)
    Q, L = 8, 12
    q_ids = eval_rng.integers(5, 211, (Q, L)).astype(np.int32)
    g_ids = q_ids.copy()  # gold = same text: acc must be 100
    n_ids = eval_rng.integers(5, 211, (2 * Q, L)).astype(np.int32)
    rows = (slice(None) if mode == "finetune_single"
            else slice(proc_id, None, nproc))
    ones = lambda a: np.ones_like(a)

    class _Batcher:
        def epoch(self):
            yield {"q_tokens": q_ids[rows], "q_mask": ones(q_ids[rows]),
                   "g_tokens": g_ids[rows], "g_mask": ones(g_ids[rows]),
                   "n_tokens": n_ids[rows], "n_mask": ones(n_ids[rows])}

    # pass the trainer's GLOBAL-mesh device params, exactly what the
    # cli/finetune.py eval hook does — evaluate_finetune must pull them
    # to host itself (mesh.host_safe) before per-rank local encoding
    m = evaluate_finetune(st.params, mcfg, cfg, _Batcher(), batch_size=4)

    result = {
        "mode": mode, "proc_id": proc_id,
        "process_count": meshlib.process_count(),
        "loss": float(stats["loss"]),
        "accuracy": float(stats["accuracy"]),
        "param_norm": float(optax.global_norm(st.params)),
        "eval_acc": float(m["eval_acc"]), "mrr": float(m["mrr"]),
        "n_queries": float(m["n_queries"]),
    }
    with open(os.path.join(out, f"proc{proc_id}.json"), "w") as f:
        json.dump(result, f)


def run_feed(mode: str, proc_id: int, nproc: int, out: str) -> None:
    """Per-process data feeding (round-4 ask #3): each process builds
    ONLY its own local rows — DIFFERENT content per process — and the
    Trainer assembles the global batch via
    make_array_from_process_local_data. The single-process oracle
    (``feed_single``) is fed the concatenation; identical trainer
    scalars prove the consumed global batch equals the concatenation
    of the per-process local batches (reference semantics:
    DistributedSampler, /root/reference/train.py:187-193)."""
    import jax
    import numpy as np
    import optax

    from czechtriever_tpu.config import Config
    from czechtriever_tpu.models import bert
    from czechtriever_tpu.parallel import mesh as meshlib
    from czechtriever_tpu.training.trainer import Trainer

    cfg = Config(queue_size=32, temperature=0.05, momentum=0.99, lr=1e-3,
                 warmup_steps=0, total_steps=3, scheduler="linear",
                 projection_size=32, clip_gradients=False,
                 queue_dtype="float32", per_device_batch_size=4,
                 target_batch_size=32, log_freq=100, eval_freq=0,
                 save_freq=0, output_dir=os.path.join(out, f"o{proc_id}"),
                 save_dir=os.path.join(out, f"o{proc_id}"),
                 donate_state=False, device_prefetch=False)
    mcfg = bert.BertConfig(vocab_size=211, hidden_size=32,
                           num_hidden_layers=2, num_attention_heads=2,
                           intermediate_size=64,
                           max_position_embeddings=64, dtype="float32",
                           hidden_dropout_prob=0.0,
                           attention_probs_dropout_prob=0.0)
    mesh = meshlib.make_mesh()  # (4, 1)
    feed_id, num_feeds, n_local = meshlib.data_feed_info(mesh)
    assert num_feeds == nproc and feed_id == proc_id
    B_local = cfg.per_device_batch_size * n_local

    trainer = Trainer(cfg, mcfg, mesh=mesh, local_batches=True)
    assert trainer.local_micro == B_local

    def epoch():
        # one shared deterministic GLOBAL stream; each feed takes its
        # own row block — so the oracle sees exactly the concatenation
        rng = np.random.default_rng(0)
        for _ in range(6):  # 3 steps x accum 2
            ids = rng.integers(5, 211, (2, 16, 12)).astype(np.int32)
            rows = slice(feed_id * B_local, (feed_id + 1) * B_local)
            mask = np.ones((B_local, 12), np.int32)
            yield {"q_tokens": ids[0][rows], "q_mask": mask,
                   "k_tokens": ids[1][rows], "k_mask": mask}

    trainer.fit(epoch)
    st = trainer.state
    result = {
        "mode": mode, "proc_id": proc_id,
        "process_count": meshlib.process_count(),
        "local_rows": B_local,
        "step": int(np.asarray(st.step)),
        "queue_ptr": int(np.asarray(st.queue_ptr)),
        "param_norm": float(jax.jit(optax.global_norm)(st.params_q)),
        "queue_norm": float(jax.jit(optax.global_norm)(st.queue)),
    }
    with open(os.path.join(out, f"proc{proc_id}.json"), "w") as f:
        json.dump(result, f)


def run_feedpack(mode: str, proc_id: int, nproc: int, out: str) -> None:
    """Multi-process LOCAL feeding + length packing (round-5): each
    process packs only its own variable-length rows; the block count is
    agreed via one host allgather and segment ids carry feed-global
    offsets. The oracle is ``feedpack_single`` fed the concatenated
    batch UNPACKED — identical trainer scalars prove packing across
    processes changes neither batch membership nor the loss."""
    import jax
    import numpy as np
    import optax

    from czechtriever_tpu.config import Config
    from czechtriever_tpu.models import bert
    from czechtriever_tpu.parallel import mesh as meshlib
    from czechtriever_tpu.training.trainer import Trainer

    packed = mode.endswith("explicit")
    cfg = Config(queue_size=32, temperature=0.05, momentum=0.99, lr=1e-3,
                 warmup_steps=0, total_steps=3, scheduler="linear",
                 projection_size=32, clip_gradients=False,
                 queue_dtype="float32", per_device_batch_size=4,
                 target_batch_size=32, log_freq=100, eval_freq=0,
                 save_freq=0, output_dir=os.path.join(out, f"p{proc_id}"),
                 save_dir=os.path.join(out, f"p{proc_id}"),
                 donate_state=False, device_prefetch=False,
                 pack_rows=24 if packed else 0)
    mcfg = bert.BertConfig(vocab_size=211, hidden_size=32,
                           num_hidden_layers=2, num_attention_heads=2,
                           intermediate_size=64,
                           max_position_embeddings=64, dtype="float32",
                           hidden_dropout_prob=0.0,
                           attention_probs_dropout_prob=0.0)
    mesh = meshlib.make_mesh()
    feed_id, num_feeds, n_local = meshlib.data_feed_info(mesh)
    B_local = cfg.per_device_batch_size * n_local

    trainer = Trainer(cfg, mcfg, mesh=mesh, local_batches=True)

    def epoch():
        # one shared deterministic GLOBAL stream of variable-length
        # rows; each feed takes its own row block
        rng = np.random.default_rng(0)
        for _ in range(6):  # 3 steps x accum 2
            ids = rng.integers(5, 211, (2, 16, 20)).astype(np.int32)
            lens = rng.integers(6, 19, size=16)
            mask = (np.arange(20)[None, :] < lens[:, None]).astype(np.int32)
            ids = ids * mask[None]
            rows = slice(feed_id * B_local, (feed_id + 1) * B_local)
            yield {"q_tokens": ids[0][rows], "q_mask": mask[rows],
                   "k_tokens": ids[1][rows], "k_mask": mask[rows]}

    trainer.fit(epoch)
    st = trainer.state
    result = {
        "mode": mode, "proc_id": proc_id,
        "process_count": meshlib.process_count(),
        "packed": packed,
        "step": int(np.asarray(st.step)),
        "queue_ptr": int(np.asarray(st.queue_ptr)),
        "param_norm": float(jax.jit(optax.global_norm)(st.params_q)),
        "queue_norm": float(jax.jit(optax.global_norm)(st.queue)),
    }
    with open(os.path.join(out, f"proc{proc_id}.json"), "w") as f:
        json.dump(result, f)


def run_cli(mode: str, proc_id: int, nproc: int, out: str) -> None:
    """The ACTUAL trainer CLI run as N OS processes on a shared u16
    stream (the previously untested CLI-level multi-process path). The
    test pre-writes tokens.bin and model.json into <out>."""
    from czechtriever_tpu.cli import train as train_cli
    from czechtriever_tpu.parallel import mesh as meshlib

    run_dir = os.path.join(out, "run")
    train_cli.main([
        "--train_data", os.path.join(out, "tokens.bin"),
        "--output_dir", run_dir, "--save_dir", run_dir,
        "--contrastive_mode", "moco", "--queue_size", "64",
        "--chunk_length", "16", "--target_batch_size", "16",
        "--per_device_batch_size", "2", "--total_steps", "3",
        "--log_freq", "1", "--lr", "1e-3", "--random_init",
        "--retriever_model_id", "nonexistent-tiny",
        "--model_config_file", os.path.join(out, "model.json"),
        "--dtype", "float32", "--projection_size", "32",
        "--val_data_ratio", "0", "--num_workers", "0",
        "--no-device_prefetch",
    ])
    result = {
        "mode": mode, "proc_id": proc_id,
        "process_count": meshlib.process_count(),
        "is_main": meshlib.is_main(),
        "final_ckpt": os.path.exists(
            os.path.join(run_dir, "checkpoint", "final")),
    }
    with open(os.path.join(out, f"proc{proc_id}.json"), "w") as f:
        json.dump(result, f)


def main() -> None:
    mode, proc_id, nproc, port, out = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
        sys.argv[5])
    local_devices = 4 // nproc
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}")
    if mode == "slurm":
        # jobid chosen so jax's port formula (jobid % 4096 + 61440 - 1
        # .. see SlurmCluster.get_coordinator_address) lands on `port`
        os.environ.update({
            "SLURM_JOB_ID": str(int(port) - (65535 - 2 ** 12 + 1)),
            "SLURM_STEP_NODELIST": "127.0.0.1",
            "SLURM_NTASKS": str(nproc),
            "SLURM_PROCID": str(proc_id),
            "SLURM_LOCALID": str(proc_id),
            "SLURM_STEP_NUM_NODES": "1",
        })
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from czechtriever_tpu.config import Config
    from czechtriever_tpu.models import bert
    from czechtriever_tpu.parallel import mesh as meshlib
    from czechtriever_tpu.training import optim, state as statelib, steps

    if mode in ("explicit", "eval_explicit", "distill_explicit",
                "finetune_explicit", "feed_explicit", "cli_explicit",
                "feedpack_explicit"):
        meshlib.init_distributed(coordinator_address=f"127.0.0.1:{port}",
                                 num_processes=nproc, process_id=proc_id)
    elif mode == "slurm":
        meshlib.init_distributed()  # must auto-detect from SLURM env

    if mode.startswith("eval"):
        run_eval(mode, proc_id, nproc, out)
        return
    if mode.startswith("feedpack"):
        run_feedpack(mode, proc_id, nproc, out)
        return
    if mode.startswith("feed"):
        run_feed(mode, proc_id, nproc, out)
        return
    if mode.startswith("cli"):
        run_cli(mode, proc_id, nproc, out)
        return
    if mode.startswith("distill"):
        assert len(jax.devices()) == 4, jax.devices()
        run_distill(mode, proc_id, nproc, out)
        return
    if mode.startswith("finetune"):
        assert len(jax.devices()) == 4, jax.devices()
        run_finetune(mode, proc_id, nproc, out)
        return

    assert len(jax.devices()) == 4, jax.devices()
    if mode != "single":
        assert meshlib.process_count() == nproc
        assert meshlib.process_index() == proc_id

    cfg = Config(queue_size=32, temperature=0.05, momentum=0.99, lr=1e-3,
                 warmup_steps=0, total_steps=100, scheduler="linear",
                 projection_size=32, clip_gradients=False,
                 queue_dtype="float32")
    mcfg = bert.BertConfig(vocab_size=211, hidden_size=32,
                           num_hidden_layers=2, num_attention_heads=2,
                           intermediate_size=64,
                           max_position_embeddings=64, dtype="float32",
                           hidden_dropout_prob=0.0,
                           attention_probs_dropout_prob=0.0)
    mesh = meshlib.make_mesh()
    tx = optim.make_optimizer(cfg)
    st = statelib.create_moco_state(jax.random.key(0), cfg, mcfg, tx)
    st = meshlib.replicate(mesh, st)
    step_fn = jax.jit(steps.make_moco_step(cfg, mcfg, tx))
    rng = jax.random.key(1)

    # identical global batches in every process; device_put takes each
    # process's addressable shards of the (data-axis-sharded) microbatch
    data_rng = np.random.default_rng(0)
    stats = None
    for _ in range(3):
        ids = data_rng.integers(5, 211, (2, 2, 8, 12)).astype(np.int32)
        mask = np.ones((2, 8, 12), np.int32)
        b = {"q_tokens": ids[0], "q_mask": mask,
             "k_tokens": ids[1], "k_mask": mask}
        b = meshlib.shard_microbatches(mesh, b)
        st, stats = step_fn(st, b, rng)

    import optax
    result = {
        "mode": mode, "proc_id": proc_id,
        "n_devices": len(jax.devices()),
        "process_count": meshlib.process_count(),
        "is_main": meshlib.is_main(),
        "loss": float(stats["loss"]),
        "accuracy": float(stats["accuracy"]),
        "queue_ptr": int(np.asarray(st.queue_ptr)),
        "param_norm": float(optax.global_norm(st.params_q)),
        "queue_norm": float(optax.global_norm(st.queue)),
    }
    with open(os.path.join(out, f"proc{proc_id}.json"), "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()

"""Mechanized 9B-teacher memory plan (round-4 ask #7): the v5e-8 table
in docs/PERF.md must be derivable from code — jax.eval_shape over
create_distill_state + the exact place_state PartitionSpecs — so the
plan can't rot when partition_specs change. Reference topology:
/root/reference/distill.py:504-509 (bge-multilingual-gemma2 teacher)."""

import jax
import numpy as np
import pytest

from czechtriever_tpu.config import Config
from czechtriever_tpu.models import bert, gemma
from czechtriever_tpu.parallel import mesh as meshlib
from czechtriever_tpu.training import state as statelib

GB = 1e9

# docs/PERF.md "Memory plan: the 9B bf16 teacher on a v5e-8" table
PERF_TABLE_GB = {
    "teacher_layers": 2.08,     # 8.32B/8 x bf16
    "teacher_embedding": 1.83,  # 0.92B x bf16, replicated
    "student_params": 0.28,     # params_q + params_k, f32, TP/8 + repl emb
    "adam_moments": 0.28,       # mu+nu on params_q
    "queue": 0.40,              # 131072 x 768 f32, replicated
    "total": 4.87,
}


def real_geometry():
    tcfg = gemma.GemmaConfig()  # 3584/42/16q/8kv/hd256/F14336/vocab256k
    mcfg = bert.BertConfig()    # Czert = bert-base: 768/12/12/3072/vocab30522
    cfg = Config(contrastive_mode="distill", queue_size=131072,
                 projection_size=768, queue_dtype="float32",
                 param_dtype="float32")
    return cfg, mcfg, tcfg


class TestMemoryPlan:
    def test_v5e8_plan_matches_perf_table(self):
        cfg, mcfg, tcfg = real_geometry()
        mesh = meshlib.make_mesh(data=1, model=8)
        plan = statelib.state_memory_plan(mesh, cfg, mcfg, tcfg,
                                          teacher_dtype="bfloat16")

        def within(actual_bytes, table_gb, tol=0.05):
            return abs(actual_bytes / GB - table_gb) <= tol * table_gb

        # teacher: table splits layers vs embedding; the plan returns
        # the sum — check the sum against the table's sum
        t_table = PERF_TABLE_GB["teacher_layers"] + \
            PERF_TABLE_GB["teacher_embedding"]
        assert within(plan["teacher_params"], t_table), (
            plan["teacher_params"] / GB, t_table)
        student = plan["student_params_q"] + plan["student_params_k"]
        assert within(student, PERF_TABLE_GB["student_params"]), (
            student / GB)
        assert within(plan["adam_moments"], PERF_TABLE_GB["adam_moments"]), (
            plan["adam_moments"] / GB)
        assert within(plan["queue"], PERF_TABLE_GB["queue"]), (
            plan["queue"] / GB)
        assert within(plan["total"], PERF_TABLE_GB["total"]), (
            plan["total"] / GB)
        # the headline claim: state fits a 16 GB v5e chip with >= 5 GB
        # of activation/workspace headroom
        assert plan["total"] / GB < 16 - 5

    def test_data2_model4_variant_fits(self):
        """The PERF.md alternative (data=2, model=4): teacher layers
        shard /4 (4.16 GB) + replicated embedding still fit."""
        cfg, mcfg, tcfg = real_geometry()
        mesh = meshlib.make_mesh(data=2, model=4)
        plan = statelib.state_memory_plan(mesh, cfg, mcfg, tcfg)
        assert 5.8 < plan["teacher_params"] / GB < 6.2  # 4.16 + 1.83
        assert plan["total"] / GB < 16 - 5

    def test_gqa_fallback_replicates_teacher(self):
        """model axis not dividing the kv heads -> replicated teacher
        (the _teacher_specs guard); the plan must reflect the blowup."""
        cfg, mcfg, _ = real_geometry()
        tcfg = gemma.GemmaConfig(num_key_value_heads=3,
                                 num_attention_heads=6)
        mesh = meshlib.make_mesh(data=1, model=8)
        plan = statelib.state_memory_plan(mesh, cfg, mcfg, tcfg)
        sharded = statelib.state_memory_plan(
            mesh, cfg, mcfg, gemma.GemmaConfig())
        assert plan["teacher_params"] > 2 * sharded["teacher_params"]

    def test_plan_matches_actual_placement_tiny(self):
        """At tiny dims the abstract plan must equal the bytes of a REAL
        placed state (per chip), validating the spec mirroring."""
        from czechtriever_tpu.training import optim
        tcfg = gemma.GemmaConfig.tiny()
        mcfg = bert.BertConfig.tiny()
        cfg = Config(contrastive_mode="distill", queue_size=64,
                     projection_size=mcfg.hidden_size,
                     queue_dtype="float32", param_dtype="float32")
        mesh = meshlib.make_mesh(data=4, model=2)
        plan = statelib.state_memory_plan(mesh, cfg, mcfg, tcfg,
                                          teacher_dtype="float32")
        tx = optim.make_optimizer(cfg)
        st = statelib.create_distill_state(jax.random.key(0), cfg, mcfg,
                                           tcfg, tx)
        placed = statelib.place_state(mesh, st, mcfg, tx, tcfg=tcfg)

        def placed_bytes(tree):
            tot = 0
            for leaf in jax.tree.leaves(tree):
                if hasattr(leaf, "addressable_shards"):
                    sh = leaf.addressable_shards[0]
                    tot += int(np.prod(sh.data.shape)
                               * np.dtype(leaf.dtype).itemsize)
            return tot

        assert plan["teacher_params"] == placed_bytes(placed.params_t)
        assert plan["student_params_q"] == placed_bytes(placed.params_q)
        assert plan["queue"] == placed_bytes(placed.queue)

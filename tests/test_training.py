"""Train-step tests: learning progress, MoCo state machine, gradient
accumulation semantics, and multi-device sharding equivalence on the
8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from czechtriever_tpu.config import Config
from czechtriever_tpu.models import bert
from czechtriever_tpu.parallel import mesh as meshlib
from czechtriever_tpu.training import optim, state as statelib, steps


def tiny_cfg(**kw):
    d = dict(queue_size=32, temperature=0.05, momentum=0.99, lr=1e-3,
             warmup_steps=0, total_steps=1000, scheduler="linear",
             projection_size=32, contrastive_mode="moco",
             clip_gradients=False, weight_decay=0.0)
    d.update(kw)
    return Config(**d)


def tiny_mcfg(dropout=0.0):
    return bert.BertConfig(vocab_size=211, hidden_size=32,
                           num_hidden_layers=2, num_attention_heads=2,
                           intermediate_size=64, max_position_embeddings=64,
                           hidden_dropout_prob=dropout,
                           attention_probs_dropout_prob=dropout,
                           dtype="float32")


def make_batch(rng, A, B, L, vocab):
    ids = rng.integers(5, vocab, size=(2, A, B, L)).astype(np.int32)
    mask = np.ones((2, A, B, L), np.int32)
    mask[..., L - 3:] = 0
    return {"q_tokens": jnp.array(ids[0]), "q_mask": jnp.array(mask[0]),
            "k_tokens": jnp.array(ids[1]), "k_mask": jnp.array(mask[1])}


class TestInBatchStep:
    def test_loss_decreases(self):
        cfg = tiny_cfg(contrastive_mode="inbatch")
        mcfg = tiny_mcfg()
        tx = optim.make_optimizer(cfg)
        st = statelib.create_inbatch_state(jax.random.key(0), cfg, mcfg, tx)
        step_fn = jax.jit(steps.make_inbatch_step(cfg, mcfg, tx))
        batch = make_batch(np.random.default_rng(0), 1, 16, 20, mcfg.vocab_size)
        rng = jax.random.key(1)
        first = None
        for i in range(30):
            st, stats = step_fn(st, batch, rng)
            if first is None:
                first = float(stats["loss"])
        assert int(st.step) == 30
        assert float(stats["loss"]) < first * 0.5

    @pytest.mark.slow
    def test_accumulation_sums_gradients(self):
        cfg = tiny_cfg(contrastive_mode="inbatch")
        mcfg = tiny_mcfg(dropout=0.0)
        tx = optim.make_optimizer(cfg)
        st = statelib.create_inbatch_state(jax.random.key(0), cfg, mcfg, tx)
        step_fn = jax.jit(steps.make_inbatch_step(cfg, mcfg, tx))
        b1 = make_batch(np.random.default_rng(1), 1, 8, 16, mcfg.vocab_size)
        # duplicate the same microbatch twice along the accum axis
        b2 = {k: jnp.concatenate([v, v], axis=0) for k, v in b1.items()}
        _, s1 = step_fn(st, b1, jax.random.key(2))
        _, s2 = step_fn(st, b2, jax.random.key(2))
        # summed (unscaled) accumulation -> grad norm doubles
        np.testing.assert_allclose(float(s2["grad_norm"]),
                                   2 * float(s1["grad_norm"]), rtol=1e-4)


class TestMoCoStep:
    def _setup(self, cfg=None):
        cfg = cfg or tiny_cfg()
        mcfg = tiny_mcfg()
        tx = optim.make_optimizer(cfg)
        st = statelib.create_moco_state(jax.random.key(0), cfg, mcfg, tx)
        step_fn = jax.jit(steps.make_moco_step(cfg, mcfg, tx))
        return cfg, mcfg, tx, st, step_fn

    def test_queue_and_ptr_advance(self):
        cfg, mcfg, tx, st, step_fn = self._setup()
        A, B = 2, 8
        batch = make_batch(np.random.default_rng(0), A, B, 16, mcfg.vocab_size)
        q0 = np.asarray(st.queue).copy()
        st2, _ = step_fn(st, batch, jax.random.key(1))
        assert int(st2.queue_ptr) == A * B
        # first A*B rows replaced, rest untouched
        assert np.abs(np.asarray(st2.queue[:A * B]) - q0[:A * B]).max() > 1e-6
        np.testing.assert_array_equal(np.asarray(st2.queue[A * B:]), q0[A * B:])

    def test_ema_and_param_updates(self):
        cfg, mcfg, tx, st, step_fn = self._setup()
        batch = make_batch(np.random.default_rng(0), 1, 8, 16, mcfg.vocab_size)
        st2, _ = step_fn(st, batch, jax.random.key(1))
        # params_q moved (optimizer), params_k = EMA of *pre-update* q
        # (= initial copy, since q==k at init the EMA is a no-op)
        dq = jax.tree.map(lambda a, b: np.abs(np.asarray(a - b)).max(),
                          st2.params_q, st.params_q)
        assert max(jax.tree.leaves(dq)) > 0
        dk = jax.tree.map(lambda a, b: np.abs(np.asarray(a - b)).max(),
                          st2.params_k, st.params_k)
        assert max(jax.tree.leaves(dk)) < 1e-7
        # second step: EMA now pulls k toward updated q
        st3, _ = step_fn(st2, batch, jax.random.key(1))
        dk2 = max(jax.tree.leaves(jax.tree.map(
            lambda a, b: np.abs(np.asarray(a - b)).max(),
            st3.params_k, st2.params_k)))
        assert dk2 > 0

    def test_queue_wraps(self):
        cfg, mcfg, tx, st, step_fn = self._setup()
        batch = make_batch(np.random.default_rng(0), 1, 16, 16, mcfg.vocab_size)
        for i in range(3):  # 3*16 = 48 = 32 + 16 -> ptr wraps to 16
            st, _ = step_fn(st, batch, jax.random.key(1))
        assert int(st.queue_ptr) == 16

    def test_loss_decreases(self):
        cfg, mcfg, tx, st, step_fn = self._setup()
        batch = make_batch(np.random.default_rng(0), 1, 16, 16, mcfg.vocab_size)
        losses_seen = []
        for i in range(30):
            st, stats = step_fn(st, batch, jax.random.key(1))
            losses_seen.append(float(stats["loss"]))
        assert losses_seen[-1] < losses_seen[1]
        assert np.isfinite(losses_seen).all()


class TestPerParamGradNorms:
    def test_logged_and_consistent_with_global(self):
        cfg = tiny_cfg(contrastive_mode="inbatch",
                       log_param_grad_norms=True)
        mcfg = tiny_mcfg()
        tx = optim.make_optimizer(cfg)
        st = statelib.create_inbatch_state(jax.random.key(0), cfg, mcfg, tx)
        step_fn = jax.jit(steps.make_inbatch_step(cfg, mcfg, tx))
        batch = make_batch(np.random.default_rng(0), 1, 8, 16,
                           mcfg.vocab_size)
        _, stats = step_fn(st, batch, jax.random.key(1))
        per = {k: float(v) for k, v in stats.items()
               if k.startswith("grad_norms/")}
        n_leaves = len(jax.tree.leaves(st.params))
        assert len(per) == n_leaves
        # sum of squares of per-param norms == global norm squared
        total = np.sqrt(sum(v ** 2 for v in per.values()))
        np.testing.assert_allclose(total, float(stats["grad_norm"]),
                                   rtol=1e-5)


class TestShardedEquivalence:
    """The pjit-sharded step must produce the same numbers as the
    single-device step — this is the test that the implicit collectives
    reproduce the reference's hand-written NCCL semantics."""

    @pytest.mark.parametrize("mode", ["inbatch", "moco"])
    @pytest.mark.slow
    def test_sharded_matches_single_device(self, mode):
        assert len(jax.devices()) == 8, "conftest must provide 8 cpu devices"
        cfg = tiny_cfg(contrastive_mode=mode)
        mcfg = tiny_mcfg()
        tx = optim.make_optimizer(cfg)
        if mode == "moco":
            st = statelib.create_moco_state(jax.random.key(0), cfg, mcfg, tx)
            fn = steps.make_moco_step(cfg, mcfg, tx)
        else:
            st = statelib.create_inbatch_state(jax.random.key(0), cfg, mcfg, tx)
            fn = steps.make_inbatch_step(cfg, mcfg, tx)
        batch = make_batch(np.random.default_rng(0), 2, 16, 16, mcfg.vocab_size)
        rng = jax.random.key(3)

        # single device
        st_s, stats_s = jax.jit(fn)(st, batch, rng)

        # 8-device mesh, batch sharded over data axis, state replicated
        m = meshlib.make_mesh()
        st_m = meshlib.replicate(m, st)
        batch_m = meshlib.shard_microbatches(m, batch)
        st_p, stats_p = jax.jit(fn)(st_m, batch_m, rng)

        np.testing.assert_allclose(float(stats_p["loss"]),
                                   float(stats_s["loss"]), rtol=1e-5)
        params_s = st_s.params_q if mode == "moco" else st_s.params
        params_p = st_p.params_q if mode == "moco" else st_p.params
        for a, b in zip(jax.tree.leaves(params_s), jax.tree.leaves(params_p)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)
        if mode == "moco":
            np.testing.assert_allclose(np.asarray(st_p.queue),
                                       np.asarray(st_s.queue),
                                       rtol=2e-4, atol=2e-5)

    def test_tensor_parallel_forward(self):
        """model-axis sharding of the encoder produces the same
        embeddings (TP capability beyond the reference)."""
        from czechtriever_tpu.models.contriever import encode
        from jax.sharding import NamedSharding, PartitionSpec as P

        mcfg = tiny_mcfg()
        params = bert.init_params(jax.random.key(0), mcfg)
        ids = jnp.array(np.random.default_rng(0).integers(
            5, mcfg.vocab_size, (8, 16)).astype(np.int32))
        mask = jnp.ones_like(ids)
        ref = np.asarray(encode(params, mcfg, ids, mask))

        m = meshlib.make_mesh(data=4, model=2)
        specs = bert.partition_specs(mcfg)
        params_tp = jax.tree.map(
            lambda p, s: jax.device_put(p, NamedSharding(m, s)),
            params, specs)
        ids_m = jax.device_put(ids, NamedSharding(m, P("data", None)))
        mask_m = jax.device_put(mask, NamedSharding(m, P("data", None)))
        out = np.asarray(encode(params_tp, mcfg, ids_m, mask_m))
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


class TestPlaceState:
    """statelib.place_state — the one mesh-placement path shared by the
    Trainer and dryrun_multichip: replicate on DP meshes, Megatron-TP
    shard over the model axis otherwise (teacher included — the layout
    the 9B reference teacher needs, distill.py:504-509)."""

    def _tiny_tcfg(self):
        from czechtriever_tpu.models import gemma
        return gemma.GemmaConfig(
            vocab_size=211, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=8,
            intermediate_size=64, max_position_embeddings=64,
            query_pre_attn_scalar=8.0, sliding_window=8, dtype="float32")

    def test_tp_gemma_teacher_forward_parity(self):
        """TP-sharded gemma.encode == replicated (GQA kv=2 over model=2)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from czechtriever_tpu.models import gemma

        tcfg = self._tiny_tcfg()
        params = gemma.init_params(jax.random.key(0), tcfg)
        ids = jnp.array(np.random.default_rng(0).integers(
            5, tcfg.vocab_size, (8, 16)).astype(np.int32))
        mask = jnp.ones_like(ids)
        ref = np.asarray(gemma.encode(params, tcfg, ids, mask))

        m = meshlib.make_mesh(data=4, model=2)
        specs = gemma.partition_specs(tcfg)
        params_tp = jax.tree.map(
            lambda p, s: jax.device_put(p, NamedSharding(m, s)),
            params, specs)
        ids_m = jax.device_put(ids, NamedSharding(m, P("data", None)))
        mask_m = jax.device_put(mask, NamedSharding(m, P("data", None)))
        out = np.asarray(gemma.encode(params_tp, tcfg, ids_m, mask_m))
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)

    def test_distill_state_shardings(self):
        """place_state on a (4,2) mesh: student + teacher layer weights
        sharded over 'model', queue/step replicated, opt moments inherit
        the param sharding."""
        mcfg = tiny_mcfg()
        tcfg = self._tiny_tcfg()
        cfg = tiny_cfg(contrastive_mode="distill", distill_weight=0.5)
        tx = optim.make_optimizer(cfg)
        st = statelib.create_distill_state(jax.random.key(0), cfg, mcfg,
                                           tcfg, tx)
        m = meshlib.make_mesh(data=4, model=2)
        st = statelib.place_state(m, st, mcfg, tx, tcfg=tcfg)

        def spec_of(x):
            return tuple(x.sharding.spec)

        assert "model" in spec_of(st.params_q["layers"]["q_kernel"])
        assert "model" in spec_of(st.params_k["layers"]["ffn_in_kernel"])
        assert "model" in spec_of(st.params_t["layers"]["gate_kernel"])
        assert "model" in spec_of(st.params_t["layers"]["o_kernel"])
        assert spec_of(st.queue) == ()
        # adam moments of a sharded param are sharded the same way:
        # every opt-state leaf with q_kernel's shape is a moment of it
        qshape = st.params_q["layers"]["q_kernel"].shape
        moments = [x for x in jax.tree.leaves(st.opt_state)
                   if getattr(x, "shape", None) == qshape]
        assert moments, "no adam moments with q_kernel's shape"
        assert all("model" in tuple(x.sharding.spec) for x in moments)

    def test_distill_step_tp_parity(self):
        """One full distill step with TP student + TP gemma teacher ==
        the single-device run (the dryrun's subcheck 2, in-suite)."""
        from czechtriever_tpu.training import distill as distill_lib

        mcfg = tiny_mcfg()
        tcfg = self._tiny_tcfg()
        # eps=1e-3: adam's rsqrt(v)+eps amplifies reduction-order noise
        # on near-zero grads into sign flips of the whole lr-sized
        # update; a fat eps keeps the update ∝ grad so TP-vs-single
        # deltas stay at f32 noise scale instead of ~lr
        cfg = tiny_cfg(contrastive_mode="distill", distill_weight=0.5,
                       queue_dtype="float32", eps=1e-3)
        tx = optim.make_optimizer(cfg)
        batch = make_batch(np.random.default_rng(0), 2, 8, 16,
                           mcfg.vocab_size)
        step_fn = jax.jit(distill_lib.make_distill_step(cfg, mcfg, tcfg, tx))

        outs = []
        for data, model in ((4, 2), (1, 1)):
            m = meshlib.make_mesh(
                data=data, model=model,
                devices=jax.devices()[:data * model])
            st = statelib.create_distill_state(jax.random.key(1), cfg,
                                               mcfg, tcfg, tx)
            st = statelib.place_state(m, st, mcfg, tx, tcfg=tcfg)
            b = meshlib.shard_microbatches(m, batch)
            st2, stats = step_fn(st, b, jax.random.key(2))
            outs.append((st2, stats))
        (st_tp, stats_tp), (st_1, stats_1) = outs
        np.testing.assert_allclose(float(stats_tp["distill_loss"]),
                                   float(stats_1["distill_loss"]),
                                   rtol=1e-5)
        for a, b in zip(jax.tree.leaves(st_tp.params_q),
                        jax.tree.leaves(st_1.params_q)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)

    def test_gemma_tp_uneven_heads_falls_back(self):
        """kv heads not divisible by the model axis -> teacher replicated
        (documented fallback), run still works."""
        from czechtriever_tpu.models import gemma
        tcfg = gemma.GemmaConfig(
            vocab_size=211, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=3, num_key_value_heads=3, head_dim=8,
            intermediate_size=64, max_position_embeddings=64,
            query_pre_attn_scalar=8.0, sliding_window=8, dtype="float32")
        assert statelib._teacher_specs(tcfg, 2) is None


class TestMesh:
    def test_make_mesh_shapes(self):
        m = meshlib.make_mesh()
        assert m.devices.shape == (8, 1)
        m2 = meshlib.make_mesh(data=2, model=4)
        assert m2.devices.shape == (2, 4)
        with pytest.raises(AssertionError):
            meshlib.make_mesh(data=3, model=3)

    def test_is_main(self):
        assert meshlib.is_main()
        assert meshlib.process_count() == 1


class TestEmaEveryStep:
    @pytest.mark.slow  # >15s on the CPU backend
    def test_final_key_params_identical(self):
        """One momentum^A update == A sequential momentum updates when
        params_q is fixed (exact identity); only the per-microbatch keys
        differ, so params_k after the step must match exactly-ish."""
        cfg_a = tiny_cfg()
        cfg_b = tiny_cfg(ema_every_step=True)
        mcfg = tiny_mcfg()
        batch = make_batch(np.random.default_rng(0), 4, 8, 16,
                           mcfg.vocab_size)
        rng = jax.random.key(1)
        outs = {}
        for name, cfg in (("seq", cfg_a), ("hoist", cfg_b)):
            tx = optim.make_optimizer(cfg)
            st = statelib.create_moco_state(jax.random.key(0), cfg, mcfg,
                                            tx)
            fn = jax.jit(steps.make_moco_step(cfg, mcfg, tx))
            st2, stats = fn(st, batch, rng)
            outs[name] = (st2, stats)
        for a, b in zip(jax.tree.leaves(outs["seq"][0].params_k),
                        jax.tree.leaves(outs["hoist"][0].params_k)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
        # losses differ only through the slightly different key params
        assert abs(float(outs["seq"][1]["loss"])
                   - float(outs["hoist"][1]["loss"])) < 0.5


@pytest.mark.slow
class TestGradCache:
    """GradCache InBatch: full-target-batch negatives at microbatch
    memory (arXiv:2406.12356)."""

    def test_equals_single_pass_full_batch(self):
        """With dropout off, A microbatches under gradcache must produce
        exactly the same update as one A*B batch through the plain
        InBatch step (that is the whole point of the method)."""
        mcfg = tiny_mcfg(dropout=0.0)
        cfg = tiny_cfg(contrastive_mode="inbatch_gradcache")
        tx = optim.make_optimizer(cfg)
        st0 = statelib.create_inbatch_state(jax.random.key(0), cfg, mcfg, tx)

        A, B, L = 4, 4, 16
        batch = make_batch(np.random.default_rng(0), A, B, L,
                           mcfg.vocab_size)
        rng = jax.random.key(5)

        gc_fn = jax.jit(steps.make_inbatch_gradcache_step(cfg, mcfg, tx))
        st_gc, stats_gc = gc_fn(st0, batch, rng)

        # one flat batch of A*B through the plain step
        flat = {k: v.reshape(1, A * B, L) for k, v in batch.items()}
        plain_fn = jax.jit(steps.make_inbatch_step(cfg, mcfg, tx))
        st_pl, stats_pl = plain_fn(st0, flat, rng)

        np.testing.assert_allclose(float(stats_gc["loss"]),
                                   float(stats_pl["loss"]), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(st_gc.params),
                        jax.tree.leaves(st_pl.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-6)

    def test_negatives_cross_microbatches(self):
        """The gradcache loss must see A*B-way scores (the plain
        accumulated step only sees B-way per microbatch)."""
        mcfg = tiny_mcfg(dropout=0.0)
        cfg = tiny_cfg(contrastive_mode="inbatch_gradcache",
                       temperature=1.0)
        tx = optim.make_optimizer(cfg)
        st0 = statelib.create_inbatch_state(jax.random.key(0), cfg, mcfg, tx)
        A, B = 4, 4
        batch = make_batch(np.random.default_rng(1), A, B, 16,
                           mcfg.vocab_size)
        gc_fn = jax.jit(steps.make_inbatch_gradcache_step(cfg, mcfg, tx))
        _, stats_gc = gc_fn(st0, batch, jax.random.key(2))
        plain_fn = jax.jit(steps.make_inbatch_step(cfg, mcfg, tx))
        _, stats_pl = plain_fn(st0, batch, jax.random.key(2))
        # random-init CE ~= log(n_classes): 16-way vs 4-way
        assert float(stats_gc["loss"]) > float(stats_pl["loss"]) + 0.5

    def test_trainer_mode_wired(self, ):
        from czechtriever_tpu.training.trainer import Trainer
        cfg = tiny_cfg(contrastive_mode="inbatch_gradcache",
                       target_batch_size=32, per_device_batch_size=2,
                       total_steps=2, log_freq=1, eval_freq=0, save_freq=0,
                       donate_state=False)
        t = Trainer(cfg, tiny_mcfg())
        gen_rng = np.random.default_rng(0)

        def epoch():
            for _ in range(40):
                ids = gen_rng.integers(5, 211, (2, t.global_micro, 16)
                                       ).astype(np.int32)
                mask = np.ones((t.global_micro, 16), np.int32)
                yield {"q_tokens": ids[0], "q_mask": mask,
                       "k_tokens": ids[1], "k_mask": mask}

        t.fit(epoch)
        assert int(np.asarray(t.state.step)) == 2


class TestSAM:
    """Working SAM/ASAM (the reference's finetuning SAM branch
    references an optimizer it never constructs, finetuning.py:75-80)."""

    @pytest.mark.slow  # >15s on the CPU backend
    @pytest.mark.parametrize("name", ["sam", "asam"])
    def test_trains_and_differs_from_adamw(self, name):
        mcfg = tiny_mcfg()
        batch = make_batch(np.random.default_rng(0), 1, 16, 16,
                           mcfg.vocab_size)

        def run(optname, steps_n=20):
            cfg = tiny_cfg(contrastive_mode="inbatch", optim=optname,
                           rho=0.05)
            tx = optim.make_optimizer(cfg)
            st = statelib.create_inbatch_state(jax.random.key(0), cfg,
                                               mcfg, tx)
            fn = jax.jit(steps.make_inbatch_step(cfg, mcfg, tx))
            losses = []
            for _ in range(steps_n):
                st, stats = fn(st, batch, jax.random.key(1))
                losses.append(float(stats["loss"]))
            return st, losses

        st_sam, l_sam = run(name, steps_n=40)
        st_adam, l_adam = run("adamw")
        # sync_period=2: even-index losses are at the unperturbed
        # params, odd ones at the adversarial ascent points
        assert l_sam[-2] < l_sam[0]  # learns at the descent points
        # SAM alternates ascent/descent -> different trajectory
        diff = max(jax.tree.leaves(jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a - b)).max()),
            st_sam.params, st_adam.params)))
        assert diff > 1e-5

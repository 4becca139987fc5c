"""The training loop.

TPU-native rewrite of /root/reference/train.py:148-380: one jitted call
per *optimizer* step (the reference's per-microbatch Python loop with
``update_freq`` bookkeeping, train.py:227-327, collapses into the
lax.scan inside training/steps.py), with the reference's control cadence
preserved — log every ``log_freq`` steps, eval (+ ``lastlog`` save) every
``eval_freq``, ``step-N`` save every ``save_freq``, epoch-boundary
``generate_offset`` re-randomization (train.py:249), and crash-resume
from ``checkpoint/latest`` when the output dir already exists
(train.py:458-466).
"""

from __future__ import annotations

import logging
import time
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from czechtriever_tpu.config import Config
from czechtriever_tpu.models import bert
from czechtriever_tpu.parallel import mesh as meshlib
from czechtriever_tpu.training import optim, state as statelib, steps
from czechtriever_tpu.utils import checkpoint as ckpt
from czechtriever_tpu.utils.logging_utils import MetricsLogger
from czechtriever_tpu.utils.profiling import StepProfiler
from czechtriever_tpu.utils.stats import WeightedAvgStats

logger = logging.getLogger(__name__)


class Trainer:
    def __init__(self, cfg: Config, mcfg: bert.BertConfig,
                 mesh=None, init_params=None,
                 eval_hook: Optional[Callable[[object, int], Dict]] = None,
                 metrics: Optional[MetricsLogger] = None,
                 teacher_mcfg: Optional[bert.BertConfig] = None,
                 teacher_params=None, local_batches: bool = False):
        if cfg.projection_size != mcfg.hidden_size:
            # the MoCo queue holds encoder outputs, which are
            # hidden_size-dimensional (no projection head in the
            # reference either, src/moco.py:218); a stale default here
            # would fail deep inside the jitted step
            logger.warning("projection_size %d != encoder hidden_size %d;"
                           " using %d", cfg.projection_size,
                           mcfg.hidden_size, mcfg.hidden_size)
            cfg = cfg.replace(projection_size=mcfg.hidden_size)
        self.cfg = cfg
        self.mcfg = mcfg
        # trainers built programmatically (not via Config.from_args)
        # still get the persistent XLA cache; no-op if already set
        from czechtriever_tpu.config import enable_compilation_cache
        enable_compilation_cache(cfg.compilation_cache_dir)
        self.mesh = mesh if mesh is not None else meshlib.make_mesh()
        self.eval_hook = eval_hook
        self.metrics = metrics
        self.tx = optim.make_optimizer(cfg)

        # local_batches=True: epoch_factory yields only THIS process's
        # rows (per_device_batch_size x its data-axis coords) and the
        # global batch is assembled with make_array_from_process_local_data
        # — no pcount-redundant host batch prep (reference semantics:
        # DistributedSampler, train.py:187-193). False: every process
        # yields the full global batch (device_put keeps local shards).
        self.local_batches = local_batches
        _, _, n_local_coords = meshlib.data_feed_info(self.mesh)
        self.local_micro = cfg.per_device_batch_size * n_local_coords
        data_size = self.mesh.shape[meshlib.DATA_AXIS]
        global_micro = cfg.per_device_batch_size * data_size
        if cfg.target_batch_size % global_micro != 0:
            raise ValueError(
                "target_batch_size must be divisible by "
                "per_device_batch_size * data-axis size "
                f"({cfg.target_batch_size} % {global_micro})")
        self.update_freq = cfg.target_batch_size // global_micro
        self.global_micro = global_micro
        # uint16 token wire format needs every involved vocab to fit
        # (XLM-R's 250k vocab does not; distill teachers may differ)
        vocabs = [mcfg.vocab_size]
        if teacher_mcfg is not None:
            vocabs.append(teacher_mcfg.vocab_size)
        self._u16_wire = max(vocabs) < 2 ** 16

        # length-aware packing (cfg.pack_rows, data/packing.py): pack
        # each microbatch's crops into fixed row blocks just before
        # transfer. The block count is quantized to a multiple of
        # (4, data-axis size) so the jitted step sees few distinct
        # shapes AND every shape shards evenly over the mesh.
        self._pack_rows = int(getattr(cfg, "pack_rows", 0) or 0)
        if self._pack_rows % 8:
            raise ValueError(f"pack_rows must be a multiple of 8, got "
                             f"{self._pack_rows}")
        import math as _math
        # multi-process local feeds pack per process: each feed packs
        # its OWN rows into nb_local blocks (one small host allgather
        # agrees on the per-step max — the analogue of the DDP
        # allreduce every reference step already pays), and segment ids
        # carry a feed-global offset so pooling sees the concatenated
        # crop order. Single-process (and global feeding) packs the
        # whole batch directly.
        self._pack_local = bool(local_batches
                                and meshlib.process_count() > 1)
        # opt-in cross-microbatch rebalance (data/packing.py
        # rebalance_assignment): equalizes per-microbatch packed block
        # need so the rectangular [A, nb, R] stack sits at the sum
        # bound instead of the worst packing. Changes batch membership
        # (MoCo queue within-step order) — default off, see the Config
        # comment.
        self._pack_rebalance = bool(getattr(cfg, "pack_rebalance", False))
        # quantum trade-off: coarser quanta cap the number of distinct
        # [A, nb, R] compile shapes when the per-step block need
        # fluctuates (worst-of-2A packings). Under rebalance the need is
        # pinned at the stable sum bound, so quantum 2 keeps the win
        # (42 would round back to 44 under quantum 4) at ~3 shapes.
        base_q = 2 if self._pack_rebalance else 4
        self._pack_quantum = (_math.lcm(2, n_local_coords)
                              if self._pack_local
                              else _math.lcm(base_q, data_size))
        if self._pack_rows:
            # a crop can be at most max-length tokens; it must fit a block
            logger.info("packing microbatches into %d-row blocks "
                        "(quantum %d%s)", self._pack_rows,
                        self._pack_quantum,
                        ", rebalanced" if self._pack_rebalance else "")

        rng = jax.random.key(cfg.seed, impl=cfg.prng_impl)
        if cfg.contrastive_mode == "moco":
            self.state = statelib.create_moco_state(rng, cfg, mcfg, self.tx,
                                                    params=init_params)
            step_fn = steps.make_moco_step(cfg, mcfg, self.tx)
        elif cfg.contrastive_mode == "inbatch":
            self.state = statelib.create_inbatch_state(rng, cfg, mcfg, self.tx,
                                                       params=init_params)
            step_fn = steps.make_inbatch_step(cfg, mcfg, self.tx)
        elif cfg.contrastive_mode == "inbatch_gradcache":
            # full-target-batch negatives at microbatch memory
            # (beyond-reference; see make_inbatch_gradcache_step)
            self.state = statelib.create_inbatch_state(rng, cfg, mcfg, self.tx,
                                                       params=init_params)
            step_fn = steps.make_inbatch_gradcache_step(cfg, mcfg, self.tx)
        elif cfg.contrastive_mode == "distill":
            from czechtriever_tpu.training import distill as distill_lib
            if teacher_mcfg is None:
                raise ValueError("distill mode requires teacher_mcfg")
            self.state = statelib.create_distill_state(
                rng, cfg, mcfg, teacher_mcfg, self.tx, params=init_params,
                teacher_params=teacher_params)
            step_fn = distill_lib.make_distill_step(cfg, mcfg, teacher_mcfg,
                                                    self.tx)
        else:
            raise ValueError(f"unknown contrastive_mode: "
                             f"{cfg.contrastive_mode}")

        # replicate on a pure-DP mesh; TP-shard encoders (and a distill
        # teacher) over the model axis otherwise
        self._teacher_mcfg = teacher_mcfg
        self.state = statelib.place_state(self.mesh, self.state, mcfg,
                                          self.tx, tcfg=teacher_mcfg)
        donate = (0,) if cfg.donate_state else ()
        self._step_fn = jax.jit(step_fn, donate_argnums=donate)
        self._rng = jax.random.key(cfg.seed + 1, impl=cfg.prng_impl)

    # -- resume -------------------------------------------------------------
    def maybe_resume(self) -> int:
        """Restore from <save_dir>/checkpoint/latest if present."""
        path = ckpt.latest_path(self.cfg.save_dir)
        if path is None:
            return 0
        return self.resume_from(path, full=True)

    def resume_from(self, path: str, full: bool = True) -> int:
        """Restore from a checkpoint directory.

        full=True: the whole train state — params, EMA/queue, optimizer
        moments, step (reference utils.load reset_params=False,
        src/utils.py:74-93; the --continue_training path,
        train.py:468-476). full=False: model state only (params /
        params_q / params_k / queue), fresh optimizer, step 0 — the
        reference's warm-start-from-model_path default (reset_params=True,
        step=0, train.py:472-476)."""
        # restore template: shapes/dtypes only — np.asarray(self.state)
        # would read the ~2 GB freshly-initialized state back from the
        # device (measured 66 s over a tunneled chip) just to overwrite
        # every leaf with the checkpoint
        host_state = jax.tree.map(
            lambda x: np.zeros(x.shape, x.dtype), self.state)
        restored, _ = ckpt.load(host_state, path)
        if full:
            new_state = restored
            step = int(np.asarray(restored.step))
        else:
            model_fields = [n for n in ("params", "params_q", "params_k",
                                        "queue", "queue_ptr")
                            if hasattr(restored, n)]
            new_state = self.state.replace(
                **{n: getattr(restored, n) for n in model_fields})
            step = 0
        self.state = statelib.place_state(self.mesh, new_state, self.mcfg,
                                          self.tx, tcfg=self._teacher_mcfg)
        logger.info("Resumed from %s at step %d (%s)", path, step,
                    "full state" if full else "model weights only")
        return step

    def save(self, name: str) -> None:
        # every process calls in: ckpt.save is collective under
        # multi-process orbax (is_main gating would deadlock its
        # barrier); single-process it degenerates to a plain save
        ckpt.save(self.state, self.cfg, self.cfg.save_dir, name,
                  async_save=bool(getattr(self.cfg, "async_save", False)))

    @property
    def encoder_params(self):
        return (self.state.params_q if hasattr(self.state, "params_q")
                else self.state.params)

    def _rebalance_micros(self, micro_batches):
        """Reassign (q, k) pairs across this step's microbatches so every
        packing lands at the sum bound (packing.rebalance_assignment).
        Pairs move jointly (every [B, ...] row-aligned array is permuted
        with the same index), so seg j still names one pair; only WHICH
        microbatch a pair shares with others changes. Multi-process
        local feeds rebalance their own pairs (no cross-process moves)."""
        from czechtriever_tpu.data import packing
        A = len(micro_batches)
        B = micro_batches[0]["q_mask"].shape[0]
        q_lens = np.concatenate(
            [m["q_mask"].astype(np.int64).sum(axis=1) for m in micro_batches])
        k_lens = np.concatenate(
            [m["k_mask"].astype(np.int64).sum(axis=1) for m in micro_batches])
        bins = packing.rebalance_assignment(q_lens, k_lens, A, B)
        flat = {}
        for key in micro_batches[0]:
            vals = [m[key] for m in micro_batches]
            if (isinstance(vals[0], np.ndarray)
                    and vals[0].ndim >= 1 and vals[0].shape[0] == B):
                flat[key] = np.concatenate(vals, axis=0)
        out = []
        for a in range(A):
            m = dict(micro_batches[a])
            for key, arr in flat.items():
                m[key] = arr[bins[a]]
            out.append(m)
        return out

    def _pack_micros(self, micro_batches):
        """Pack every microbatch's q/k crops into [nb, R] row blocks
        (data/packing.py). nb is the quantized max over all 2A packings
        so the step's [A, nb, R] stack is one static shape that shards
        evenly; packing stays within each microbatch, so batch
        membership (and the dropout-0 loss) is unchanged."""
        from czechtriever_tpu.data import packing
        R = self._pack_rows
        if self._pack_rebalance and len(micro_batches) > 1:
            micro_batches = self._rebalance_micros(micro_batches)
        need = 0
        lens = {}
        for i, m in enumerate(micro_batches):
            for p in ("q", "k"):
                ln = m[f"{p}_mask"].astype(np.int64).sum(axis=1)
                lens[(i, p)] = ln
                need = max(need, packing.blocks_needed(ln, R))
        if self._pack_local:
            # per-feed packing: agree on the block count (max over all
            # feeds' needs) so every process's [A, nb, R] local arrays
            # assemble into one rectangular global batch
            from jax.experimental import multihost_utils
            needs = np.asarray(multihost_utils.process_allgather(
                np.asarray([need], np.int32))).reshape(-1)
            need = int(needs.max())
            feed_id, _, _ = meshlib.data_feed_info(self.mesh)
            seg_offset = feed_id * self.local_micro
        else:
            seg_offset = 0
        nb = packing.quantize_blocks(need, self._pack_quantum)
        out = []
        for i, m in enumerate(micro_batches):
            d = {}
            for p in ("q", "k"):
                seqs = [m[f"{p}_tokens"][j, :n]
                        for j, n in enumerate(lens[(i, p)])]
                t, s, po, ln = packing.pack_sequences(seqs, R, nb)
                if seg_offset:
                    # feed-global crop ids: pooling runs over the
                    # concatenated batch, feed f owns rows
                    # [f*local_micro, (f+1)*local_micro)
                    s = np.where(s >= 0, s + seg_offset, s)
                d.update({f"{p}_tokens": t, f"{p}_seg": s,
                          f"{p}_pos": po, f"{p}_lens": ln})
            out.append(d)
        return out

    # -- core ---------------------------------------------------------------
    def _device_batch(self, micro_batches):
        if (self._pack_rows and "q_mask" in micro_batches[0]
                and "t_tokens" not in micro_batches[0]):
            # distill batches (t_*) keep the unpacked layout: the
            # teacher consumes fixed-length re-tokenized prompts
            micro_batches = self._pack_micros(micro_batches)
        keep = ("q_tokens", "q_mask", "k_tokens", "k_mask",
                "t_tokens", "t_mask",  # t_*: distill teacher tokens
                "q_seg", "q_pos", "q_lens",  # packed layout
                "k_seg", "k_pos", "k_lens")
        stacked = {k: np.stack([m[k] for m in micro_batches])
                   for k in micro_batches[0] if k in keep}
        # narrow wire dtypes: token ids fit uint16 when the vocab does
        # (Czert: 30522) and masks are 0/1 — a 4x smaller host->device
        # transfer (~8.4 -> 2.1 MB/step at B=32 x accum 8, L=256).
        # bert.forward widens them back on device. Packed aux arrays ride
        # int16 (seg needs the -1 sentinel, so unsigned won't do).
        if self._u16_wire:
            for k, v in stacked.items():
                if k.endswith(("_seg", "_pos", "_lens")):
                    if k.endswith("_seg") and self.global_micro >= 2 ** 15:
                        continue  # feed-global crop ids overflow int16
                    stacked[k] = v.astype(np.int16)
                else:
                    stacked[k] = v.astype(
                        np.uint8 if k.endswith("_mask") else np.uint16)
        if self.local_batches and "q_seg" not in stacked:
            rows = next(iter(stacked.values())).shape[1]
            if rows != self.local_micro:
                raise ValueError(
                    f"local_batches mode expects {self.local_micro} rows "
                    f"per microbatch on this process, got {rows}")
            return meshlib.global_from_local_microbatches(self.mesh, stacked)
        if self._pack_local and "q_seg" in stacked:
            # packed local feeds: dim 1 is this feed's nb_local blocks
            # (crop-count checks live in _pack_micros; the block count
            # was agreed across feeds there)
            return meshlib.global_from_local_microbatches(self.mesh, stacked)
        # packed single-process: local rows ARE the global rows —
        # plain sharding applies
        return meshlib.shard_microbatches(self.mesh, stacked)

    def train_step(self, micro_batches) -> Dict[str, float]:
        batch = self._device_batch(micro_batches)
        self.state, stats = self._step_fn(self.state, batch, self._rng)
        return stats

    def fit(self, epoch_factory: Callable[[], Iterable[Dict[str, np.ndarray]]],
            on_epoch_start: Optional[Callable[[], None]] = None) -> None:
        """Run to cfg.total_steps. ``epoch_factory()`` yields microbatches
        of global size per_device_batch_size * data_axis."""
        cfg = self.cfg
        step = int(np.asarray(self.state.step))
        run_stats = WeightedAvgStats()
        pending_stats = []
        epoch = 0
        t_last = time.perf_counter()
        # initial eval before step 1, matching reference train.py:218-244
        if step == 0 and self.eval_hook is not None:
            self.eval_hook(self, step)
        profiler = StepProfiler(cfg.profile_dir, cfg.profile_start_step,
                                cfg.profile_steps)
        while step < cfg.total_steps:
            if on_epoch_start is not None:
                on_epoch_start()
            logger.info("Start epoch %d", epoch)
            steps_this_epoch = 0

            # device-batch prefetch: group microbatches to update_freq and
            # run the host->device transfer in a background thread, one
            # optimizer step ahead — H2D (and its dispatch latency, which
            # dominates on a tunneled chip) overlaps the previous step's
            # device compute instead of serializing with it
            def device_groups():
                micro_acc = []
                for mb in epoch_factory():
                    micro_acc.append(mb)
                    if len(micro_acc) == self.update_freq:
                        yield self._device_batch(micro_acc)
                        micro_acc = []

            from czechtriever_tpu.data.datasets import _Prefetcher
            batches = (iter(_Prefetcher(device_groups, depth=2))
                       if cfg.device_prefetch else device_groups())
            for batch in batches:
                profiler.maybe_start(step)
                self.state, stats = self._step_fn(self.state, batch,
                                                  self._rng)
                step += 1
                steps_this_epoch += 1
                profiler.maybe_stop(step)
                # defer the scalar readback to the log boundary: float()
                # here would block the host on device completion EVERY
                # step, serializing host batch-prep with device compute
                # (measured 297 -> 430+ pairs/s end-to-end on the v5e
                # tunnel). The stats stay as device arrays; jax keeps
                # dispatching ahead.
                pending_stats.append(stats)

                if step % cfg.log_freq == 0:
                    # one batched transfer for the whole window, not one
                    # blocking readback per scalar
                    for st in jax.device_get(pending_stats):
                        run_stats.update_means(
                            {k: float(v) for k, v in st.items()},
                            self.global_micro)
                    pending_stats = []
                    avg = run_stats.average_stats
                    dt = time.perf_counter() - t_last
                    sps = cfg.log_freq * cfg.target_batch_size / dt
                    t_last = time.perf_counter()
                    msg = f"{step} / {cfg.total_steps}"
                    for k, v in sorted(avg.items()):
                        msg += f" | {k}: {v:.3f}"
                    msg += f" | pairs/s: {sps:.1f}"
                    logger.info(msg)
                    if self.metrics:
                        self.metrics.log(step, avg, prefix="train")
                        self.metrics.log(step, {"pairs_per_s": sps}, "train")
                    run_stats.reset()

                if cfg.eval_freq and step % cfg.eval_freq == 0 and step > 0:
                    if self.eval_hook is not None:
                        self.eval_hook(self, step)
                    self.save("lastlog")

                if cfg.save_freq and step % cfg.save_freq == 0 and step > 0:
                    self.save(f"step-{step}")

                if step >= cfg.total_steps:
                    break
            if steps_this_epoch == 0:
                raise RuntimeError(
                    "Epoch produced zero optimizer steps: the dataset "
                    f"yielded fewer than update_freq={self.update_freq} "
                    "microbatches. Shrink target_batch_size or grow the "
                    "training data.")
            epoch += 1
        profiler.close()
        # commit any in-flight async save before returning — callers
        # (final save, eval-from-latest) must see a flipped `latest`
        ckpt.wait_pending()
        self._log_peak_memory()

    def _log_peak_memory(self) -> None:
        """One line of device-memory accounting at run end (the TPU
        runtime tracks peak HBM; CPU backends return no stats)."""
        try:
            ms = jax.local_devices()[0].memory_stats() or {}
        except Exception:  # backend without memory introspection
            return
        peak = ms.get("peak_bytes_in_use")
        limit = ms.get("bytes_limit")
        if peak:
            extra = f" of {limit / 1e9:.1f} GB limit" if limit else ""
            logger.info("Peak device memory: %.2f GB%s", peak / 1e9, extra)

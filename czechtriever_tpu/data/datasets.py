"""Dataset abstractions and the batch pipeline feeding the train step.

Covers the reference's dataset zoo (/root/reference/src/data.py):

  * ``InMemoryDataset``  — reference ``Dataset`` (:462-508): list of
    tokenized docs, per-sample 256-token window then two crops.
  * ``MultiDataset``     — mixture with sampling prob ∝ len^coeff (:423-447).
  * ``PairBatcher``      — streaming pipeline: TokenStream chunks ->
    crop/augment pairs -> fixed-shape batches, with a background
    prefetch thread replacing torch DataLoader workers (train.py:195-202).
  * ``DistillBatcher``   — single-crop query batches for distillation
    (reference ``DistillDataset`` :211-285).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from czechtriever_tpu.data import augment
from czechtriever_tpu.data.collator import PairCollator, pad_batch
from czechtriever_tpu.data.tokenstream import TokenStream


class AugmentSpec:
    """The crop/augment hyperparameters threaded through the pipeline."""

    def __init__(self, *, ratio_min: float, ratio_max: float,
                 augmentation: str = "none", prob_augmentation: float = 0.0,
                 bos_token_id: Optional[int] = None,
                 eos_token_id: Optional[int] = None, mask_id: int = 0,
                 start_id: int = 0, vocab_size: int = 0):
        self.ratio_min = ratio_min
        self.ratio_max = ratio_max
        self.augmentation = augmentation
        self.prob_augmentation = prob_augmentation
        self.bos_token_id = bos_token_id
        self.eos_token_id = eos_token_id
        self.mask_id = mask_id
        self.start_id = start_id
        self.vocab_size = vocab_size

    @classmethod
    def from_config(cls, cfg, tokenizer=None) -> "AugmentSpec":
        bos = getattr(tokenizer, "bos_token_id", None) if tokenizer else None
        eos = getattr(tokenizer, "eos_token_id", None) if tokenizer else None
        mask_id = getattr(tokenizer, "mask_token_id", 0) if tokenizer else 0
        vocab = getattr(tokenizer, "vocab_size", 0) if tokenizer else 0
        return cls(ratio_min=cfg.ratio_min, ratio_max=cfg.ratio_max,
                   augmentation=cfg.augmentation,
                   prob_augmentation=cfg.prob_augmentation,
                   bos_token_id=bos, eos_token_id=eos, mask_id=mask_id or 0,
                   vocab_size=vocab or 0)

    def make_pair(self, tokens: np.ndarray, rng: np.random.Generator):
        q, k = augment.build_pair(
            tokens, ratio_min=self.ratio_min, ratio_max=self.ratio_max,
            augmentation=self.augmentation,
            prob_augmentation=self.prob_augmentation,
            bos_token_id=self.bos_token_id, eos_token_id=self.eos_token_id,
            rng=rng, mask_id=self.mask_id, start_id=self.start_id,
            vocab_size=self.vocab_size)
        return {"q_tokens": q, "k_tokens": k}


class InMemoryDataset:
    """Reference ``Dataset`` semantics (src/data.py:462-508): docs are
    pre-tokenized int arrays; each sample takes a random chunk_length
    window of one doc, then builds an augmented crop pair."""

    def __init__(self, docs: Sequence[np.ndarray], chunk_length: int,
                 spec: AugmentSpec, seed: int = 0):
        self.docs = [np.asarray(d, dtype=np.int32) for d in docs]
        self.chunk_length = chunk_length
        self.spec = spec
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.docs)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        doc = self.docs[index]
        start = self.rng.integers(0, max(0, len(doc) - self.chunk_length) + 1)
        tokens = doc[start:start + self.chunk_length]
        return self.spec.make_pair(tokens, self.rng)

    def get_passage_from_all_docs(self) -> List[np.ndarray]:
        """Random augmented crop of every doc — the val-corpus builder
        (src/data.py:495-508)."""
        out = []
        for doc in self.docs:
            start = self.rng.integers(
                0, max(0, len(doc) - self.chunk_length) + 1)
            tokens = doc[start:start + self.chunk_length]
            crop = augment.random_crop(tokens, self.spec.ratio_min,
                                       self.spec.ratio_max, self.rng)
            crop = augment.apply_augmentation(
                crop, self.spec.augmentation, self.spec.prob_augmentation,
                self.rng, mask_id=self.spec.mask_id,
                start_id=self.spec.start_id, vocab_size=self.spec.vocab_size)
            out.append(augment.add_bos_eos(crop, self.spec.bos_token_id,
                                           self.spec.eos_token_id))
        return out


def load_tokenized_jsonl(path: str, tokenizer, normalize_text: bool = False,
                         maxload: Optional[int] = None) -> List[np.ndarray]:
    """Fully tokenize a jsonl corpus into int32 doc arrays — the
    reference's in-memory multi-corpus ingestion (``tokenize_jsonl_file``,
    src/data.py:27-54: whole file, no special tokens, optional
    normalization)."""
    import json

    from czechtriever_tpu.data.normalize_text import normalize as norm_fn
    docs: List[np.ndarray] = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            text = json.loads(line)["text"]
            if normalize_text:
                text = norm_fn(text)
            ids = tokenizer.encode(text, add_special_tokens=False)
            if len(ids) > 1:
                docs.append(np.asarray(ids, np.int32))
            if maxload and len(docs) >= maxload:
                break
    return docs


class StreamChunkDataset:
    """Random-access indexed view over a uint16 binary token stream (the
    TokenStream file format) — lets a flat-file corpus join a
    ``MultiDataset`` mixture without loading it into RAM. Item i is the
    i-th chunk_length window (plus the epoch offset) turned into an
    augmented crop pair; ``generate_offset`` re-randomizes the epoch
    offset (src/data.py:353-354 semantics)."""

    def __init__(self, path: str, chunk_length: int, spec: AugmentSpec,
                 total_tokens: Optional[int] = None, seed: int = 0):
        self.tokens = np.memmap(path, dtype="<u2", mode="r")
        if total_tokens:
            self.tokens = self.tokens[:total_tokens]
        self.chunk_length = chunk_length
        self.spec = spec
        self.rng = np.random.default_rng(seed)
        self.offset = 0

    def __len__(self) -> int:
        return (len(self.tokens) - self.offset) // self.chunk_length

    def generate_offset(self) -> None:
        self.offset = int(self.rng.integers(0, self.chunk_length))

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        s = self.offset + index * self.chunk_length
        chunk = np.asarray(self.tokens[s:s + self.chunk_length], np.int32)
        return self.spec.make_pair(chunk, self.rng)


class MultiDataset:
    """Dataset mixture, sampling prob ∝ len^coeff (src/data.py:423-447)."""

    def __init__(self, datasets: Dict[str, InMemoryDataset], seed: int = 0):
        self.datasets = datasets
        self.dataset_ids = list(datasets.keys())
        self.prob = np.full(len(datasets), 1.0 / max(1, len(datasets)))
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return sum(len(d) for d in self.datasets.values())

    def set_prob(self, coeff: float = 0.0) -> None:
        prob = np.array([float(len(d)) for d in self.datasets.values()])
        prob /= prob.sum()
        prob = prob ** coeff
        self.prob = prob / prob.sum()

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        di = self.rng.choice(len(self.prob), p=self.prob)
        did = self.dataset_ids[di]
        ds = self.datasets[did]
        sample = ds[int(self.rng.integers(0, len(ds)))]
        sample["dataset_id"] = did
        return sample

    def get_passage_from_all_docs(self) -> List[np.ndarray]:
        out: List[np.ndarray] = []
        for ds in self.datasets.values():
            out.extend(ds.get_passage_from_all_docs())
        return out

    def generate_offset(self) -> None:
        """Epoch-boundary re-randomization, delegated to stream-backed
        members (InMemoryDataset re-crops per access anyway)."""
        for ds in self.datasets.values():
            if hasattr(ds, "generate_offset"):
                ds.generate_offset()


class _Prefetcher:
    """Background-thread batch producer (replaces torch DataLoader
    workers, train.py:195-202). Bounded queue -> backpressure."""

    def __init__(self, gen_fn, depth: int = 4):
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._done = object()
        self._error = None
        self._thread = threading.Thread(target=self._run, args=(gen_fn,),
                                        daemon=True)
        self._thread.start()

    def _run(self, gen_fn):
        try:
            for item in gen_fn():
                self._q.put(item)
        except BaseException as e:  # propagate to the consumer thread
            self._error = e
        finally:
            self._q.put(self._done)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._done:
                if self._error is not None:
                    raise self._error
                return
            yield item


def _crop_max_length(stream, spec, n_special: int) -> int:
    """Static-shape equivalent of the reference's pad-to-longest
    (src/data.py:563-573): crops are at most ratio_max * chunk_length
    tokens (augmentations only ever shorten), so padding to the full
    chunk length would double the FFN/projection work per pair at the
    default 0.1-0.5 crop ratios. Rounded to the 8-row sublane so the
    matmul M dim stays tile-aligned."""
    crop_max = int(stream.chunk_length * min(spec.ratio_max, 1.0))
    ml = -(-(max(crop_max, 1) + n_special) // 8) * 8
    return min(ml, stream.chunk_length + n_special)


class PairBatcher:
    """TokenStream -> fixed-shape contrastive pair batches.

    One epoch = one pass over the (sharded, shuffled) stream. Batches are
    dicts of int32 arrays with static shapes [B, max_length].
    """

    def __init__(self, stream: TokenStream, spec: AugmentSpec,
                 batch_size: int, max_length: Optional[int] = None,
                 seed: int = 0, prefetch: int = 4,
                 use_native: Optional[bool] = None, num_threads: int = 4):
        self.stream = stream
        self.spec = spec
        self.batch_size = batch_size
        n_special = (spec.bos_token_id is not None) + (spec.eos_token_id is not None)
        self.max_length = (max_length if max_length is not None
                           else _crop_max_length(stream, spec,
                                                 n_special))
        self.collator = PairCollator(self.max_length)
        self.rng = np.random.default_rng(seed)
        self.seed = seed
        self.prefetch = prefetch
        self.num_threads = num_threads
        # native C++ crop/augment path (native/pairgen.cpp): one
        # multithreaded call per batch instead of a per-example loop
        if use_native is None:
            from czechtriever_tpu.data import native_loader
            use_native = native_loader.available()
        self.use_native = use_native
        self._batch_counter = 0

    def _epoch(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.use_native:
            from czechtriever_tpu.data import native_loader
            chunks: list = []
            for chunk in self.stream:
                chunks.append(chunk)
                if len(chunks) == self.batch_size:
                    self._batch_counter += 1
                    yield native_loader.build_pair_batch(
                        np.stack(chunks), self.spec,
                        seed=self.seed * 1_000_003 + self._batch_counter,
                        max_length=self.max_length,
                        num_threads=self.num_threads)
                    chunks = []
            return
        examples = []
        for chunk in self.stream:
            examples.append(self.spec.make_pair(chunk, self.rng))
            if len(examples) == self.batch_size:
                yield self.collator(examples)
                examples = []
        # drop last partial batch: static shapes require full batches

    def epoch(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.prefetch > 0:
            return iter(_Prefetcher(self._epoch, depth=self.prefetch))
        return self._epoch()


def get_detailed_instruct(task_description: str, query: str) -> str:
    """Teacher instruction prompt (distill.py:55-56)."""
    return f"<instruct>{task_description}\n<query>{query}"


DISTILL_TASK = ("Given a web search query, retrieve relevant passages "
                "that answer the query.")  # distill.py:404


def make_teacher_retokenizer(student_tokenizer, teacher_tokenizer,
                             task_description: str = DISTILL_TASK,
                             max_length: int = 512):
    """Batch transform adding ``t_tokens``/``t_mask``: decode the student
    query tokens back to text and re-tokenize with the teacher tokenizer
    plus the instruction prompt (distill.py:395-405). Use when the
    teacher has its own vocabulary; without it the distill step feeds the
    student's q_tokens to the teacher. Pads to the *fixed* ``max_length``
    (the reference pads to the batch max with pad_to_multiple_of=8,
    which would recompile the jitted step per unique length)."""
    from czechtriever_tpu.data.collator import pad_batch

    def transform(batch):
        texts = [student_tokenizer.decode(
            [int(t) for t, m in zip(ids, mask) if m],
            skip_special_tokens=True)
            for ids, mask in zip(batch["q_tokens"], batch["q_mask"])]
        prompts = [get_detailed_instruct(task_description, t)
                   for t in texts]
        seqs = [np.asarray(teacher_tokenizer.encode(
            p, max_length=max_length, truncation=True), np.int32)
            for p in prompts]
        ids, mask = pad_batch(seqs, max_length)
        return {**batch, "t_tokens": ids, "t_mask": mask}

    return transform


class IndexedPairBatcher:
    """Shuffled fixed-shape batches over an indexed pair dataset
    (LazyJsonlDataset / LazyJsonlNoBounds / InMemoryDataset) — the jsonl
    training path (reference train.py:187-202 DataLoader over
    LazyDataset, src/data.py:164-420). Supports shard striding over the
    index space for multi-host runs."""

    def __init__(self, dataset, batch_size: int, max_length: int,
                 seed: int = 0, shard_id: int = 0, num_shards: int = 1,
                 prefetch: int = 4, permute: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collator = PairCollator(max_length)
        self.rng = np.random.default_rng(seed)
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.prefetch = prefetch
        # permute=False: the dataset randomizes internally per access
        # (MultiDataset mixtures ignore the index), so materializing a
        # permutation of len(dataset) — possibly hundreds of millions of
        # entries for stream-backed members — buys nothing
        self.permute = permute

    def _epoch(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.permute:
            order = self.rng.permutation(len(self.dataset))
        else:
            order = range(len(self.dataset))
        order = order[self.shard_id::self.num_shards]
        examples = []
        for i in order:
            examples.append(self.dataset[int(i)])
            if len(examples) == self.batch_size:
                yield self.collator(examples)
                examples = []

    def epoch(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.prefetch > 0:
            return iter(_Prefetcher(self._epoch, depth=self.prefetch))
        return self._epoch()


class DistillBatcher:
    """Single-crop query batches for distillation (reference
    DistillDataset, src/data.py:211-285: one random crop per chunk,
    bos/eos added, no augmentation)."""

    def __init__(self, stream: TokenStream, spec: AugmentSpec,
                 batch_size: int, max_length: Optional[int] = None,
                 seed: int = 0):
        self.stream = stream
        self.spec = spec
        self.batch_size = batch_size
        n_special = (spec.bos_token_id is not None) + (spec.eos_token_id is not None)
        self.max_length = (max_length if max_length is not None
                           else _crop_max_length(stream, spec,
                                                 n_special))
        self.rng = np.random.default_rng(seed)

    def epoch(self) -> Iterator[Dict[str, np.ndarray]]:
        seqs: List[np.ndarray] = []
        for chunk in self.stream:
            crop = augment.random_crop(chunk, self.spec.ratio_min,
                                       self.spec.ratio_max, self.rng)
            seqs.append(augment.add_bos_eos(crop, self.spec.bos_token_id,
                                            self.spec.eos_token_id))
            if len(seqs) == self.batch_size:
                ids, mask = pad_batch(seqs, self.max_length)
                yield {"input_ids": ids, "attention_mask": mask}
                seqs = []

"""Batch assembly and threaded host prefetch.

Replaces the reference's donkey thread pool (data.lua:22-51) and
dataLoader container (dataset.lua:19-157):

  * `FlowDataset` — indexable dataset over manifest specs with
    `sample(q)` (uniform random with replacement, dataset.lua:123-138)
    and `get(i1, i2)` (sequential, dataset.lua:140-155) batch methods.
  * `PrefetchLoader` — a pool of `n_workers` host threads, each with an
    independent `np.random.Generator` seeded from
    `(manual_seed, epoch, idx)` (the reference seeds donkeys once at
    pool creation, data.lua:32-37, so successive epochs see fresh draws
    from long-lived generators; here a fresh pool is built per epoch, so
    an epoch counter is mixed into the seed to preserve that freshness),
    keeping a bounded queue of ready batches ahead of the training loop;
    `n_workers=0` is the synchronous debug mode (data.lua:39-44).
  * `device_prefetch` — overlaps host->device transfer with compute by
    keeping `depth` batches in flight on the mesh.

Batches are dicts of stacked NHWC arrays: images (B,H,W,3F),
flow_gt (B,H,W,2), occ_gt (B,H,W,2), mask (B,H,W).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

from .manifest import SampleSpec
from .sample import SampleConfig, default_image_loader, test_sample, train_sample


def collate(samples: Sequence) -> Dict[str, np.ndarray]:
    """Stack (images, target, mask) triples into batch arrays
    (dataset.lua:102-120)."""
    images = np.stack([s[0] for s in samples])
    target = np.stack([s[1] for s in samples])
    mask = np.stack([s[2] for s in samples])
    return {"images": images,
            "flow_gt": target[..., 0:2],
            "occ_gt": target[..., 2:4],
            "mask": mask}


class FlowDataset:
    """Indexable dataset over manifest sample specs."""

    def __init__(self, specs: Sequence[SampleSpec], cfg: SampleConfig,
                 indices: Optional[np.ndarray] = None, train: bool = True,
                 image_loader: Callable = default_image_loader):
        self.specs = list(specs)
        self.cfg = cfg
        self.train = train
        self.image_loader = image_loader
        self.indices = (np.asarray(indices, np.int64) if indices is not None
                        else np.arange(len(self.specs)))
        if len(self.indices) == 0:
            raise ValueError("dataset has no samples")

    def __len__(self) -> int:
        return len(self.indices)

    def load(self, i: int, rng: Optional[np.random.Generator] = None):
        spec = self.specs[int(self.indices[i])]
        if self.train:
            rng = rng or np.random.default_rng()
            return train_sample(spec, self.cfg, rng, self.image_loader)
        return test_sample(spec, self.cfg, self.image_loader)

    def sample(self, q: int, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        """q uniform-random samples with replacement (dataset.lua:123-138)."""
        ids = rng.integers(0, len(self), size=q)
        return collate([self.load(int(i), rng) for i in ids])

    def get(self, i1: int, i2: int) -> Dict[str, np.ndarray]:
        """Sequential inclusive-exclusive range [i1, i2) (dataset.lua:140-155)."""
        return collate([self.load(i) for i in range(i1, min(i2, len(self)))])


class PrefetchLoader:
    """Batch prefetcher pool (the donkey pool, data.lua:22-51).

    worker_mode:
      * "process" — one OS process per worker (the faithful analog of the
        reference's donkeys, which are independent Lua interpreters):
        full CPU parallelism, unconstrained by the GIL. Each worker owns
        a static slice of the epoch's batch slots (slot s -> worker
        s % n), so epoch content is deterministic given (seed, epoch).
      * "thread" — in-process threads; lower batch-handoff cost, but
        Python/NumPy glue in the sample hooks serializes on the GIL.
      * "auto" (default) — processes when the platform supports fork,
        threads otherwise (or when B2F_LOADER_MODE overrides).
    """

    def __init__(self, dataset: FlowDataset, batch_size: int,
                 n_batches: int, n_workers: int = 8, manual_seed: int = 2,
                 sequential: bool = False, queue_depth: int = 4,
                 worker_mode: str = "auto"):
        self.dataset = dataset
        self.batch_size = batch_size
        self.n_batches = n_batches
        self.n_workers = n_workers
        self.manual_seed = manual_seed
        self.sequential = sequential
        self.queue_depth = queue_depth
        self.worker_mode = worker_mode
        # Advanced once per __iter__ so re-iterating (one epoch = one
        # iteration in train_epoch) yields fresh sample indices and
        # augmentation draws instead of replaying epoch 0 forever.
        self.epoch = 0

    def _resolved_mode(self) -> str:
        import multiprocessing as mp
        import os

        mode = os.environ.get("B2F_LOADER_MODE", self.worker_mode)
        if mode not in ("process", "thread"):
            mode = ("process" if "fork" in mp.get_all_start_methods()
                    else "thread")
        return mode

    def __len__(self) -> int:
        return self.n_batches

    def _jobs(self) -> List:
        if self.sequential:
            return [("get", i * self.batch_size, (i + 1) * self.batch_size)
                    for i in range(self.n_batches)]
        return [("sample",)] * self.n_batches

    def _run_job(self, job, rng) -> Dict[str, np.ndarray]:
        if job[0] == "get":
            return self.dataset.get(job[1], job[2])
        return self.dataset.sample(self.batch_size, rng)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        jobs = self._jobs()
        epoch = self.epoch
        self.epoch += 1
        if self.n_workers == 0:  # synchronous debug mode (data.lua:39-44)
            rng = np.random.default_rng((self.manual_seed, epoch))
            for job in jobs:
                yield self._run_job(job, rng)
            return
        if self._resolved_mode() == "process":
            yield from self._iter_processes(jobs, epoch)
            return

        job_q: queue.Queue = queue.Queue()
        # slot-ordered output: batches are delivered in job order even if
        # workers finish out of order, for deterministic epoch replays
        results: Dict[int, Dict[str, np.ndarray]] = {}
        results_lock = threading.Lock()
        next_slot = [0]
        slot_ready = threading.Condition(results_lock)
        errors: List[BaseException] = []

        for i, job in enumerate(jobs):
            job_q.put((i, job))

        def worker(widx: int):
            rng = np.random.default_rng((self.manual_seed, epoch, widx + 1))
            while True:
                try:
                    slot, job = job_q.get_nowait()
                except queue.Empty:
                    return
                try:
                    batch = self._run_job(job, rng)
                except BaseException as e:  # surfaced to the consumer
                    with slot_ready:
                        errors.append(e)
                        slot_ready.notify_all()
                    return
                with slot_ready:
                    # bounded prefetch: don't run more than queue_depth
                    # batches ahead of the consumer
                    while (slot - next_slot[0] >= self.queue_depth
                           and not errors):
                        slot_ready.wait(timeout=0.5)
                    results[slot] = batch
                    slot_ready.notify_all()

        threads = [threading.Thread(target=worker, args=(w,), daemon=True)
                   for w in range(self.n_workers)]
        for t in threads:
            t.start()

        for slot in range(len(jobs)):
            with slot_ready:
                while slot not in results and not errors:
                    slot_ready.wait(timeout=0.5)
                if errors:
                    raise errors[0]
                batch = results.pop(slot)
                next_slot[0] = slot + 1
                slot_ready.notify_all()
            yield batch
        for t in threads:
            t.join(timeout=5)

    def _iter_processes(self, jobs: List, epoch: int
                        ) -> Iterator[Dict[str, np.ndarray]]:
        """Process-pool epoch: worker w computes slots w, w+n, w+2n, ...
        and streams (slot, batch) over an IPC queue whose bound provides
        the prefetch backpressure; the consumer reorders by slot. Worker
        rngs are seeded (manual_seed, epoch, widx+1) exactly like thread
        mode (data.lua:32-37).

        Start method: "fork" by default (workers never touch JAX, the
        standard dataloader mitigation for forking a JAX/CUDA-threaded
        parent); B2F_MP_START=spawn gives fully clean workers at the
        cost of per-epoch interpreter startup and requiring a picklable
        dataset/image_loader."""
        import multiprocessing as mp
        import os

        method = os.environ.get("B2F_MP_START", "fork")
        ctx = mp.get_context(method)
        n = min(self.n_workers, len(jobs)) or 1
        out_q = ctx.Queue(maxsize=max(self.queue_depth, n))
        # consumed-slot watermark: workers pace themselves against it so
        # no worker runs more than max(queue_depth, n) slots ahead of the
        # consumer — the same bounded-prefetch invariant as thread mode
        # (otherwise fast workers could fill the consumer's reorder
        # buffer with up to a whole epoch of batches)
        progress = ctx.Value("l", 0, lock=False)

        procs = [ctx.Process(
            target=_process_worker,
            args=(self.dataset, self.batch_size, jobs, w, n,
                  (self.manual_seed, epoch, w + 1), out_q, progress,
                  max(self.queue_depth, n)), daemon=True)
            for w in range(n)]
        for p in procs:
            p.start()
        try:
            pending: Dict[int, Dict[str, np.ndarray]] = {}
            for slot in range(len(jobs)):
                while slot not in pending:
                    try:
                        got, batch = out_q.get(timeout=5)
                    except queue.Empty:
                        dead = [p for p in procs
                                if not p.is_alive() and p.exitcode not in
                                (0, None)]
                        if dead:  # e.g. OOM-killed / native crash: no
                            #       error sentinel ever arrives
                            raise RuntimeError(
                                "loader worker died (exitcode "
                                f"{dead[0].exitcode}); batch slot {slot} "
                                "will never arrive") from None
                        continue
                    if got == -1:
                        raise RuntimeError(f"loader worker failed: {batch}")
                    pending[got] = batch
                progress.value = slot + 1
                yield pending.pop(slot)
        finally:
            for p in procs:
                p.terminate()
            for p in procs:
                p.join(timeout=5)
                if p.is_alive():
                    p.kill()


def _process_worker(dataset: FlowDataset, batch_size: int, jobs: List,
                    widx: int, n: int, seed, out_q, progress,
                    max_ahead: int) -> None:
    """Module-level so it works under both fork and spawn start methods.
    Paces itself against the consumer's `progress` watermark so at most
    `max_ahead` slots are in flight across queue + reorder buffer."""
    import time

    rng = np.random.default_rng(seed)
    try:
        for slot in range(widx, len(jobs), n):
            while slot - progress.value >= max_ahead:
                time.sleep(0.02)
            job = jobs[slot]
            if job[0] == "get":
                batch = dataset.get(job[1], job[2])
            else:
                batch = dataset.sample(batch_size, rng)
            out_q.put((slot, batch))
    except BaseException as e:  # surfaced to the consumer
        out_q.put((-1, f"{type(e).__name__}: {e}"))


def device_prefetch(host_batches: Iterator[Dict[str, np.ndarray]],
                    mesh=None, spatial: bool = False, depth: int = 2):
    """Keep `depth` batches in flight on the device/mesh ahead of the
    consumer (the H2D side of the donkey pipeline, train.lua:206-208)."""
    import collections

    from ..parallel.mesh import shard_batch

    def put(b):
        if mesh is None:
            import jax
            return jax.tree_util.tree_map(jax.device_put, b)
        return shard_batch(b, mesh, spatial)

    buf = collections.deque()
    for hb in host_batches:
        buf.append(put(hb))
        if len(buf) > depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()

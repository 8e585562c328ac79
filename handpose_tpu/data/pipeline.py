"""Input pipeline: host decode thread overlapped with device preprocessing.

Replaces the reference's 15-process DataLoader prefetch
(reference trainval.py:140-141, config.py:13).  Host PNG decode runs in a
background thread producing RawBatch numpy structs; a double-buffered
queue keeps `prefetch_depth` batches in flight; each batch is moved to
device (optionally sharded over the mesh's data axis) and pushed through
the jitted `preprocess_batch`, so the TPU step time is model-bound, not
input-bound.
"""

from __future__ import annotations

import queue
import threading
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import jax
import numpy as np

from .preprocess import (InterHandRawBatch, RawBatch, preprocess_batch,
                         preprocess_interhand_batch)

_SENTINEL = object()


def epoch_index_chunks(n: int, batch_size: int, shuffle: bool = False,
                       seed: int = 0, drop_remainder: bool = True):
    """Deterministic epoch order chunked into batch index lists.

    The single source of truth for shuffle-seed and remainder semantics,
    shared by the dataset ``.batches()`` iterators and
    ``raw_device_batches`` so they can never diverge.
    """
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    end = n - (n % batch_size) if drop_remainder else n
    return [list(order[s:s + batch_size]) for s in range(0, end, batch_size)]


class _ProducerError:
    """Carries a producer-thread exception to the consumer.

    Without this, an iterator failure (corrupt image, IO error) would die
    inside the daemon thread and the sentinel would make the epoch look
    like it ENDED normally -- truncated metrics with no error surfaced.
    """

    def __init__(self, exc: BaseException):
        self.exc = exc


def _producer(it, q, stop):
    payload = _SENTINEL
    try:
        for item in it:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    break
                except queue.Full:
                    continue
            if stop.is_set():
                return
    except BaseException as e:           # deliver, don't swallow
        payload = _ProducerError(e)
    finally:
        # the terminal payload (sentinel or error) must be delivered even
        # when the queue is full, otherwise the consumer blocks forever;
        # retry until the consumer drains a slot or signals stop
        while not stop.is_set():
            try:
                q.put(payload, timeout=0.1)
                break
            except queue.Full:
                continue


def prefetch(iterator, depth: int = 2):
    """Run ``iterator`` in a background thread with a bounded queue.

    Abandoning the generator early (e.g. fast_debug truncation) signals the
    producer to stop instead of leaking a thread blocked on a full queue.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()
    t = threading.Thread(target=_producer, args=(iterator, q, stop),
                         daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                return
            if isinstance(item, _ProducerError):
                raise item.exc
            yield item
    finally:
        stop.set()
        while not q.empty():
            try:
                q.get_nowait()
            except queue.Empty:
                break


def prefetch_map(fn, items, *, depth: int = 4,
                 workers: int = 2) -> Iterator:
    """Ordered, bounded map over ``items`` in a thread pool.

    Up to ``depth`` results are in flight; results are yielded in input
    order.  Used to overlap host collation + H2D transfer across batches
    (one producer thread caps throughput at collate+transfer latency; a
    small pool hides the collate behind the transfer of its neighbours).
    """
    with ThreadPoolExecutor(workers) as ex:
        futs: deque = deque()
        it = iter(items)
        try:
            for item in it:
                futs.append(ex.submit(fn, item))
                if len(futs) >= depth:
                    yield futs.popleft().result()
            while futs:
                yield futs.popleft().result()
        finally:
            for f in futs:
                f.cancel()


def raw_device_batches(dataset, batch_size: int, *, shuffle: bool = False,
                       seed: int = 0, drop_remainder: bool = True,
                       sharding: Optional[jax.sharding.Sharding] = None,
                       depth: int = 2, workers: int = 1) -> Iterator:
    """Device-resident raw batches: threaded collate, main-thread H2D.

    ``dataset`` needs ``__len__`` and ``raw_batch(indices)`` (RHDDataset /
    InterHandDataset).  Worker threads collate batches from host storage
    (pure numpy -- parallelises cleanly); the H2D ``device_put`` happens on
    the *calling* thread right before yield.  Measured on the axon tunnel,
    device_put from background threads is ~50x slower than from the main
    thread (per-thread client serialisation), so keeping the transfer on
    the consumer thread and hiding the collate behind it is strictly
    faster; the transfer itself is async and overlaps device compute of
    the previous batch.  workers=1 is the measured sweet spot with the
    memmap cache (concurrent 50MB numpy collates thrash the GIL against
    the consumer's transfer); raise it only for decode-bound sources.
    """
    chunks = epoch_index_chunks(len(dataset), batch_size, shuffle, seed,
                                drop_remainder)

    for raw in prefetch_map(dataset.raw_batch, chunks, depth=depth,
                            workers=workers):
        if sharding is None:
            yield jax.device_put(raw)
        else:
            yield jax.tree.map(
                lambda a: jax.device_put(np.asarray(a), sharding), raw)


def device_batches(raw_iter: Iterator[RawBatch], *, crop_size: int = 256,
                   sigma: float = 25.0, switch_joint_order: bool = True,
                   sharding: Optional[jax.sharding.Sharding] = None,
                   prefetch_depth: int = 2,
                   aug_rng: Optional[jax.Array] = None,
                   aug_flags: Optional[dict] = None) -> Iterator[dict]:
    """raw host batches -> preprocessed device sample dicts.

    With ``sharding`` given, the raw batch is placed batch-sharded across
    the mesh's data axis before preprocessing, so the geometry pipeline
    itself runs data-parallel.  ``aug_flags`` (coord_uv_noise,
    crop_center_noise, crop_scale_noise, crop_offset_noise,
    scoremap_dropout, hue_aug, and the terminal dataset transforms
    scale_to_size / scale_target_size / random_crop_to_size /
    random_crop_size) enable train-time augmentations; ``aug_rng``
    seeds the stochastic ones, split fresh per batch.

    ``prefetch_depth=0`` iterates ``raw_iter`` inline (no extra thread) --
    REQUIRED when raw_iter is ``raw_device_batches``, whose lazy
    ``device_put`` must stay on the consuming thread (background-thread
    transfers are ~50x slower over the axon tunnel).
    """
    flags = aug_flags or {}

    def to_device(raw: RawBatch) -> RawBatch:
        if sharding is None:
            return jax.device_put(raw)
        return jax.tree.map(lambda a: jax.device_put(np.asarray(a), sharding),
                            raw)

    rng = aug_rng
    batches = (prefetch(raw_iter, prefetch_depth) if prefetch_depth > 0
               else raw_iter)
    for raw in batches:
        raw_dev = to_device(raw)
        if isinstance(raw, InterHandRawBatch):
            # InterHand's aug surface is the two flags its reference loader
            # applies (coord_uv_noise + scoremap_dropout,
            # dataloaderInterHand2M6.py:317-318,549-552)
            ih_flags = {k: v for k, v in flags.items()
                        if k in ("coord_uv_noise", "scoremap_dropout") and v}
            batch_rng = None
            if rng is not None and ih_flags:
                rng, batch_rng = jax.random.split(rng)
            yield preprocess_interhand_batch(
                raw_dev, crop_size=crop_size, sigma=sigma,
                switch_joint_order=switch_joint_order,
                rng=batch_rng, **ih_flags)
            continue
        batch_rng = None
        if rng is not None and any(flags.values()):
            rng, batch_rng = jax.random.split(rng)
        yield preprocess_batch(raw_dev, crop_size=crop_size, sigma=sigma,
                               switch_joint_order=switch_joint_order,
                               rng=batch_rng, **flags)

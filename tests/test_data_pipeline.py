"""Host loader + prefetch pipeline integration tests."""

import numpy as np
import pytest

from handpose_tpu.data import (RHDDataset, device_batches, fake_sample_batch,
                               prefetch, write_synthetic_rhd)


@pytest.fixture(scope="module")
def mini_rhd(tmp_path_factory):
    root = tmp_path_factory.mktemp("rhd")
    write_synthetic_rhd(str(root), "evaluation", n=10, seed=3)
    return str(root)


def test_rhd_dataset_raw_batch(mini_rhd):
    ds = RHDDataset(mini_rhd, "evaluation", num_decode_threads=2)
    assert len(ds) == 10
    raw = ds.raw_batch([0, 1, 2, 3])
    assert raw.image.shape == (4, 320, 320, 3)
    assert raw.image.dtype == np.uint8
    assert raw.mask.shape == (4, 320, 320)
    assert raw.keypoint_uv.shape == (4, 42, 2)


def test_epoch_iterator_fixed_shapes(mini_rhd):
    ds = RHDDataset(mini_rhd, "evaluation")
    batches = list(ds.batches(4, shuffle=True, seed=0))
    assert len(batches) == 2   # 10 // 4, remainder dropped
    for b in batches:
        assert b.image.shape == (4, 320, 320, 3)


def test_device_batches_end_to_end(mini_rhd):
    ds = RHDDataset(mini_rhd, "evaluation")
    it = device_batches(ds.batches(4), crop_size=256, prefetch_depth=2)
    sample = next(it)
    assert sample["image_crop"].shape == (4, 256, 256, 3)
    assert sample["scoremap"].shape == (4, 21, 256, 256)
    assert sample["keypoint_xyz21"].shape == (4, 21, 3)
    assert np.all(np.isfinite(np.asarray(sample["keypoint_uv21"])))


def test_prefetch_preserves_order():
    assert list(prefetch(iter(range(20)), depth=3)) == list(range(20))


def test_fake_sample_batch_contract():
    s = fake_sample_batch(2, 64)
    assert s["image_crop"].shape == (2, 64, 64, 3)
    assert s["keypoint_xyz21"].shape == (2, 21, 3)
    assert s["rot_mat"].shape == (2, 3, 3)
    # rotation matrices orthonormal
    R = np.asarray(s["rot_mat"])
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1),
                               np.broadcast_to(np.eye(3), R.shape), atol=1e-5)


def test_host_shard_sampler():
    from handpose_tpu.parallel.distributed import HostShardSampler

    samplers = [HostShardSampler(103, global_batch_size=16, process_index=r,
                                 process_count=4, shuffle=True, seed=1)
                for r in range(4)]
    all_idx = np.concatenate([s.epoch_indices(epoch=2) for s in samplers])
    # disjoint coverage, common truncated length
    assert len(all_idx) == 96
    assert len(set(all_idx.tolist())) == 96
    for s in samplers:
        batches = list(s.local_batches(epoch=2))
        assert all(len(b) == 4 for b in batches)
        assert len(batches) == 6
    # same epoch -> same permutation on every host
    a = samplers[0].epoch_indices(2)
    b = HostShardSampler(103, 16, 0, 4, True, 1).epoch_indices(2)
    np.testing.assert_array_equal(a, b)


def test_native_decoder_matches_cv2(mini_rhd):
    from handpose_tpu.data import native_decode as nd

    if not nd.is_available():
        pytest.skip("native decoder unavailable (no g++/libpng)")
    import cv2
    import os
    paths = [os.path.join(mini_rhd, "evaluation", "color", f"{i:05d}.png")
             for i in range(4)]
    out = nd.decode_batch(paths, 320, 320, 3, n_threads=2)
    for i, p in enumerate(paths):
        ref = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        np.testing.assert_array_equal(out[i], ref)
    # grayscale path (mask PNGs are palette/gray)
    mpaths = [os.path.join(mini_rhd, "evaluation", "mask", f"{i:05d}.png")
              for i in range(4)]
    masks = nd.decode_batch(mpaths, 320, 320, 1, n_threads=2)
    for i, p in enumerate(mpaths):
        np.testing.assert_array_equal(masks[i], cv2.imread(p, 0))


def test_decoded_cache_roundtrip(mini_rhd):
    ds_plain = RHDDataset(mini_rhd, "evaluation", use_native_decode=False)
    ds_cache = RHDDataset(mini_rhd, "evaluation", cache_decoded=True)
    a = ds_plain.raw_batch([1, 3, 7])
    b = ds_cache.raw_batch([1, 3, 7])
    np.testing.assert_array_equal(a.image, b.image)
    np.testing.assert_array_equal(a.mask, b.mask)
    # second construction reuses the cache files
    ds_again = RHDDataset(mini_rhd, "evaluation", cache_decoded=True)
    c = ds_again.raw_batch([1, 3, 7])
    np.testing.assert_array_equal(a.image, c.image)


def test_memmap_take_index_patterns(mini_rhd):
    """_memmap_take (the contiguous-run fast path in the memmap collate)
    == plain fancy indexing for every index pattern the loaders emit:
    contiguous, wrapped (two ascending runs), strided-ascending,
    shuffled, repeated, empty."""
    from handpose_tpu.data.rhd import _memmap_take

    ds = RHDDataset(mini_rhd, "evaluation", cache_decoded=True)
    mm = ds._color_mm
    n = mm.shape[0]
    patterns = [
        np.arange(n),                          # full contiguous
        np.arange(3, 7),                       # inner run
        np.r_[np.arange(5, n), np.arange(3)],  # epoch wraparound
        np.array([0, 2, 4, 6]),                # strided ascending
        np.array([4, 1, 6, 0, 3]),             # shuffled
        np.array([2, 2, 5, 5]),                # repeats
        np.array([], dtype=np.int64),          # empty
    ]
    for idx in patterns:
        np.testing.assert_array_equal(
            _memmap_take(mm, idx), np.asarray(mm[idx]), err_msg=str(idx))


def test_prefetch_early_abandon_stops_producer():
    import threading
    import time

    produced = []

    def slow_source():
        for i in range(1000):
            produced.append(i)
            yield i

    before = threading.active_count()
    gen = prefetch(slow_source(), depth=2)
    for i, x in enumerate(gen):
        if i == 3:
            break
    gen.close()
    time.sleep(0.5)
    # producer stopped well short of the 1000 items
    assert len(produced) < 20
    assert threading.active_count() <= before + 1


def test_prefetch_map_ordered_and_bounded():
    from handpose_tpu.data.pipeline import prefetch_map
    import threading
    import time

    in_flight = []
    peak = [0]
    lock = threading.Lock()

    def fn(i):
        with lock:
            in_flight.append(i)
            peak[0] = max(peak[0], len(in_flight))
        time.sleep(0.01 * ((i % 3) + 1))   # jittered completion order
        with lock:
            in_flight.remove(i)
        return i * i

    out = list(prefetch_map(fn, range(12), depth=3, workers=3))
    assert out == [i * i for i in range(12)]          # input order preserved
    assert peak[0] <= 4                                # bounded in flight


def test_raw_device_batches_matches_direct(mini_rhd):
    from handpose_tpu.data.pipeline import raw_device_batches
    from handpose_tpu.data.rhd import RHDDataset

    ds = RHDDataset(mini_rhd, "evaluation")
    direct = list(ds.batches(4))
    threaded = list(raw_device_batches(ds, 4, workers=3, depth=2))
    assert len(direct) == len(threaded)
    for a, b in zip(direct, threaded):
        np.testing.assert_array_equal(np.asarray(a.image),
                                      np.asarray(b.image))
        np.testing.assert_array_equal(np.asarray(a.keypoint_xyz),
                                      np.asarray(b.keypoint_xyz))


def test_raw_device_batches_early_abandon(mini_rhd):
    """Abandoning the generator must not leak blocked worker threads."""
    import threading

    from handpose_tpu.data.pipeline import raw_device_batches
    from handpose_tpu.data.rhd import RHDDataset

    before = threading.active_count()
    ds = RHDDataset(mini_rhd, "evaluation")
    for _ in range(3):
        gen = raw_device_batches(ds, 2, workers=2, depth=2)
        next(gen)
        gen.close()
    # dataset keeps its own decode pool; only transient map workers vary
    assert threading.active_count() <= before + 4


def test_epoch_index_chunks_semantics():
    """The single shared chunking helper (datasets + raw_device_batches):
    deterministic shuffle by seed, full-batch drop-remainder, exact
    coverage without it."""
    from handpose_tpu.data.pipeline import epoch_index_chunks

    c = epoch_index_chunks(10, 4, shuffle=True, seed=3)
    assert [len(x) for x in c] == [4, 4]
    assert c == epoch_index_chunks(10, 4, shuffle=True, seed=3)
    assert c != epoch_index_chunks(10, 4, shuffle=True, seed=4)
    c2 = epoch_index_chunks(10, 4, shuffle=True, seed=3,
                            drop_remainder=False)
    assert [len(x) for x in c2] == [4, 4, 2]
    assert sorted(sum(c2, [])) == list(range(10))


def test_raw_device_batches_matches_direct_shuffled(mini_rhd):
    """Shuffle-seed semantics agree between the dataset iterator and the
    threaded raw pipeline (they share epoch_index_chunks)."""
    from handpose_tpu.data.pipeline import raw_device_batches
    from handpose_tpu.data.rhd import RHDDataset

    ds = RHDDataset(mini_rhd, "evaluation")
    direct = list(ds.batches(4, shuffle=True, seed=11))
    threaded = list(raw_device_batches(ds, 4, shuffle=True, seed=11,
                                       workers=2, depth=2))
    assert len(direct) == len(threaded)
    for a, b in zip(direct, threaded):
        np.testing.assert_array_equal(np.asarray(a.image),
                                      np.asarray(b.image))


def test_prefetch_propagates_producer_exception():
    """An iterator failure inside the producer thread must raise in the
    consumer, not truncate the epoch silently (metrics over a partial
    split would otherwise look complete)."""
    from handpose_tpu.data.pipeline import prefetch

    def bad_iter():
        yield 1
        yield 2
        raise RuntimeError("corrupt sample")

    got = []
    import pytest
    with pytest.raises(RuntimeError, match="corrupt sample"):
        for x in prefetch(bad_iter(), depth=2):
            got.append(x)
    assert got == [1, 2]

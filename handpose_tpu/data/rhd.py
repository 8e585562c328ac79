"""Host-side RHD dataset: annotation pickle + threaded PNG decode.

TPU-native replacement for the reference's 15-worker
``torch.utils.data.DataLoader`` around RHD_HandKeypointsDataset
(reference dataloaderRHD.py, trainval.py:140-141).  The host's only jobs
are disk I/O and PNG decode (threaded, overlapped with device compute via
:mod:`handpose_tpu.data.pipeline`); all geometry runs on-device in
:func:`handpose_tpu.data.preprocess.preprocess_batch`.

Directory layout (same as RHD):
  <root>/<set_type>/anno_<set_type>.pickle
  <root>/<set_type>/color/NNNNN.png   (320x320 RGB)
  <root>/<set_type>/mask/NNNNN.png    (320x320 uint8 parts)

Decode paths, fastest first:
  1. ``cache_decoded=True``: PNGs are decoded once into uint8 memmaps next
     to the dataset (~8.2 GB for the 41k train split); later epochs read at
     memory bandwidth -- this is what keeps a >10k img/s accelerator fed
     (SURVEY.md §7.7).
  2. the native C++ batched decoder (native/fastdecode.cpp, libpng/libjpeg
     thread pool through ctypes);
  3. cv2 in a python thread pool.
"""

from __future__ import annotations

import os
import pickle
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Sequence

import numpy as np

from .preprocess import RawBatch
from . import native_decode

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


class RHDDataset:
    """Raw-sample access: images as uint8, annotations as float32."""

    def __init__(self, root_dir: str, set_type: str = "training",
                 num_decode_threads: int = 8, image_size: int = 320,
                 cache_decoded: bool = False,
                 use_native_decode: bool = True):
        assert set_type in ("evaluation", "training")
        self.root_dir = root_dir
        self.set_type = set_type
        self.image_size = image_size
        self.num_decode_threads = num_decode_threads
        self.use_native = use_native_decode and native_decode.is_available()
        anno_path = os.path.join(root_dir, set_type,
                                 f"anno_{set_type}.pickle")
        with open(anno_path, "rb") as f:
            self.annotations = pickle.load(f)
        # contiguous anno arrays: batch collation becomes three
        # vectorized gathers instead of 3*B python dict lookups + stack
        # (uv_vis packs uv[:, :2] and the vis flag in one (N,42,3) array)
        n = len(self.annotations)
        self._uv_vis = np.stack([
            np.asarray(self.annotations[i]["uv_vis"], np.float32)
            for i in range(n)]) if n else np.zeros((0, 42, 3), np.float32)
        self._xyz = np.stack([
            np.asarray(self.annotations[i]["xyz"], np.float32)
            for i in range(n)]) if n else np.zeros((0, 42, 3), np.float32)
        self._K = np.stack([
            np.asarray(self.annotations[i]["K"], np.float32)
            for i in range(n)]) if n else np.zeros((0, 3, 3), np.float32)
        self._pool = ThreadPoolExecutor(num_decode_threads)
        self._color_mm = self._mask_mm = None
        if cache_decoded:
            self._build_cache()

    def __len__(self):
        return len(self.annotations)

    def _paths(self, idx: int):
        name = f"{idx:05d}.png"
        d = os.path.join(self.root_dir, self.set_type)
        return (os.path.join(d, "color", name), os.path.join(d, "mask", name))

    def _load_sample(self, idx: int):
        color_p, mask_p = self._paths(idx)
        img = cv2.imread(color_p)          # BGR
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        mask = cv2.imread(mask_p, 0)
        return img, mask

    def _build_cache(self):
        """Decode every sample once into uint8 memmaps (idempotent)."""
        S = self.image_size
        n = len(self)
        d = os.path.join(self.root_dir, self.set_type)
        cpath = os.path.join(d, f"decoded_color_{S}.u8")
        mpath = os.path.join(d, f"decoded_mask_{S}.u8")
        csize = n * S * S * 3
        # .npy container: data + header, so compare with >=
        if not (os.path.exists(cpath) and os.path.getsize(cpath) >= csize):
            # per-process tmp names: concurrent builders (multi-host over
            # shared storage, train+eval jobs) would otherwise truncate
            # each other's half-written file; with unique tmps the atomic
            # os.replace makes the last finisher win with identical bytes
            tag = f".tmp.{os.getpid()}.npy"
            color = np.lib.format.open_memmap(
                cpath + tag, mode="w+", dtype=np.uint8,
                shape=(n, S, S, 3))
            mask = np.lib.format.open_memmap(
                mpath + tag, mode="w+", dtype=np.uint8,
                shape=(n, S, S))
            step = 256
            for s in range(0, n, step):
                idx = list(range(s, min(s + step, n)))
                raw = self._decode_indices(idx)
                color[s:s + len(idx)] = raw[0]
                mask[s:s + len(idx)] = raw[1]
            color.flush(); mask.flush()
            del color, mask
            os.replace(cpath + tag, cpath)
            os.replace(mpath + tag, mpath)
        self._color_mm = np.load(cpath, mmap_mode="r")
        self._mask_mm = np.load(mpath, mmap_mode="r")

    def _decode_indices(self, indices: Sequence[int]):
        S = self.image_size
        if self.use_native:
            cpaths, mpaths = zip(*[self._paths(i) for i in indices])
            imgs = native_decode.decode_batch(
                list(cpaths), S, S, 3, self.num_decode_threads)
            masks = native_decode.decode_batch(
                list(mpaths), S, S, 1, self.num_decode_threads)
            return imgs, masks
        results = list(self._pool.map(self._load_sample, indices))
        return (np.stack([r[0] for r in results]),
                np.stack([r[1] for r in results]))

    def raw_batch(self, indices: Sequence[int]) -> RawBatch:
        """Decode + collate a batch of raw samples (threaded)."""
        if self._color_mm is not None:
            idx = np.asarray(indices)
            imgs = _memmap_take(self._color_mm, idx)
            masks = _memmap_take(self._mask_mm, idx)
        else:
            imgs, masks = self._decode_indices(indices)
        idx = np.asarray(indices)
        uv_vis = self._uv_vis[idx]
        return RawBatch(image=imgs, mask=masks,
                        keypoint_uv=np.ascontiguousarray(uv_vis[:, :, :2]),
                        keypoint_vis=uv_vis[:, :, 2] == 1,
                        keypoint_xyz=self._xyz[idx],
                        camera_K=self._K[idx])

    def batches(self, batch_size: int, shuffle: bool = False,
                seed: int = 0, drop_remainder: bool = True
                ) -> Iterator[RawBatch]:
        """Epoch iterator of raw host batches (fixed batch shape)."""
        from .pipeline import epoch_index_chunks
        for idx in epoch_index_chunks(len(self), batch_size, shuffle, seed,
                                      drop_remainder):
            yield self.raw_batch(idx)


def _memmap_take(mm, idx: np.ndarray) -> np.ndarray:
    """Batch gather from a sample-major memmap.

    numpy fancy indexing on a memmap runs an element-generic gather;
    index sets made of few +1-contiguous runs (sequential epochs, the
    bench's shifted windows, epoch wraparound, shuffle-free validation)
    read each run as a SLICE through the bulk memcpy path instead.
    Mostly-scattered sets (shuffled epochs) keep the generic gather --
    per-element slices would be slower than one fancy index.
    """
    if idx.size == 0:
        return np.asarray(mm[idx])
    starts = np.flatnonzero(np.r_[True, np.diff(idx) != 1])
    if starts.size > max(4, idx.size // 8):
        return np.asarray(mm[idx])          # mostly scattered: gather
    out = np.empty((idx.size,) + mm.shape[1:], mm.dtype)
    bounds = np.r_[starts, idx.size]
    for a, b in zip(bounds[:-1], bounds[1:]):
        out[a:b] = mm[idx[a]:idx[a] + (b - a)]
    return out


def write_synthetic_rhd(root_dir: str, set_type: str = "evaluation",
                        n: int = 8, seed: int = 0,
                        image_size: int = 320) -> None:
    """Write a miniature RHD-format tree with plausible geometry (for tests
    and smoke runs without the 41k-sample dataset)."""
    rng = np.random.default_rng(seed)
    d = os.path.join(root_dir, set_type)
    os.makedirs(os.path.join(d, "color"), exist_ok=True)
    os.makedirs(os.path.join(d, "mask"), exist_ok=True)
    annos = {}
    for i in range(n):
        img = rng.integers(0, 255, (image_size, image_size, 3),
                           dtype=np.uint8)
        mask = np.zeros((image_size, image_size), np.uint8)
        # one blob of "left hand" parts (2..17), one of "right" (18..33)
        ly, lx = rng.integers(60, 200, 2)
        ry, rx = rng.integers(60, 200, 2)
        sz_l = int(rng.integers(10, 50))
        sz_r = int(rng.integers(10, 50))
        mask[ly:ly + sz_l, lx:lx + sz_l] = rng.integers(2, 18)
        mask[ry:ry + sz_r, rx:rx + sz_r] = rng.integers(18, 34)
        f = 300.0 + rng.uniform(-20, 20)
        K = np.array([[f, 0, image_size / 2], [0, f, image_size / 2],
                      [0, 0, 1]], np.float32)
        xyz = np.zeros((42, 3), np.float32)
        for h in range(2):
            c = np.array([rng.uniform(-0.08, 0.08), rng.uniform(-0.08, 0.08),
                          rng.uniform(0.5, 0.8)])
            pts = c + rng.normal(scale=0.04, size=(21, 3))
            pts[:, 2] = np.abs(pts[:, 2]) + 0.3
            xyz[h * 21:(h + 1) * 21] = pts
        uvw = xyz @ K.T
        uv = uvw[:, :2] / uvw[:, 2:3]
        vis = rng.uniform(size=(42,)) > 0.25
        annos[i] = {
            "uv_vis": np.concatenate([uv, vis[:, None].astype(np.float32)],
                                     axis=1),
            "xyz": xyz,
            "K": K,
        }
        cv2.imwrite(os.path.join(d, "color", f"{i:05d}.png"),
                    img[:, :, ::-1])
        cv2.imwrite(os.path.join(d, "mask", f"{i:05d}.png"), mask)
    with open(os.path.join(d, f"anno_{set_type}.pickle"), "wb") as f:
        pickle.dump(annos, f)

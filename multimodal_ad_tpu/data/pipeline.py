"""Async host -> HBM input pipeline.

The reference parallelizes input with DataLoader worker *processes*
(reference train_ResNet3D.py:146-147). TPU-native equivalent: a thread pool
decodes NIfTI volumes and applies host transforms (NumPy releases the GIL on
the heavy ops), batches are assembled into pinned host arrays, and a
prefetch loop issues `jax.device_put` with the target NamedSharding a fixed
depth ahead of consumption — so H2D copy and host decode overlap step
compute and the chip is never input-bound (BASELINE.json north star).

Batches are padded to a static size with a validity mask instead of letting
the last batch be ragged: static shapes mean one XLA compilation, period.
Padding rows are real samples cycled from the epoch order (not repeats of
the last row) so BatchNorm batch statistics stay unbiased; the mask keeps
them out of loss and metrics.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import jax
import numpy as np

from ..parallel.mesh import data_sharding
from ..utils import nifti


def load_volume(path: str, native: bool | None = None) -> np.ndarray:
    """Decode one NIfTI volume (accepts path or path+'.gz').

    Defaults to the native C++ decoder (utils/native_loader, pthread-pooled
    zlib + zero-GIL conversion) whenever it builds, falling back to the
    pure-NumPy reader per volume on unsupported encodings — the reference
    parallelizes exactly this decode step with DataLoader worker processes
    (reference train_ResNet3D.py:146-147). Set MAD_NO_NATIVE_IO=1 to force
    the Python path.
    """
    import os

    actual = nifti.exists_with_ext(path) or path
    use_native = native if native is not None else (
        os.environ.get("MAD_NO_NATIVE_IO", "0") != "1")
    if use_native:
        from ..utils import native_loader

        if native_loader.available():
            try:
                return native_loader.load_volume_native(actual)
            except ValueError:
                pass  # encoding the native path doesn't cover: fall back
    return nifti.load(actual)


class VolumeBatcher:
    """Iterates a manifest in batches of decoded, transformed volumes.

    Yields host dicts {'image': (B, X, Y, Z, C) f32, 'label': (B,) i32,
    'mask': (B,) f32, 'subject': list[str]} with B padded to `batch_size`
    (mask marks real rows).
    """

    def __init__(self, records, transform, batch_size, shuffle=False, seed=0,
                 num_threads=8, image_keys=("MRI",), drop_remainder=False,
                 loader=load_volume, table_lookup=None):
        self.records = list(records)
        self.transform = transform
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_threads = num_threads
        self.image_keys = image_keys
        self.drop_remainder = drop_remainder
        self.loader = loader
        # optional per-subject feature vector (e.g. tabular embedding)
        # joined into each batch under 'table'
        self.table_lookup = table_lookup
        self._epoch = 0

    def __len__(self):
        n = len(self.records)
        if self.drop_remainder:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _decode(self, rec, idx, epoch):
        out = {}
        for k in self.image_keys:
            vol = self.loader(rec[k])
            out[k] = self.transform(vol, sample_idx=idx, epoch=epoch)
        out["label"] = rec["label"]
        out["Subject"] = rec["Subject"]
        return out

    def __iter__(self):
        order = np.arange(len(self.records))
        epoch = self._epoch
        if self.shuffle:
            rng = np.random.default_rng((self.seed, epoch))
            rng.shuffle(order)
        self._epoch += 1

        bs = self.batch_size
        with ThreadPoolExecutor(max_workers=self.num_threads) as pool:
            # pipeline decode one batch ahead
            chunks = []
            for i in range(0, len(order), bs):
                chunk = order[i:i + bs]
                n_real = len(chunk)
                if n_real < bs:
                    if self.drop_remainder:
                        continue
                    # Pad the ragged final batch to the static shape with
                    # REAL samples cycled from this epoch's order — the mask
                    # marks them invalid for loss/metrics, but BatchNorm
                    # batch statistics (which nothing masks) see real,
                    # diverse voxels instead of k copies of one row. The
                    # reference instead feeds ragged final batches
                    # (train_ResNet3D.py:146) — a dynamic shape XLA would
                    # recompile for.
                    pad = bs - n_real
                    extra = np.concatenate(
                        [order] * (pad // max(len(order), 1) + 1))[:pad]
                    chunk = np.concatenate([chunk, extra])
                chunks.append((chunk, n_real))

            def submit(item):
                chunk, _ = item
                return [pool.submit(self._decode, self.records[i], int(i),
                                    epoch)
                        for i in chunk]

            pending = submit(chunks[0]) if chunks else None
            for ci, (chunk, n_real) in enumerate(chunks):
                futures = pending
                pending = submit(chunks[ci + 1]) if ci + 1 < len(chunks) else None
                samples = [f.result() for f in futures]
                # primary modality -> 'image'; extra modalities keep
                # lowercase manifest keys (e.g. 'pet')
                batch = {"image": np.stack(
                    [s[self.image_keys[0]] for s in samples]).astype(np.float32)}
                for k in self.image_keys[1:]:
                    batch[k.lower()] = np.stack(
                        [s[k] for s in samples]).astype(np.float32)
                if self.table_lookup is not None:
                    batch["table"] = np.stack(
                        [np.asarray(self.table_lookup[s["Subject"]], np.float32)
                         for s in samples])
                batch["label"] = np.asarray([s["label"] for s in samples], np.int32)
                mask = np.ones((len(samples),), np.float32)
                mask[n_real:] = 0.0
                batch["mask"] = mask
                # real rows only, host-only
                batch["subject"] = [s["Subject"] for s in samples[:n_real]]
                yield batch


def device_prefetch(iterator, mesh, depth: int = 2):
    """Wrap a host-batch iterator with an async device_put prefetcher.

    Every ndarray entry is placed with the batch dim sharded over the
    mesh's 'data' axis; `depth` transfers ride in flight ahead of the
    consumer (double buffering for depth=2). Non-array entries (subject
    ids) pass through on host.
    """
    sharding = data_sharding(mesh)
    q: queue.Queue = queue.Queue(maxsize=depth)
    _sentinel = object()
    err: list = []

    def producer():
        try:
            for batch in iterator:
                dev = {
                    k: jax.device_put(v, sharding) if isinstance(v, np.ndarray) else v
                    for k, v in batch.items()
                }
                q.put(dev)
        except BaseException as e:  # surface worker errors to consumer
            err.append(e)
        finally:
            q.put(_sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _sentinel:
            if err:
                raise err[0]
            return
        yield item

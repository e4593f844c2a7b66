"""Threaded prefetching batch loader.

Replaces the reference's torch DataLoader worker processes
(/root/reference/datasets/dynamic_stereo_datasets.py:1480-1487) with a
thread pool: dataset decode work is numpy/cv2/PIL, which release the GIL,
and the output feeds jax.device_put — staying in one process avoids a
pickle/IPC copy of every batch. Each epoch reshuffles with a seeded
generator; per-sample RNG is owned by the augmentor.

Batches are channels-last numpy dicts ready for the train step:
  left/right (B, T, H, W, 3) float32, disparity (B, T, H, W, 1),
  valid (B, T, H, W).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def collate(samples: list[dict]) -> dict:
    batch = {
        "left": np.stack([s["img"][:, 0] for s in samples]),
        "right": np.stack([s["img"][:, 1] for s in samples]),
    }
    if "disp" in samples[0]:
        batch["disparity"] = np.stack([s["disp"][:, 0] for s in samples])
        batch["valid"] = np.stack([s["valid"][:, 0] for s in samples])
    return batch


class PrefetchLoader:
    def __init__(
        self,
        dataset,
        batch_size: int = 2,
        shuffle: bool = True,
        num_workers: int = 4,
        prefetch: int = 2,
        drop_last: bool = True,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)

        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for idxs in batches:
                    if stop.is_set():
                        return
                    samples = list(pool.map(self.dataset.__getitem__, idxs))
                    q.put(collate(samples))
            q.put(None)

        worker = threading.Thread(target=produce, daemon=True)
        worker.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()

"""Prefetching training loader.

The reference feeds the device from torch DataLoader worker subprocesses
(pretrain_unified_navit.py:625-650). Here a background thread runs the
packing iterator (PIL decode + resize + pack are the CPU cost) and a second
stage runs the frozen-VAE encode on device ahead of consumption, so the
accelerator never waits on the host (double-buffered, SURVEY hard part #6).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax

from bagel_tpu.configs import BagelConfig
from bagel_tpu.data.packing import HostBatch, encode_vae_images


class PrefetchLoader:
    """Wraps a HostBatch iterator with thread prefetch + device VAE encode.

    Yields device-ready PackedTrainBatch instances (vae_patches filled).
    """

    def __init__(
        self,
        host_iter: Iterator[HostBatch],
        vae_params,
        cfg: BagelConfig,
        rng: jax.Array,
        prefetch: int = 2,
    ):
        self.host_iter = host_iter
        self.vae_params = vae_params
        self.cfg = cfg
        self.rng = rng
        self.queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self.thread = threading.Thread(target=self._worker, daemon=True)
        self._stop = threading.Event()
        self.thread.start()

    def _worker(self):
        try:
            for host in self.host_iter:
                if self._stop.is_set():
                    return
                self.queue.put(host)
        except Exception as e:  # propagate to consumer
            self.queue.put(e)

    def __iter__(self):
        return self

    def __next__(self):
        item = self.queue.get()
        if isinstance(item, Exception):
            raise item
        self.rng, sub = jax.random.split(self.rng)
        if self.cfg.visual_gen and item.vae_images:
            batch = encode_vae_images(self.vae_params, self.cfg, item, sub)
        else:
            batch = item.batch
        return batch, item.data_indexes

    def stop(self):
        self._stop.set()

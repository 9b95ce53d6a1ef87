"""ImageFolder-style classification pipeline for VGG fine-tuning
(/root/reference/vgg_16_train.py:78-101).

Walks `<root>/<split>/<class>/*` like torchvision.datasets.ImageFolder, emits
(image, label-index) batches with the reference's transform chain: resize to
256, optional random horizontal flip, [0,1] scale, ImageNet normalization.
(The VGG16 module normalizes again internally — the reference double-
normalization quirk, SURVEY.md 2.8.3 — so inputs here stay pre-normalized
exactly like the reference's pipeline output.)
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Tuple

import numpy as np

_IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)
_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}


class ImageFolder:
    def __init__(self, root: str, image_size: int = 256,
                 normalize: bool = True) -> None:
        self.root = root
        self.image_size = image_size
        self.normalize = normalize
        classes = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d)))
        self.class_to_idx: Dict[str, int] = {c: i for i, c in enumerate(classes)}
        self.samples: List[Tuple[str, int]] = []
        for c in classes:
            cdir = os.path.join(root, c)
            for fname in sorted(os.listdir(cdir)):
                if os.path.splitext(fname)[1].lower() in _EXTS:
                    self.samples.append((os.path.join(cdir, fname),
                                         self.class_to_idx[c]))

    def __len__(self) -> int:
        return len(self.samples)

    def load(self, index: int, flip: bool) -> Tuple[np.ndarray, int]:
        from PIL import Image

        path, label = self.samples[index]
        size = self.image_size
        with Image.open(path) as img:
            img = img.convert("RGB")
            if img.size != (size, size):
                img = img.resize((size, size), Image.BILINEAR)
            arr = np.asarray(img, dtype=np.float32) / 255.0
        if flip:
            arr = arr[:, ::-1, :]
        if self.normalize:
            arr = (arr - _IMAGENET_MEAN) / _IMAGENET_STD
        return np.ascontiguousarray(arr), label


class ImageFolderLoader:
    """Threaded, prefetching (images, labels) batch iterator."""

    def __init__(self, dataset: ImageFolder, batch_size: int,
                 shuffle: bool = True, random_flip: bool = True,
                 drop_last: bool = True, num_workers: int = 8,
                 prefetch: int = 2, seed: int = 0) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.random_flip = random_flip
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        order = np.arange(len(self.dataset))
        rng = np.random.default_rng((self.seed, self.epoch))
        self.epoch += 1
        if self.shuffle:
            rng.shuffle(order)
        n_batches = len(self)
        flips = (rng.random(len(order)) < 0.5) if self.random_flip \
            else np.zeros(len(order), bool)
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            # stop-aware bounded put — an abandoned iterator would otherwise
            # leave this thread blocked on the full queue forever (same fix
            # as Places365Loader)
            while True:
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    if stop.is_set():
                        return False

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for b in range(n_batches):
                    if stop.is_set():
                        return
                    idx = order[b * self.batch_size:(b + 1) * self.batch_size]
                    samples = list(pool.map(
                        self.dataset.load, [int(i) for i in idx],
                        [bool(flips[i]) for i in idx]))
                    images = np.stack([s[0] for s in samples])
                    labels = np.asarray([s[1] for s in samples], np.int32)
                    if not put_or_stop((images, labels)):
                        return
            put_or_stop(None)

        threading.Thread(target=produce, daemon=True).start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()

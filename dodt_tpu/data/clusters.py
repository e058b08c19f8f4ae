"""Label size clustering (anchor sizes per class).

Parity target: reference label_cluster_utils.get_clusters:146 — KMeans
over (l, w, h) of all training labels per class, cached to a txt file.
Plain numpy Lloyd iterations (no sklearn dependency on the hot path).
"""
from __future__ import annotations

import os
from typing import Tuple

import numpy as np

# KITTI Car clusters from the reference's cached values are near these;
# used when no dataset is available (e.g. synthetic smoke tests).
DEFAULT_CAR_CLUSTERS = ((3.513, 1.581, 1.511), (4.234, 1.653, 1.546))


def kmeans(points: np.ndarray, k: int, iters: int = 100,
           seed: int = 0) -> np.ndarray:
    rng = np.random.RandomState(seed)
    centers = points[rng.choice(len(points), k, replace=False)]
    for _ in range(iters):
        d = ((points[:, None] - centers[None]) ** 2).sum(-1)
        assign = d.argmin(1)
        new = np.stack([
            points[assign == j].mean(0) if np.any(assign == j)
            else centers[j] for j in range(k)])
        if np.allclose(new, centers, atol=1e-6):
            break
        centers = new
    order = np.argsort(centers.prod(axis=1))  # small to large volume
    return centers[order]


def compute_clusters(dataset, num_clusters: int, class_name: str
                     ) -> np.ndarray:
    """Gather (l, w, h) from all training labels and cluster."""
    sizes = []
    seen = set()
    for cp in dataset.couples:
        for frame in (cp.frame_a, cp.frame_b):
            key = (cp.video_id, frame)
            if key in seen:
                continue
            seen.add(key)
            lab = dataset.labels(cp.video_id, frame)
            for i, t in enumerate(lab.types):
                if t == class_name:
                    sizes.append(lab.box_3d[i, 3:6])
    sizes = np.asarray(sizes)
    if len(sizes) < num_clusters:
        return np.asarray(DEFAULT_CAR_CLUSTERS[:num_clusters])
    return kmeans(sizes, num_clusters)


def get_clusters(dataset, cfg, cache_dir: str | None = None
                 ) -> Tuple[Tuple[float, ...], ...]:
    """Clusters for every configured class, with txt caching like the
    reference (label_cluster_utils caches under data/label_clusters)."""
    out = []
    for cls, k in zip(cfg.dataset.classes, cfg.dataset.num_clusters):
        cache = None
        if cache_dir:
            cache = os.path.join(cache_dir,
                                 f"{cls}_{k}_clusters.txt")
            if os.path.exists(cache):
                arr = np.loadtxt(cache).reshape(-1, 3)
                out.extend(map(tuple, arr))
                continue
        arr = compute_clusters(dataset, k, cls)
        if cache:
            os.makedirs(cache_dir, exist_ok=True)
            np.savetxt(cache, arr)
        out.extend(map(tuple, arr))
    return tuple(out)

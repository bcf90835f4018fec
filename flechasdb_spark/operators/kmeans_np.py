"""Deterministic seeded k-means (k-means++ init + Lloyd's) in NumPy.

Used for PQ codebook training on a driver-side SAMPLE of subvectors —
the scale-correct design: codebooks are D x C x (N/D) floats (tiny), and
training them on a bounded sample while ENCODING the full dataset
distributed is how large-scale IVF+PQ systems behave at 100 TB. The
coarse partitioner (P clusters over the full data) stays distributed in
MLlib (operators/build.py).

Parity with the reference's k-means (/root/reference/src/kmeans.rs):
- k-means++ seeding (src/kmeans.rs:142-229) -> seeded np RandomState;
- Lloyd's with maxIter=100, tol=1e-6 relative centroid displacement
  (src/kmeans.rs:24-28,104-139);
- k == M short-circuits to identity clustering (src/kmeans.rs:158-170);
- empty clusters are re-seeded from the farthest points (the reference
  asserts they cannot happen, src/kmeans.rs:259; with real data they
  can — SURVEY.md §7 hard part (e)).
"""

from __future__ import annotations

import numpy as np

__all__ = ["kmeans_fit"]


def _plus_plus_init(x: np.ndarray, k: int, rng: np.random.RandomState) -> np.ndarray:
    m = x.shape[0]
    centers = np.empty((k, x.shape[1]), dtype=np.float64)
    first = rng.randint(m)
    centers[0] = x[first]
    d2 = ((x - centers[0]) ** 2).sum(axis=1)
    for i in range(1, k):
        total = d2.sum()
        if total <= 0:
            centers[i:] = x[rng.randint(m, size=k - i)]
            break
        probs = d2 / total
        idx = rng.choice(m, p=probs)
        centers[i] = x[idx]
        d2 = np.minimum(d2, ((x - centers[i]) ** 2).sum(axis=1))
    return centers


def kmeans_fit(
    x: np.ndarray,
    k: int,
    seed: int,
    max_iter: int = 100,
    tol: float = 1e-6,
    on_event=None,
) -> tuple[np.ndarray, np.ndarray]:
    """Fit k-means; returns (centers [k,dim] float64, labels [m] int32).

    ``on_event(event, payload)`` mirrors the reference's cluster event
    handlers (/root/reference/src/kmeans.rs:71-88): fired with
    ("init", k) after seeding and ("iteration", {"round", "shift"})
    after each Lloyd's round — instrumentation only, no behavior
    change."""
    x = np.asarray(x, dtype=np.float64)
    m = x.shape[0]
    if m < k:
        raise ValueError(f"k-means requires M >= k (M={m}, k={k})")
    rng = np.random.RandomState(seed)
    if m == k:
        # identity clustering, matching src/kmeans.rs:158-170
        return x.copy(), np.arange(m, dtype=np.int32)
    centers = _plus_plus_init(x, k, rng)
    if on_event is not None:
        on_event("init", k)
    labels = np.zeros(m, dtype=np.int32)
    for it in range(max_iter):
        # assignment: ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 (argmin over c)
        cross = x @ centers.T
        c2 = (centers**2).sum(axis=1)
        labels = np.argmin(c2[None, :] - 2.0 * cross, axis=1).astype(np.int32)
        new_centers = centers.copy()
        counts = np.bincount(labels, minlength=k)
        sums = np.zeros_like(centers)
        np.add.at(sums, labels, x)
        nonempty = counts > 0
        new_centers[nonempty] = sums[nonempty] / counts[nonempty, None]
        if (~nonempty).any():
            # re-seed empty clusters from the points farthest from their center
            d2 = ((x - new_centers[labels]) ** 2).sum(axis=1)
            far = np.argsort(-d2)
            for j, ci in enumerate(np.where(~nonempty)[0]):
                new_centers[ci] = x[far[j % m]]
        # convergence: max displacement / max norm < tol (src/kmeans.rs:124-137)
        disp = np.sqrt(((new_centers - centers) ** 2).sum(axis=1)).max()
        scale = np.sqrt((new_centers**2).sum(axis=1)).max()
        centers = new_centers
        if on_event is not None:
            on_event(
                "iteration",
                {"round": it, "shift": float(disp / scale) if scale else 0.0},
            )
        if scale == 0 or disp / scale < tol:
            break
    cross = x @ centers.T
    c2 = (centers**2).sum(axis=1)
    labels = np.argmin(c2[None, :] - 2.0 * cross, axis=1).astype(np.int32)
    return centers, labels

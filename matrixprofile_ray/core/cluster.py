"""MPDist-based hierarchical clustering.

Parity target: reference algorithms/hierarchical_clustering.py:49-146 and
pairwise_dist.py:36-101. SciPy is not available in this environment, so
``linkage`` (single/complete/average/weighted) and ``fcluster``
(maxclust criterion) are implemented directly over the condensed distance
matrix — O(M³) agglomerative, fine for the M ≤ a-few-thousand series the
reference targets.

Distributed all-pairs MPDist lives in the query layer: the (i<j) pair list
fans out through ``map_batches(PairDistActor)`` (pairwise_dist.py's
Pool.map re-expressed); this module is the per-pair kernel + the tiny
driver-side dendrogram math.
"""

from __future__ import annotations

import numpy as np

from matrixprofile_ray.core.mpdist import mpdist

__all__ = ["pairwise_dist", "linkage", "fcluster", "hierarchical_clusters"]


def pairwise_dist(series_list, w: int, threshold: float = 0.05) -> np.ndarray:
    """Condensed MPDist matrix over a list of 1-D series (reference
    pairwise_dist.py ordering: (0,1), (0,2), ..., (m-2,m-1))."""
    m = len(series_list)
    out = np.empty(m * (m - 1) // 2)
    k = 0
    for i in range(m):
        for j in range(i + 1, m):
            out[k] = mpdist(
                np.asarray(series_list[i], dtype="d"),
                np.asarray(series_list[j], dtype="d"),
                w,
                threshold=threshold,
            )
            k += 1
    return out


def _condensed_index(m: int, i: int, j: int) -> int:
    if i > j:
        i, j = j, i
    return m * i - (i * (i + 1)) // 2 + (j - i - 1)


def linkage(condensed: np.ndarray, method: str = "single") -> np.ndarray:
    """Agglomerative linkage over a condensed distance matrix.

    Returns the (m-1, 4) SciPy-format linkage matrix
    [cluster_a, cluster_b, distance, size].
    """
    if method not in ("single", "complete", "average", "weighted"):
        raise ValueError(f"unsupported linkage method: {method}")
    condensed = np.asarray(condensed, dtype="d")
    m = int((1 + np.sqrt(1 + 8 * len(condensed))) // 2)
    # full matrix for simplicity; M is small by contract
    dist = np.full((m, m), np.inf)
    for i in range(m):
        for j in range(i + 1, m):
            d = condensed[_condensed_index(m, i, j)]
            dist[i, j] = dist[j, i] = d

    active = {i: (i, 1) for i in range(m)}  # slot → (cluster id, size)
    next_id = m
    Z = np.zeros((m - 1, 4))
    for step in range(m - 1):
        slots = sorted(active)
        best = (np.inf, None, None)
        for ai in range(len(slots)):
            for bi in range(ai + 1, len(slots)):
                a, b = slots[ai], slots[bi]
                if dist[a, b] < best[0]:
                    best = (dist[a, b], a, b)
        d, a, b = best
        id_a, size_a = active[a]
        id_b, size_b = active[b]
        lo, hi = sorted((id_a, id_b))
        Z[step] = [lo, hi, d, size_a + size_b]

        # merge b into a with the requested update rule
        for c in slots:
            if c in (a, b):
                continue
            da, db = dist[a, c], dist[b, c]
            if method == "single":
                nd = min(da, db)
            elif method == "complete":
                nd = max(da, db)
            elif method == "average":
                nd = (size_a * da + size_b * db) / (size_a + size_b)
            else:  # weighted
                nd = 0.5 * (da + db)
            dist[a, c] = dist[c, a] = nd
        dist[b, :] = dist[:, b] = np.inf
        active[a] = (next_id, size_a + size_b)
        del active[b]
        next_id += 1
    return Z


def fcluster(Z: np.ndarray, t: int) -> np.ndarray:
    """Flat cluster assignments with the 'maxclust' criterion."""
    m = len(Z) + 1
    # cut the dendrogram: keep merging until exactly t clusters remain
    parent = list(range(m + len(Z)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    merges = int(max(0, m - t))
    for step in range(merges):
        a, b = int(Z[step, 0]), int(Z[step, 1])
        new = m + step
        parent[find(a)] = new
        parent[find(b)] = new
    roots = {}
    labels = np.empty(m, dtype=np.int64)
    for i in range(m):
        r = find(i)
        labels[i] = roots.setdefault(r, len(roots) + 1)
    return labels


def hierarchical_clusters(
    series_list,
    window_size: int,
    t: int,
    threshold: float = 0.05,
    method: str = "single",
    condensed: np.ndarray | None = None,
) -> dict:
    """Full reference-shaped result: condensed distances, linkage matrix,
    flat assignments (hierarchical_clustering.py:138-146)."""
    if condensed is None:
        condensed = pairwise_dist(series_list, window_size, threshold=threshold)
    Z = linkage(condensed, method=method)
    assignments = fcluster(Z, t)
    return {
        "pairwise_distances": condensed,
        "linkage_matrix": Z,
        "assignments": assignments,
        "t": t,
        "criterion": "maxclust",
        "method": method,
        "window_size": window_size,
        "class": "hclusters",
    }

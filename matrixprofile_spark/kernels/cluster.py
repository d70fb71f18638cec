"""Hierarchical clustering over MPDist pairwise distances, scipy-free.

Contract of /root/reference/matrixprofile/algorithms/
hierarchical_clustering.py:18-146 — pairwise MPDist condensed matrix →
linkage → inconsistency stats → cophenetic correlation → flat cluster
assignments. The reference delegates to scipy; this sandbox has no scipy,
so the standard algorithms are implemented here directly (linkage in the
scipy Z-matrix format, Lance-Williams updates for single/complete/
average/weighted).

The pairwise-distance stage is the distributed part (a theta self-join —
operators/profile.pairwise_mpdist); linkage itself is O(m²) driver-side
on m series, matching the reference's own single-process design (its
docstring warns about RAM at hierarchical_clustering.py:26-29).
"""

from __future__ import annotations

import numpy as np

from matrixprofile_spark.kernels.mpdist import pairwise_dist


def _condensed_index(m: int, i: int, j: int) -> int:
    if i > j:
        i, j = j, i
    return m * i - (i * (i + 1)) // 2 + (j - i - 1)


def linkage(y: np.ndarray, method: str = "single") -> np.ndarray:
    """Agglomerative clustering in scipy's Z format: rows
    [cluster_a, cluster_b, height, size] with new ids m, m+1, …
    Lance-Williams coefficients for single/complete/average/weighted."""
    y = np.asarray(y, dtype=np.float64)
    k = len(y)
    m = int(round((1 + np.sqrt(1 + 8 * k)) / 2))
    if m * (m - 1) // 2 != k:
        raise ValueError("y is not a condensed distance matrix")
    D = np.full((m, m), np.inf)
    iu = np.triu_indices(m, 1)
    D[iu] = y
    D[(iu[1], iu[0])] = y
    np.fill_diagonal(D, np.inf)

    active = list(range(m))
    ids = list(range(m))
    sizes = {i: 1 for i in range(m)}
    Z = np.zeros((m - 1, 4))
    next_id = m

    for step in range(m - 1):
        # find the closest active pair
        sub = D[np.ix_(active, active)]
        flat = np.argmin(sub)
        ai, bi = divmod(flat, len(active))
        if ai > bi:
            ai, bi = bi, ai
        h = sub[ai, bi]
        ca, cb = ids[active[ai]], ids[active[bi]]
        na, nb = sizes[ca], sizes[cb]
        Z[step] = [min(ca, cb), max(ca, cb), h, na + nb]

        ia, ib = active[ai], active[bi]
        # Lance-Williams update of distances from the merged cluster
        for other in active:
            if other in (ia, ib):
                continue
            da, db = D[ia, other], D[ib, other]
            if method == "single":
                d = min(da, db)
            elif method == "complete":
                d = max(da, db)
            elif method == "average":
                d = (na * da + nb * db) / (na + nb)
            elif method == "weighted":
                d = 0.5 * (da + db)
            else:
                raise ValueError(
                    "method may only be one of: single, complete, average, weighted"
                )
            D[ia, other] = D[other, ia] = d
        sizes[next_id] = na + nb
        ids[ia] = next_id
        next_id += 1
        active.remove(ib)
    return Z


def _members(Z: np.ndarray, cluster: int, m: int) -> list[int]:
    if cluster < m:
        return [cluster]
    a, b = int(Z[cluster - m, 0]), int(Z[cluster - m, 1])
    return _members(Z, a, m) + _members(Z, b, m)


def cophenet(Z: np.ndarray, y: np.ndarray) -> tuple[float, np.ndarray]:
    """Cophenetic correlation + distances (scipy.cluster.hierarchy.cophenet)."""
    m = Z.shape[0] + 1
    coph = np.zeros(m * (m - 1) // 2)
    for step in range(m - 1):
        a, b = int(Z[step, 0]), int(Z[step, 1])
        for i in _members(Z, a, m):
            for j in _members(Z, b, m):
                coph[_condensed_index(m, i, j)] = Z[step, 2]
    ybar, cbar = np.mean(y), np.mean(coph)
    num = np.sum((y - ybar) * (coph - cbar))
    den = np.sqrt(np.sum((y - ybar) ** 2) * np.sum((coph - cbar) ** 2))
    c = num / den if den > 0 else 0.0
    return float(c), coph


def inconsistent(Z: np.ndarray, d: int = 2) -> np.ndarray:
    """Per-link inconsistency stats [mean, std, count, coefficient]
    over link heights within depth d (scipy semantics)."""
    n = Z.shape[0]
    m = n + 1
    R = np.zeros((n, 4))
    for i in range(n):
        heights = []
        stack = [(i + m, 0)]
        while stack:
            node, depth = stack.pop()
            if node < m or depth > d:
                continue
            row = node - m
            heights.append(Z[row, 2])
            if depth < d:
                stack.append((int(Z[row, 0]), depth + 1))
                stack.append((int(Z[row, 1]), depth + 1))
        h = np.array(heights)
        mean = h.mean()
        # scipy uses the unbiased estimator with ddof=1 semantics? No —
        # it uses population std over the collected set (ddof=0 when one
        # element, else sample std). scipy: std with ddof=1 for >1.
        std = h.std(ddof=1) if len(h) > 1 else 0.0
        coef = 0.0 if std == 0 else (Z[i, 2] - mean) / std
        R[i] = [mean, std, len(h), coef]
    return R


def fcluster(Z, t, criterion="distance", depth=2, R=None):
    """Flat clusters from linkage (subset of scipy.fcluster criteria)."""
    m = Z.shape[0] + 1
    if criterion == "distance":
        cut = lambda step: Z[step, 2] > t  # noqa: E731
    elif criterion == "maxclust":
        heights = np.sort(Z[:, 2])
        # smallest height threshold producing <= t clusters
        thr = 0.0
        for h in np.concatenate(([0.0], heights)):
            k = int(np.sum(Z[:, 2] > h)) + 1
            if k <= t:
                thr = h
                break
        else:
            thr = heights[-1]
        cut = lambda step: Z[step, 2] > thr  # noqa: E731
    elif criterion == "inconsistent":
        if R is None:
            R = inconsistent(Z, depth)
        cut = lambda step: R[step, 3] > t  # noqa: E731
    else:
        raise ValueError(
            "criterion may only be one of: inconsistent, distance, maxclust"
        )

    parent = list(range(2 * m - 1))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for step in range(m - 1):
        if not cut(step):
            a, b = find(int(Z[step, 0])), find(int(Z[step, 1]))
            node = step + m
            parent[a] = node
            parent[b] = node
    labels = np.zeros(m, dtype=np.int64)
    seen = {}
    for i in range(m):
        root = find(i)
        if root not in seen:
            seen[root] = len(seen) + 1
        labels[i] = seen[root]
    return labels


def hierarchical_clusters(
    X: list[np.ndarray],
    window_size: int,
    t,
    threshold: float = 0.05,
    method: str = "single",
    depth: int = 2,
    criterion: str = "distance",
) -> dict:
    """Full pipeline (hierarchical_clustering.py:18-146 contract)."""
    valid_methods = {"single", "complete", "average", "weighted"}
    valid_criterions = {"inconsistent", "distance", "monocrit", "maxclust"}
    method = method.lower()
    criterion = criterion.lower()
    if not isinstance(t, (float, int)):
        raise ValueError("t must be a scalar (int or float)")
    if not isinstance(threshold, float) or threshold <= 0 or threshold >= 1:
        raise ValueError("threshold must be a float greater than 0 and less than 1")
    if not isinstance(depth, int) or depth < 1:
        raise ValueError("depth must be an integer greater than 0")
    if method not in valid_methods:
        raise ValueError("method may only be one of: " + ", ".join(sorted(valid_methods)))
    if criterion not in valid_criterions:
        raise ValueError("criterion may only be one of: " + ", ".join(sorted(valid_criterions)))
    Y = pairwise_dist(X, window_size, threshold=threshold)
    Z = linkage(Y, method=method)
    R = inconsistent(Z, d=depth)
    c, coph_dists = cophenet(Z, Y)
    T = fcluster(Z, t, criterion=criterion, depth=depth, R=R)
    return {
        "pairwise_distances": Y,
        "linkage_matrix": Z,
        "inconsistency_statistics": R,
        "assignments": T,
        "cophenet": c,
        "cophenet_distances": coph_dists,
        "class": "hclusters",
    }

"""Discovery kernels: top-k motifs, top-k discords, FLUSS/regimes.

Sequential-suppression algorithms (each pick mutates the candidate mask),
so they stay in-kernel and fan out across series at the Spark layer.

Contracts matched:
- mp_top_k_discords: /root/reference/matrixprofile/algorithms/
  top_k_discords.py:94-155 (asymmetric exclusion zone [idx-ez, idx+ez),
  inf-skip, argsort-descending scan)
- mp_top_k_motifs: top_k_motifs.py:174-314 (argmin pick, MASS re-query,
  radius*min_dist neighbor rule, ez applied to both dp and mp)
- fluss / extract_regimes: regimes.py:43-152 (idealized parabola
  normalization, head/tail clamped to 1, regime ez = 5w)
"""

from __future__ import annotations

import numpy as np

from matrixprofile_spark.kernels.mass import apply_exclusion_zone, mass2


def top_k_discords(
    mp: np.ndarray, w: int, ez: int | None = None, k: int = 3
) -> np.ndarray:
    """Indices of the k largest non-inf profile values with suppression."""
    tmp = np.array(mp, dtype=np.float64)
    n = len(tmp)
    if ez is None:
        ez = int(np.ceil(w / 2.0))
    found = []
    # stable sort for deterministic tie order (reference uses introsort;
    # ties among equal distances are implementation-defined there)
    for idx in np.argsort(tmp, kind="stable")[::-1]:
        if not np.isinf(tmp[idx]):
            found.append(int(idx))
            if ez > 0:
                tmp[max(0, idx - ez) : min(n, idx + ez)] = np.inf
        if len(found) >= k:
            break
    return np.array(found, dtype=np.int64)


def top_k_motifs(
    ts: np.ndarray,
    mp: np.ndarray,
    pi: np.ndarray,
    w: int,
    ez: int | None = None,
    k: int = 3,
    max_neighbors: int = 10,
    radius: float = 3,
    zero_eps: float | None = None,
) -> list[dict]:
    """[{motifs: [first, second], neighbors: [...]}] per the reference.

    zero_eps (engine determinism mandate, off by default): distances
    below eps clamp to exactly 0 before every argmin. An exact-duplicate
    window pair has true distance 0, but each engine computes it as
    0 ± ~1e-7 depending on rounding luck, so raw argmin tie-breaking is
    fp-noise-dependent (the reference has the same instability). With
    the clamp, picks are deterministic: all true-zero positions tie and
    the smallest index wins — reproducible across engines and
    partitionings, like the seeded noise in preprocess."""
    ts = np.asarray(ts, dtype=np.float64)
    mp = np.array(mp, dtype=np.float64)
    if zero_eps:
        mp[mp < zero_eps] = 0.0
    n = len(ts)
    if ez is None:
        ez = int(np.ceil(w / 2.0))
    out = []
    for _ in range(k):
        min_idx = int(np.argmin(mp))
        min_dist = mp[min_idx]
        if not np.isfinite(min_dist):
            break
        first = int(min(min_idx, pi[min_idx]))
        second = int(max(min_idx, pi[min_idx]))
        dp = np.real(mass2(ts, ts[first : first + w]))
        if zero_eps:
            dp[dp < zero_eps] = 0.0
        dp[~np.isfinite(mp)] = np.inf
        for j in (first, second):
            dp = apply_exclusion_zone(ez, False, w, n, j, dp)
            mp = apply_exclusion_zone(ez, False, w, n, j, mp)
        neighbors = []
        for _ in range(max_neighbors):
            nb = int(np.argmin(dp))
            nd = dp[nb]
            if not np.isfinite(nd) or not (radius * min_dist >= nd):
                break
            neighbors.append(nb)
            dp = apply_exclusion_zone(ez, False, w, n, nb, dp)
            mp = apply_exclusion_zone(ez, False, w, n, nb, mp)
        out.append({"motifs": [first, second], "neighbors": neighbors})
    return out


def pearson_to_euclidean(a: np.ndarray, windows) -> np.ndarray:
    """ρ → z-normalized Euclidean, row-wise (core.py:590-621); inf kept."""
    a = np.asarray(a, dtype=np.float64)
    if a.ndim == 1:
        w = windows[0] if hasattr(windows, "__len__") else windows
        return np.sqrt(2 * w * (1 - a))
    out = np.empty_like(a)
    for idx, w in enumerate(windows):
        is_inf = np.isinf(a[idx])
        out[idx] = np.sqrt(2 * w * (1 - a[idx]))
        out[idx][is_inf] = np.inf
    return out


def is_pearson_array(a: np.ndarray) -> bool:
    """min ≥ 0 and max ≤ 1 over finite entries (core.py:624-643)."""
    mask = np.isfinite(a)
    if not mask.any():
        return False
    return bool(a[mask].min() >= 0 and a[mask].max() <= 1)


def pmp_top_k_discords(profile: dict, exclusion_zone=None, k: int = 3) -> dict:
    """2-D argmax discords over a PMP (top_k_discords.py:16-91);
    found entries are (row, col) index pairs."""
    metric = profile.get("metric")
    pmp = profile.get("pmp")
    windows = profile.get("windows")
    if metric == "pearson":
        tmp = pearson_to_euclidean(pmp, windows)
    else:
        tmp = np.array(pmp, dtype=np.float64)
    tmp[~np.isfinite(tmp)] = -np.inf
    found = []
    for _ in range(k):
        max_idx = np.unravel_index(np.argmax(tmp), tmp.shape)
        window = windows[max_idx[0]]
        if tmp[max_idx] == -np.inf:
            break
        found.append(max_idx)
        n = tmp[max_idx[0]].shape[0]
        ez = exclusion_zone if exclusion_zone is not None else int(np.floor(window / 2))
        tmp[max_idx[0]][max(0, max_idx[1] - ez) : min(n, max_idx[1] + ez)] = -np.inf
    profile["discords"] = np.array(found)
    return profile


def pmp_top_k_motifs(
    profile: dict,
    exclusion_zone=None,
    k: int = 3,
    max_neighbors: int = 10,
    radius: float = 3,
    zero_eps: float | None = None,
) -> dict:
    """Motifs over a PMP, (row, col) indices (top_k_motifs.py:16-171).

    zero_eps: same determinism clamp as top_k_motifs — distances below
    eps collapse to exactly 0 before every argmin (profile cells AND the
    MASS re-query), so true-zero ties break row-major (window asc, idx
    asc) reproducibly across engines instead of by fp rounding luck."""
    ts = profile["data"]["ts"]
    data_len = len(ts)
    pmp = profile["pmp"]
    profile_len = pmp.shape[1]
    pmpi = profile["pmpi"]
    windows = profile["windows"]
    if is_pearson_array(pmp):
        tmp = pearson_to_euclidean(pmp, windows)
    else:
        tmp = np.array(pmp, dtype=np.float64)
    tmp[~np.isfinite(tmp)] = np.inf
    if zero_eps:
        tmp[tmp < zero_eps] = 0.0
    motifs = []
    for _ in range(k):
        min_idx = np.unravel_index(np.argmin(tmp), tmp.shape)
        min_dist = tmp[min_idx]
        if not np.isfinite(min_dist):
            break
        row, col = int(min_idx[0]), int(min_idx[1])
        first = int(min(col, pmpi[row][col]))
        second = int(max(col, pmpi[row][col]))
        w = int(windows[row])
        dp = np.real(mass2(ts, ts[first : first + w]))
        if zero_eps:
            dp[dp < zero_eps] = 0.0
        dp = np.concatenate((dp, np.full(profile_len - len(dp), np.inf)))
        dp[~np.isfinite(pmp[row])] = np.inf
        ez = exclusion_zone if exclusion_zone else int(np.floor(w / 2))
        for j in (first, second):
            dp = apply_exclusion_zone(ez, False, w, data_len, j, dp)
            tmp[row] = apply_exclusion_zone(ez, False, w, data_len, j, tmp[row])
        neighbors = []
        for _ in range(max_neighbors):
            nb = int(np.argmin(dp))
            nd = np.real(dp[nb])
            if not np.isfinite(nd) or not (radius * min_dist >= nd):
                break
            neighbors.append((row, nb))
            dp = apply_exclusion_zone(ez, False, w, data_len, nb, dp)
            tmp[row] = apply_exclusion_zone(ez, False, w, data_len, nb, tmp[row])
        motifs.append({"motifs": [(row, first), (row, second)], "neighbors": neighbors})
    profile["motifs"] = motifs
    return profile


def _idealized_arc_curve(width: int, index: np.ndarray) -> np.ndarray:
    """Parabola of width n, height n/2 (regimes.py:10-40)."""
    height = width / 2
    c = width / 2
    a = height / (width / 2) ** 2
    return -(a * (index - c) ** 2) + height


def fluss(pi: np.ndarray, w: int) -> np.ndarray:
    """Corrected arc curve from the profile index (regimes.py:43-91)."""
    pi = np.asarray(pi, dtype=np.int64)
    n = len(pi)
    nnmark = np.zeros(n)
    idx = np.arange(n)
    small = np.minimum(idx, pi)
    large = np.maximum(idx, pi)
    np.add.at(nnmark, small + 1, 1)   # small+1 can reach n-1 at most when
    np.add.at(nnmark, large, -1)      # pi is within [0, n); matches loop
    cross_count = np.cumsum(nnmark)
    ideal = _idealized_arc_curve(n, idx)
    with np.errstate(divide="ignore", invalid="ignore"):
        cac = cross_count / ideal
    cac[cac > 1] = 1
    cac[:w] = 1
    cac[-w:] = 1
    return cac


def extract_regimes(cac: np.ndarray, w: int, num_regimes: int = 3) -> np.ndarray:
    """k minima of the CAC with exclusion zone 5w (regimes.py:94-152)."""
    tmp = np.array(cac, dtype=np.float64)
    ez = w * 5
    n = len(tmp)
    regimes = []
    for _ in range(num_regimes):
        mi = int(np.argmin(tmp))
        regimes.append(mi)
        tmp[max(0, mi - ez) : min(n, mi + ez)] = np.inf
    return np.array(regimes, dtype=np.int64)

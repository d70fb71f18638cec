"""PreSCRIMP and SCRIMP++ anytime matrix profile kernels (pure NumPy).

Contracts matched from /root/reference/matrixprofile/algorithms/scrimp.py:
- prescrimp (211-406): distance profiles at stride floor(w·step_size),
  ez ceil(w/4), neighbor-diagonal dot-product refinement — including the
  quirks: the unconditional overwrite of mp[idx] with the row minimum,
  and the asymmetric refine ranges (dist1[0:idx-1], dist2[pl-idx+2:]).
- scrimp_plus_plus (409-565): PreSCRIMP seed + per-diagonal cumsum
  refinement over sampled diagonals.

Determinism: the reference samples with the GLOBAL np.random state
(scrimp.py:205-207, 520-522). This engine requires an explicit seed and
uses a local RandomState; at sample_pct=1.0 the sample is the full set so
results are seed-independent (the reference's own golden test relies on
that: tests/test_scrimp.py:65-99).
"""

from __future__ import annotations

import math

import numpy as np

from matrixprofile_spark.kernels.mass import apply_exclusion_zone
from matrixprofile_spark.kernels.moving import moving_avg_std


def _calc_distance_profile(X, y, n, m, meanx, sigmax):
    """FFT distance profile from a precomputed spectrum (scrimp.py:35-82)."""
    y = np.concatenate((y[::-1], np.zeros(n - m)))
    z = np.fft.ifft(X * np.fft.fft(y))
    sumy = np.sum(y)
    sumy2 = np.sum(y**2)
    meany = sumy / m
    sigmay = np.sqrt(sumy2 / m - meany**2)
    dist = (z[m - 1 : n] - m * meanx * meany) / (sigmax * sigmay)
    dist = np.real(2 * (m - dist))
    return np.sqrt(np.absolute(dist))


def prescrimp(
    ts: np.ndarray,
    window_size: int,
    query: np.ndarray | None = None,
    step_size: float = 0.25,
    sample_pct: float = 1.0,
    random_state: int | None = None,
) -> dict:
    """Anytime approximate matrix profile, PreSCRIMP stage."""
    is_join = query is not None and len(np.asarray(query)) > 0
    ts = np.asarray(ts, dtype=np.float64)
    query = np.asarray(query, dtype=np.float64) if is_join else ts

    if not isinstance(step_size, float) or step_size > 1 or step_size < 0:
        raise ValueError("step_size should be a float between 0 and 1.")
    if not isinstance(sample_pct, (float, int)) or sample_pct > 1 or sample_pct < 0:
        raise ValueError("sample_pct should be a float between 0 and 1.")
    if random_state is not None and not isinstance(random_state, (int, np.integer)):
        raise ValueError("Invalid random_state value given.")
    if window_size < 4:
        raise ValueError("window size must be at least 4.")
    if window_size > len(query) / 2:
        raise ValueError("Time series is too short relative to desired window size")

    m = window_size
    step = int(math.floor(m * step_size))
    pl = len(ts) - m + 1
    n = len(ts)
    ez = int(np.ceil(m / 4.0))

    mp = np.zeros(pl)
    pi = np.zeros(pl, dtype=np.int64)
    X = np.fft.fft(ts)
    mux, sigx = moving_avg_std(ts, m)
    dotproduct = np.zeros(pl)
    refine = np.full(pl, np.inf)
    orig = np.arange(pl)

    compute_order = np.arange(0, pl, step=step)
    for iteration, idx in enumerate(compute_order):
        dp = _calc_distance_profile(X, ts[idx : idx + m], n, m, mux, sigx)
        dp = apply_exclusion_zone(ez, is_join, m, n, idx, dp)
        if iteration == 0:
            mp = dp
            pi[:] = idx
        else:
            upd = dp < mp
            pi[upd] = idx
            mp[upd] = dp[upd]
        idx_min = int(np.argmin(dp))
        mp[idx] = dp[idx_min]
        pi[idx] = idx_min
        idx_nn = pi[idx]

        idx_diff = idx_nn - idx
        endidx = int(min(pl - 1, idx + step - 1, pl - idx_diff - 1))
        beginidx = int(max(0, idx - step + 1, 2 - idx_diff))

        # refine via the neighbor diagonal's rolling dot product
        dotproduct[idx] = (m - mp[idx] ** 2 / 2) * sigx[idx] * sigx[idx_nn] \
            + m * mux[idx] * mux[idx_nn]
        if endidx > idx:
            f = (
                ts[idx + m : endidx + m] * ts[idx_nn + m : endidx + m + idx_diff]
                - ts[idx:endidx] * ts[idx_nn : endidx + idx_diff]
            )
            dotproduct[idx + 1 : endidx + 1] = dotproduct[idx] + np.cumsum(f)
            with np.errstate(invalid="ignore", divide="ignore"):
                g = sigx[idx + 1 : endidx + 1] * sigx[idx_nn + 1 : endidx + idx_diff + 1]
                h = m - (
                    dotproduct[idx + 1 : endidx + 1]
                    - m * mux[idx + 1 : endidx + 1] * mux[idx_nn + 1 : endidx + idx_diff + 1]
                ) / g
            refine[idx + 1 : endidx + 1] = np.sqrt(np.abs(2 * h))
        if beginidx < idx:
            ia = np.arange(idx - 1, beginidx - 1, -1)
            f = (
                ts[ia] * ts[np.arange(idx_nn - 1, beginidx + idx_diff - 1, -1)]
                - ts[ia + m] * ts[np.arange(idx_nn - 1 + m, beginidx + idx_diff + m - 1, -1)]
            )
            dotproduct[ia] = dotproduct[idx] + np.cumsum(f)
            with np.errstate(invalid="ignore", divide="ignore"):
                g = sigx[beginidx:idx] * sigx[beginidx + idx_diff : idx_nn]
                h = m - (
                    dotproduct[beginidx:idx]
                    - m * mux[beginidx:idx] * mux[beginidx + idx_diff : idx_nn]
                ) / g
            refine[beginidx:idx] = np.sqrt(np.abs(2 * h))

        # apply refinements to both ends of each refined diagonal entry
        ra = refine[beginidx : endidx + 1]
        u1 = np.flatnonzero(ra < mp[beginidx : endidx + 1]) + beginidx
        if len(u1):
            mp[u1] = refine[u1]
            pi[u1] = orig[u1] + idx_diff
        u2 = np.flatnonzero(ra < mp[beginidx + idx_diff : endidx + idx_diff + 1]) + beginidx
        if len(u2):
            mp[u2 + idx_diff] = refine[u2]
            pi[u2 + idx_diff] = orig[u2]

    return {
        "mp": mp, "pi": pi, "rmp": None, "rpi": None, "lmp": None, "lpi": None,
        "w": m, "ez": ez, "join": is_join, "sample_pct": sample_pct,
        "metric": "euclidean",
        "data": {"ts": ts, "query": query if is_join else None},
        "class": "MatrixProfile", "algorithm": "prescrimp",
    }


def scrimp_plus_plus(
    ts: np.ndarray,
    window_size: int,
    query: np.ndarray | None = None,
    step_size: float = 0.25,
    sample_pct: float = 1.0,
    random_state: int | None = None,
) -> dict:
    """SCRIMP++: PreSCRIMP seed + sampled-diagonal SCRIMP refinement."""
    profile = prescrimp(
        ts, window_size, query=query, step_size=step_size,
        sample_pct=sample_pct, random_state=random_state,
    )
    ts = profile["data"]["ts"]
    m = profile["w"]
    ez = profile["ez"]
    n = len(ts)
    pl = n - m + 1
    mu, sig = moving_avg_std(ts, m)

    orig = np.arange(pl)
    order = orig[orig > ez]
    sample_size = int(np.ceil(len(order) * sample_pct))
    if sample_size < len(order):
        rng = np.random.RandomState(random_state)
        order = rng.choice(order, size=sample_size, replace=False)

    curlastz = np.zeros(pl)
    curdist = np.zeros(pl)
    dist1 = np.full(pl, np.inf)
    dist2 = np.full(pl, np.inf)
    mp, pi = profile["mp"], profile["pi"]

    for idx in order:
        curlastz[idx] = np.sum(ts[:m] * ts[idx : idx + m])
        curlastz[idx + 1 :] = curlastz[idx] + np.cumsum(
            ts[m : n - idx] * ts[idx + m : n] - ts[: pl - idx - 1] * ts[idx : pl - 1]
        )
        with np.errstate(invalid="ignore", divide="ignore"):
            curdist[idx:] = np.sqrt(np.abs(
                2 * (m - (curlastz[idx:]
                          - m * (mu[idx:] * mu[: pl - idx]))
                     / (sig[idx:] * sig[: pl - idx]))
            ))
        dist1[: idx - 1] = np.inf
        dist1[idx:] = curdist[idx:]
        dist2[: pl - idx] = curdist[idx:]
        dist2[pl - idx + 2 :] = np.inf

        loc1 = dist1 < mp
        mp[loc1] = dist1[loc1]
        pi[loc1] = orig[loc1] - idx
        loc2 = dist2 < mp
        mp[loc2] = dist2[loc2]
        pi[loc2] = orig[loc2] + idx

    profile["algorithm"] = "scrimp++"
    profile["sample_pct"] = sample_pct
    return profile

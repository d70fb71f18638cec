"""mSTOMP: multidimensional matrix profile (mSTAMP), pure NumPy.

Contract of /root/reference/matrixprofile/algorithms/mstomp.py:21-379:
per-dimension STOMP rolling products, distance profiles sorted across
dimensions, k-dimensional profiles from cumulative means of the k
smallest per-dimension distances; ez ceil(w/2); _EPS=1e-14 floor on
query variance; rows with any constant-dimension window skipped.

Reference BUG (mstomp.py:284): it calls core.find_multid_skip_locations,
which does not exist — any NaN-bearing multid input raises
AttributeError there. This engine implements the intended semantics: a
profile position is skipped if ANY dimension's window contains NaN/Inf.

In the Spark engine the dimension axis is the `metric` column: a
conversation's (turn_rate × latency × token_count) series form the
d-dimensional input (SURVEY.md §2.4).
"""

from __future__ import annotations

import numpy as np

from matrixprofile_spark.kernels import mass as MS
from matrixprofile_spark.kernels.moving import moving_avg_std
from matrixprofile_spark.kernels.stomp import find_skip_locations

_EPS = 1e-14


def find_multid_skip_locations(ts: np.ndarray, profile_length: int, w: int) -> np.ndarray:
    """Positions where any dimension's window holds NaN/Inf (engine fix
    for the reference's missing core.find_multid_skip_locations)."""
    skip = np.zeros(profile_length, dtype=bool)
    for d in range(ts.shape[0]):
        skip |= find_skip_locations(ts[d], profile_length, w)
    return skip


def mstomp(ts: np.ndarray, window_size: int, return_dimension: bool = False) -> dict:
    ts = np.asarray(ts, dtype=np.float64)
    if ts.ndim == 1:
        ts = ts[None, :]
    query = ts
    if window_size > query.shape[1] / 2:
        raise ValueError("Time series is too short relative to desired window size")

    num_dim, data_length = ts.shape
    pl = data_length - window_size + 1
    num_queries = pl
    ez = int(np.ceil(window_size / 2.0))

    skip_locs = find_multid_skip_locations(ts, pl, window_size)
    ts = np.where(np.isfinite(ts), ts, 0.0)
    query = ts

    mp = np.full((num_dim, pl), np.inf)
    pi = np.zeros((num_dim, pl), dtype=np.int64)
    lmp = np.full((num_dim, pl), np.inf)
    rmp = np.full((num_dim, pl), np.inf)
    lpi = np.zeros((num_dim, pl), dtype=np.int64)
    rpi = np.zeros((num_dim, pl), dtype=np.int64)
    pd_out = [np.zeros((d + 1, pl), dtype=np.int64) for d in range(num_dim)] \
        if return_dimension else []

    data_mu = np.empty((num_dim, pl))
    data_sig = np.empty((num_dim, pl))
    first_product = np.empty((num_dim, pl))
    for d in range(num_dim):
        data_mu[d], data_sig[d] = moving_avg_std(ts[d], window_size)
        first_product[d] = MS.fft_convolve(ts[d], query[d, :window_size])

    last_product = first_product.copy()
    q_sum = np.sum(query[:, :window_size], axis=1)
    q_2sum = np.sum(query[:, :window_size] ** 2, axis=1)
    q_mu = q_sum / window_size
    with np.errstate(invalid="ignore"):
        q_sig = np.sqrt(np.maximum(q_2sum / window_size - q_mu**2, 0.0))
    drop = query[:, 0].copy()
    dp = np.empty((num_dim, pl))

    for i in range(num_queries):
        if skip_locs[i]:
            continue
        for d in range(num_dim):
            qw = query[d, i : i + window_size]
            if i > 0:
                q_sum[d] = q_sum[d] - drop[d] + qw[-1]
                q_2sum[d] = q_2sum[d] - drop[d] ** 2 + qw[-1] ** 2
                q_mu[d] = q_sum[d] / window_size
                sig2 = q_2sum[d] / window_size - q_mu[d] ** 2
                if sig2 < _EPS:
                    sig2 = _EPS
                q_sig[d] = np.sqrt(sig2)
                last_product[d, 1:] = (
                    last_product[d, : data_length - window_size]
                    - ts[d, : data_length - window_size] * drop[d]
                    + ts[d, window_size:] * qw[-1]
                )
                last_product[d, 0] = first_product[d, i]
            dp[d] = MS.distance_profile(
                last_product[d], window_size, data_mu[d], data_sig[d],
                q_mu[d], q_sig[d],
            )
            dp[d] = MS.apply_exclusion_zone(ez, False, window_size,
                                            data_length, i, dp[d])
            dp[d, dp[d] < _EPS] = 0
            drop[d] = qw[0]
        if np.any(q_sig < _EPS):
            continue
        dp[:, skip_locs] = np.inf
        dp[data_sig < np.sqrt(_EPS)] = np.inf

        dim_order = np.argsort(dp, axis=0)
        dp_sorted = np.sort(dp, axis=0)
        csum = np.zeros(pl)
        for d in range(num_dim):
            csum += dp_sorted[d]
            mean_d = csum / (d + 1)
            upd = mean_d < mp[d]
            mp[d, upd] = mean_d[upd]
            pi[d, upd] = i
            if return_dimension:
                pd_out[d][:, upd] = dim_order[: d + 1, upd]
            updl = np.zeros(pl, dtype=bool)
            updl[i:] = mean_d[i:] < lmp[d, i:]
            lmp[d, updl] = mean_d[updl]
            lpi[d, updl] = i
            updr = np.zeros(pl, dtype=bool)
            updr[:i] = mean_d[:i] < rmp[d, :i]
            rmp[d, updr] = mean_d[updr]
            rpi[d, updr] = i

    return {
        "mp": mp, "pi": pi, "pd": pd_out,
        "rmp": rmp, "rpi": rpi, "lmp": lmp, "lpi": lpi,
        "metric": "euclidean", "w": window_size, "ez": ez,
        "join": False, "sample_pct": 1,
        "data": {"ts": ts, "query": None},
        "class": "MatrixProfile", "algorithm": "mstomp",
    }

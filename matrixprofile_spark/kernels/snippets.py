"""Snippets: representative-subsequence summarization.

Contract of /root/reference/matrixprofile/algorithms/snippets.py:17-126:
zero-pad to a multiple of snippet_size, one MPDist-vector per candidate
(stride snippet_size, query length snippet_size−1), greedy min-coverage
selection, neighbor index sets and fractions — including the padding /
tail-index fix-ups.
"""

from __future__ import annotations

import numpy as np

from matrixprofile_spark.kernels.mpdist import mpdist_vector


def snippets(
    ts: np.ndarray,
    snippet_size: int,
    num_snippets: int = 2,
    window_size: int | None = None,
) -> list[dict]:
    ts = np.asarray(ts, dtype=np.float64)
    time_series_len = len(ts)
    n = len(ts)
    if not isinstance(snippet_size, int) or snippet_size < 4:
        raise ValueError("snippet_size must be an integer >= 4")
    if n < 2 * snippet_size:
        raise ValueError("Time series is too short relative to snippet length")
    if not window_size:
        window_size = int(np.floor(snippet_size / 2))
    if window_size >= snippet_size:
        raise ValueError("window_size must be smaller than snippet_size")

    num_zeros = int(snippet_size * np.ceil(n / snippet_size) - n)
    ts = np.concatenate((ts, np.zeros(num_zeros)))

    indices = np.arange(0, len(ts) - snippet_size, snippet_size)
    distances = np.array(
        [
            mpdist_vector(ts, ts[i : i + snippet_size - 1], int(window_size))
            for i in indices
        ]
    )

    out = []
    minis = np.inf
    total_min = None
    for _ in range(num_snippets):
        minims = np.inf
        index = -1
        for i in range(len(indices)):
            s = np.sum(np.minimum(distances[i, :], minis))
            if minims > s:
                minims = s
                index = i
        minis = np.minimum(distances[index, :], minis)
        actual_index = int(indices[index])
        out.append(
            {
                "index": actual_index,
                "snippet": ts[actual_index : actual_index + snippet_size],
                "distance": distances[index],
            }
        )
        total_min = (
            out[-1]["distance"]
            if total_min is None
            else np.minimum(total_min, out[-1]["distance"])
        )

    for snip in out:
        mask = snip["distance"] <= total_min
        arr = np.arange(len(mask))
        max_index = time_series_len - snippet_size
        snip["neighbors"] = [int(x) for x in arr[mask] if x <= max_index]
        if max_index in snip["neighbors"]:
            snip["neighbors"].extend(range(max_index + 1, time_series_len))
        snip["fraction"] = mask.sum() / (len(ts) - snippet_size)
        total_min = total_min - mask
        del snip["distance"]
    return out

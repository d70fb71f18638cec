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

    pad_len = int(snippet_size * np.ceil(n / snippet_size) - n)
    ts = np.concatenate((ts, np.zeros(pad_len)))

    starts = np.arange(0, len(ts) - snippet_size, snippet_size)
    # one MPDist curve per candidate: curves[c, j] = MPDist between
    # candidate c's snippet and the window starting at position j
    curves = np.array(
        [
            mpdist_vector(ts, ts[i : i + snippet_size - 1], int(window_size))
            for i in starts
        ]
    )

    out = []
    coverage = np.full(curves.shape[1], np.inf)
    overall_min = None
    for _ in range(num_snippets):
        # greedy min-coverage: pick the candidate whose curve lowers the
        # running per-position coverage the most (first index on ties —
        # argmin order, matching the reference's strict-improvement scan)
        best = int(np.argmin(np.minimum(curves, coverage).sum(axis=1)))
        coverage = np.minimum(curves[best], coverage)
        start = int(starts[best])
        out.append(
            {
                "index": start,
                "snippet": ts[start : start + snippet_size],
                "distance": curves[best],
            }
        )
        overall_min = (
            out[-1]["distance"]
            if overall_min is None
            else np.minimum(overall_min, out[-1]["distance"])
        )

    for snip in out:
        mask = snip["distance"] <= overall_min
        positions = np.arange(len(mask))
        max_index = time_series_len - snippet_size
        snip["neighbors"] = [int(x) for x in positions[mask] if x <= max_index]
        if max_index in snip["neighbors"]:
            snip["neighbors"].extend(range(max_index + 1, time_series_len))
        snip["fraction"] = mask.sum() / (len(ts) - snippet_size)
        # subtracting the bool mask lowers already-claimed positions so a
        # later snippet cannot re-claim them (reference fraction
        # bookkeeping, snippets.py:108-124)
        overall_min = overall_min - mask
        del snip["distance"]
    return out

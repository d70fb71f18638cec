"""Pure-NumPy kernel library (no Spark imports).

Re-derivations — not translations — of the reference's numeric kernels,
validated against the reference's own golden tests (tests/golden/*).
Each kernel is written to be Arrow-friendly: contiguous float64 in,
plain ndarrays/dicts out, so operators/profile.py can run them per
(conv_id, metric, w) group inside applyInPandas with zero per-row Python.
"""

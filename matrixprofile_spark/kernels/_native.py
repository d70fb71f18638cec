"""Optional compiled fast path for the MPX streaming-covariance scan.

The reference ships a Cython kernel (cympx.pyx) built at install time;
this engine's equivalent is a ~30-line C routine compiled once per host
with the system compiler and loaded via ctypes. The NumPy blocked
kernel in kernels/mpx.py remains the reference implementation and the
automatic fallback (no compiler, sandboxed executor, or
MPX_SPARK_NO_NATIVE=1).

The routine implements the same numeric contract as the NumPy kernel
(mpx.py module docstring): per-diagonal streaming covariance seeded by
an explicit dot product, df/dg difference-equation updates, strictly-
greater profile updates in ascending-diagonal order with the col-row
side written before the offset side. Summation order along a diagonal
is identical to the NumPy cumsum, so both paths agree to fp rounding of
the seed dot product.

The .so is cached in the system temp dir keyed by a hash of the source,
so Spark python workers on one host compile at most once (atomic
os.replace publish — concurrent workers race benignly).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = r"""
/* Matrix-profile diagonal scan: for each diagonal d in [lo, hi), stream
   the covariance recurrence and fold the Pearson correlation into the
   running profile on both ends of the pair (o, o+d). */
void mpx_self_diags(const double *ts, const double *mu, const double *sig,
                    const double *df, const double *dg,
                    long pl, long w, long lo, long hi,
                    double *mp, long *mpi)
{
    for (long d = lo; d < hi; d++) {
        double cov = 0.0;
        const double mud = mu[d], mu0 = mu[0];
        for (long k = 0; k < w; k++)
            cov += (ts[d + k] - mud) * (ts[k] - mu0);
        const long m = pl - d;
        for (long o = 0; o < m; o++) {
            if (o > 0)
                cov += df[o] * dg[o + d] + df[o + d] * dg[o];
            const double corr = cov * sig[o] * sig[o + d];
            const long j = o + d;
            if (corr > mp[j]) { mp[j] = corr; mpi[j] = o; }
            if (corr > mp[o]) { mp[o] = corr; mpi[o] = j; }
        }
    }
}

/* AB-join one-side scan: diagonals of series a (length pla windows)
   against query b (plb windows); profiles update on both sides. */
void mpx_ab_diags(const double *a, const double *mua, const double *siga,
                  const double *dfa, const double *dga,
                  const double *bq, const double *mub, const double *sigb,
                  const double *dfb, const double *dgb,
                  long pla, long plb, long w,
                  double *mpa, long *mpia, double *mpb, long *mpib)
{
    for (long d = 0; d < pla; d++) {
        long m = plb < pla - d ? plb : pla - d;
        if (m <= 0) break;
        double cov = 0.0;
        const double mud = mua[d], mu0 = mub[0];
        for (long k = 0; k < w; k++)
            cov += (a[d + k] - mud) * (bq[k] - mu0);
        for (long o = 0; o < m; o++) {
            if (o > 0)
                cov += dfa[o + d] * dgb[o] + dga[o + d] * dfb[o];
            const double corr = cov * siga[o + d] * sigb[o];
            const long i = o + d;
            if (corr > mpb[o]) { mpb[o] = corr; mpib[o] = i; }
            if (corr > mpa[i]) { mpa[i] = corr; mpia[i] = o; }
        }
    }
}
"""

_D = ctypes.POINTER(ctypes.c_double)
_L = ctypes.POINTER(ctypes.c_long)


def _build():
    if os.environ.get("MPX_SPARK_NO_NATIVE"):
        return None
    tag = hashlib.sha256(_SRC.encode()).hexdigest()[:16]
    cached = os.path.join(tempfile.gettempdir(), f"mpx_native_{tag}.so")
    if not os.path.exists(cached):
        try:
            with tempfile.TemporaryDirectory() as td:
                src = os.path.join(td, "mpx_native.c")
                so = os.path.join(td, "mpx_native.so")
                with open(src, "w") as f:
                    f.write(_SRC)
                subprocess.run(
                    ["cc", "-O3", "-march=native", "-fPIC", "-shared",
                     "-o", so, src],
                    check=True, capture_output=True, timeout=120,
                )
                os.replace(so, cached)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(cached)
        lib.mpx_self_diags.argtypes = [
            _D, _D, _D, _D, _D,
            ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            _D, _L,
        ]
        lib.mpx_self_diags.restype = None
        lib.mpx_ab_diags.argtypes = [
            _D, _D, _D, _D, _D, _D, _D, _D, _D, _D,
            ctypes.c_long, ctypes.c_long, ctypes.c_long,
            _D, _L, _D, _L,
        ]
        lib.mpx_ab_diags.restype = None
        return lib
    except Exception:
        return None


_LIB = _build()


def available() -> bool:
    return _LIB is not None


def _ptr_d(a: np.ndarray):
    return a.ctypes.data_as(_D)


def _ptr_l(a: np.ndarray):
    return a.ctypes.data_as(_L)


def self_diags(ts, mu, sig, df, dg, pl, w, lo, hi, mp, mpi) -> None:
    _LIB.mpx_self_diags(
        _ptr_d(ts), _ptr_d(mu), _ptr_d(sig), _ptr_d(df), _ptr_d(dg),
        pl, w, lo, hi, _ptr_d(mp), _ptr_l(mpi),
    )


def ab_diags(a, mua, siga, dfa, dga, bq, mub, sigb, dfb, dgb,
             pla, plb, w, mpa, mpia, mpb, mpib) -> None:
    _LIB.mpx_ab_diags(
        _ptr_d(a), _ptr_d(mua), _ptr_d(siga), _ptr_d(dfa), _ptr_d(dga),
        _ptr_d(bq), _ptr_d(mub), _ptr_d(sigb), _ptr_d(dfb), _ptr_d(dgb),
        pla, plb, w, _ptr_d(mpa), _ptr_l(mpia), _ptr_d(mpb), _ptr_l(mpib),
    )

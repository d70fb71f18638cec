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

The .so is cached in a user-owned 0700 cache dir keyed by a hash of
the source + machine + compiler identity, so Spark python workers on
one host compile at most once (atomic os.replace publish — concurrent
workers race benignly). Before loading, the cache file's ownership is
verified (a world-writable shared path would let another local user
pre-plant a library) and a zero-input self-test call checks the ABI;
any failure falls back to the NumPy kernel.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = r"""
#include <stdint.h>

/* Matrix-profile diagonal scan: for each diagonal d in [lo, hi), stream
   the covariance recurrence and fold the Pearson correlation into the
   running profile on both ends of the pair (o, o+d). */
void mpx_self_diags(const double *ts, const double *mu, const double *sig,
                    const double *df, const double *dg,
                    int64_t pl, int64_t w, int64_t lo, int64_t hi,
                    double *mp, int64_t *mpi)
{
    for (int64_t d = lo; d < hi; d++) {
        double cov = 0.0;
        const double mud = mu[d], mu0 = mu[0];
        for (int64_t k = 0; k < w; k++)
            cov += (ts[d + k] - mud) * (ts[k] - mu0);
        const int64_t m = pl - d;
        for (int64_t o = 0; o < m; o++) {
            if (o > 0)
                cov += df[o] * dg[o + d] + df[o + d] * dg[o];
            const double corr = cov * sig[o] * sig[o + d];
            const int64_t j = o + d;
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
                  int64_t pla, int64_t plb, int64_t w,
                  double *mpa, int64_t *mpia, double *mpb, int64_t *mpib)
{
    for (int64_t d = 0; d < pla; d++) {
        int64_t m = plb < pla - d ? plb : pla - d;
        if (m <= 0) break;
        double cov = 0.0;
        const double mud = mua[d], mu0 = mub[0];
        for (int64_t k = 0; k < w; k++)
            cov += (a[d + k] - mud) * (bq[k] - mu0);
        for (int64_t o = 0; o < m; o++) {
            if (o > 0)
                cov += dfa[o + d] * dgb[o] + dga[o + d] * dfb[o];
            const double corr = cov * siga[o + d] * sigb[o];
            const int64_t i = o + d;
            if (corr > mpb[o]) { mpb[o] = corr; mpib[o] = i; }
            if (corr > mpa[i]) { mpa[i] = corr; mpia[i] = o; }
        }
    }
}
"""

_D = ctypes.POINTER(ctypes.c_double)
_L = ctypes.POINTER(ctypes.c_int64)
_I64 = ctypes.c_int64


def _ptr_d(a: np.ndarray):
    return a.ctypes.data_as(_D)


def _ptr_l(a: np.ndarray):
    return a.ctypes.data_as(_L)


def _cache_tag() -> str:
    """Source + machine + compiler identity: a binary built for another
    microarchitecture (VM migration, shared cache volume) or by another
    compiler gets a different name instead of a SIGILL mid-job."""
    import platform

    try:
        ccv = subprocess.run(
            ["cc", "-dumpversion"], capture_output=True, timeout=10
        ).stdout
    except Exception:
        ccv = b"?"
    ident = _SRC.encode() + b"|" + platform.machine().encode() + b"|" + ccv
    return hashlib.sha256(ident).hexdigest()[:16]


def _cache_dir() -> str:
    """User-owned 0700 cache dir (never the shared world-writable temp
    root — another local user could pre-plant a .so there)."""
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    for root in (base, tempfile.gettempdir()):
        d = os.path.join(root, f"mpx_spark-{os.getuid()}")
        try:
            os.makedirs(d, mode=0o700, exist_ok=True)
            os.chmod(d, 0o700)
            if os.stat(d).st_uid == os.getuid():
                return d
        except OSError:
            continue
    raise OSError("no writable user-owned cache dir")


def _self_test(lib) -> bool:
    """Zero-input call: exercises argument marshaling and the store
    paths (an ABI mismatch shows up as garbage indices or wrong fills)."""
    pl, w = 6, 2
    z = np.zeros(pl + w - 1)
    zz = np.zeros(pl)
    mp = np.full(pl, -1.0)
    mpi = np.full(pl, -1, dtype=np.int64)
    lib.mpx_self_diags(
        _ptr_d(z), _ptr_d(zz), _ptr_d(zz), _ptr_d(zz), _ptr_d(zz),
        pl, w, 1, pl, _ptr_d(mp), _ptr_l(mpi),
    )
    return bool((mp == 0.0).all() and (mpi >= 0).all() and (mpi < pl).all())


def _build():
    if os.environ.get("MPX_SPARK_NO_NATIVE"):
        return None
    try:
        cached = os.path.join(_cache_dir(), f"mpx_native_{_cache_tag()}.so")
    except Exception:
        return None
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
        if os.stat(cached).st_uid != os.getuid():
            return None
        lib = ctypes.CDLL(cached)
        lib.mpx_self_diags.argtypes = [
            _D, _D, _D, _D, _D,
            _I64, _I64, _I64, _I64,
            _D, _L,
        ]
        lib.mpx_self_diags.restype = None
        lib.mpx_ab_diags.argtypes = [
            _D, _D, _D, _D, _D, _D, _D, _D, _D, _D,
            _I64, _I64, _I64,
            _D, _L, _D, _L,
        ]
        lib.mpx_ab_diags.restype = None
        if not _self_test(lib):
            return None
        return lib
    except Exception:
        return None


_LIB = _build()


def available() -> bool:
    return _LIB is not None


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

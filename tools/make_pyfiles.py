"""Build dist/matrixprofile_spark.zip for `spark-submit --py-files`.

Pure-python package zip (the compiled MPX kernel falls back to the NumPy
path on executors without a C toolchain; ship the .so alongside via
`--files` if the cluster image has a matching ABI).
"""

from __future__ import annotations

import os
import zipfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str | None = None) -> str:
    out = out or os.path.join(HERE, "dist", "matrixprofile_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(HERE, "matrixprofile_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for f in sorted(files):
                if f.endswith((".pyc", ".so")) or "__pycache__" in root:
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, HERE))
    return out


if __name__ == "__main__":
    print(build())

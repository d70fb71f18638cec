"""Isolate the tier-write anti-scaling: time writes of a cached 1m tier
at a given core count, varying partition count and codec."""
import json
import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from bench import force, make_spark, synth_long_series  # noqa: E402


def run(cores: int) -> dict:
    spark = make_spark(cores, f"write-probe-{cores}")
    from matrixprofile_spark.operators import rollup

    ser = synth_long_series(spark, 2048, 65536)
    r1m = rollup.rollup_from_raw(ser, 60).cache()
    n = r1m.count()
    out = {"cores": cores, "tier_rows": n}

    def t_write(df, codec="snappy"):
        best = None
        for _ in range(2):
            tmp = tempfile.mkdtemp(prefix="probe_w_", dir="/dev/shm")
            t0 = time.time()
            df.write.mode("overwrite").option("compression", codec).parquet(f"{tmp}/t")
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            shutil.rmtree(tmp, ignore_errors=True)
        return round(best, 3)

    out["write_asis"] = t_write(r1m)
    out["write_coalesce_cores"] = t_write(r1m.coalesce(cores))
    out["write_none"] = t_write(r1m, "none")
    out["read_agg_1h"] = None
    # and the downstream read+agg cost from a materialized tier
    tmp = tempfile.mkdtemp(prefix="probe_rd_", dir="/dev/shm")
    r1m.write.mode("overwrite").parquet(f"{tmp}/t")
    rd = spark.read.parquet(f"{tmp}/t")
    agg = rollup.rollup_cascade(rd, 3600)
    force(agg)
    t0 = time.time()
    force(agg)
    out["read_agg_1h"] = round(time.time() - t0, 3)
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
    return out


if __name__ == "__main__":
    print(json.dumps(run(int(sys.argv[1]))), flush=True)

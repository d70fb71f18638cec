"""One-off experiment: which cascade component breaks 4->16 scaling?

Times, per core count: (a) 1m rollup WITH min_by/max_by, no write;
(b) 1m rollup codegen-only sketch, no write; (c) tier writes to shm;
prints a JSON line per component.
"""
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
    spark = make_spark(cores, f"cascade-probe-{cores}")
    from pyspark.sql import functions as F

    from matrixprofile_spark.operators import rollup

    ser = synth_long_series(spark, 2048, 65536).cache()
    n = ser.count()
    v = F.col("value")

    full = rollup.rollup_from_raw(ser, 60)
    prim = (
        ser.where(v.isNotNull())
        .groupBy("conv_id", "metric", (F.floor(F.col("ts_epoch") / 60) * 60).alias("b"))
        .agg(F.count(v).alias("cnt"), F.sum(v).alias("vsum"),
             F.min(v).alias("vmin"), F.max(v).alias("vmax"),
             F.sum(v * v).alias("ssq"))
    )
    # struct-packed first/last variant
    st = F.struct(F.col("ts_epoch"), v)
    packed = (
        ser.where(v.isNotNull())
        .groupBy("conv_id", "metric", (F.floor(F.col("ts_epoch") / 60) * 60).alias("b"))
        .agg(F.count(v).alias("cnt"), F.sum(v).alias("vsum"),
             F.min(v).alias("vmin"), F.max(v).alias("vmax"),
             F.sum(v * v).alias("ssq"),
             F.min(st).getField("value").alias("vfirst"),
             F.max(st).getField("value").alias("vlast"))
    )
    out = {"cores": cores, "points": n}
    for name, df in (("minby_1m", full), ("prim_1m", prim), ("struct_1m", packed)):
        force(df)  # warm
        best = None
        for _ in range(2):
            t0 = time.time()
            force(df)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    # write cost: materialize the 1m tier to shm parquet
    best = None
    for _ in range(2):
        tmp = tempfile.mkdtemp(prefix="probe_tiers_", dir="/dev/shm")
        t0 = time.time()
        full.write.mode("overwrite").parquet(f"{tmp}/r1m")
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        shutil.rmtree(tmp, ignore_errors=True)
    out["minby_1m_write"] = round(best, 3)
    spark.stop()
    return out


if __name__ == "__main__":
    print(json.dumps(run(int(sys.argv[1]))), flush=True)

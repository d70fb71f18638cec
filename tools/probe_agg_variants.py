"""Scratch experiment: scaling of 1m-rollup aggregate formulations.

Runs the raw->1m aggregation over the bench generator's dense series at
a given core count, for several sketch formulations, and prints wall
seconds per variant. Usage: python tools/probe_agg_variants.py CORES
[SERIES] [LEN]
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from bench import force, make_spark, synth_long_series  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1])
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    length = int(sys.argv[3]) if len(sys.argv) > 3 else 262144
    spark = make_spark(cores, f"aggvar-{cores}")
    from pyspark.sql import functions as F

    ser = synth_long_series(spark, k, length)
    v = F.col("value")
    b = (F.floor(F.col("ts_epoch") / 60) * 60).alias("b")

    prim_aggs = [
        F.count(v).alias("cnt"), F.sum(v).alias("vsum"),
        F.min(v).alias("vmin"), F.max(v).alias("vmax"),
        F.sum(v * v).alias("ssq"),
    ]

    variants = {
        "prim_only": lambda df: df.groupBy("conv_id", "metric", b).agg(*prim_aggs),
        "min_by": lambda df: df.groupBy("conv_id", "metric", b).agg(
            *prim_aggs,
            F.min_by(v, F.col("ts_epoch")).alias("vfirst"),
            F.max_by(v, F.col("ts_epoch")).alias("vlast"),
        ),
        "min_struct": lambda df: df.groupBy("conv_id", "metric", b).agg(
            *prim_aggs,
            F.min(F.struct("ts_epoch", "value")).alias("sfirst"),
            F.max(F.struct("ts_epoch", "value")).alias("slast"),
        ),
        # integer-valued metrics only: pack (ts, v) into DECIMAL(38,0)
        # = ts*2^52 + (v + 2^51); min/max stay codegen-able (fixed-width
        # 128-bit mutable buffer), decode after the agg
        "decimal_pack": lambda df: df.withColumn(
            "packed",
            (F.col("ts_epoch").cast("decimal(38,0)") * F.lit(1 << 52)
             + (F.round(v).cast("decimal(38,0)") + F.lit(1 << 51))),
        ).groupBy("conv_id", "metric", b).agg(
            *prim_aggs,
            F.min("packed").alias("pfirst"),
            F.max("packed").alias("plast"),
        ).select(
            "*",
            ((F.col("pfirst") % F.lit(1 << 52)) - F.lit(1 << 51))
            .cast("double").alias("vfirst"),
            ((F.col("plast") % F.lit(1 << 52)) - F.lit(1 << 51))
            .cast("double").alias("vlast"),
        ),
    }

    for name, fn in variants.items():
        for conf in (
            {"spark.sql.execution.useObjectHashAggregateExec": "true"},
            {"spark.sql.execution.useObjectHashAggregateExec": "false"},
        ):
            if name == "prim_only" and conf[
                "spark.sql.execution.useObjectHashAggregateExec"] == "false":
                continue
            for kk, vv in conf.items():
                spark.conf.set(kk, vv)
            df = fn(ser)
            force(df)  # warm codegen
            dt = None
            for _ in range(2):
                t0 = time.time()
                force(df)
                d = time.time() - t0
                dt = d if dt is None else min(dt, d)
            node = "obj" if conf[
                "spark.sql.execution.useObjectHashAggregateExec"] == "true" \
                else "sort"
            print(f"RESULT {name}/{node} cores={cores} sec={dt:.2f}",
                  flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

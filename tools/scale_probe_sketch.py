#!/usr/bin/env python
"""Scale probe for operators/sketch.py: measure the Bloom semi-join
reduction (rows entering the join Exchange with vs without pruning)
and the count-min table's bounded size as the input grows.

Usage: python tools/scale_probe_sketch.py [n1 n2 ...]
Prints one table row per fact size; paste into SCALE.md.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from azure_etl_spark.operators.sketch import (  # noqa: E402
    bloom_prune,
    bloom_table,
    cms_table,
)
from azure_etl_spark.session import session_builder  # noqa: E402


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [10**5, 10**6, 4 * 10**6]
    spark = (
        session_builder(
            app_name="sketch-probe", master="local[8]", shuffle_partitions=16
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # the regime the reduction exists for: dim NOT broadcastable, the
    # equi-join must shuffle — forced here so the toy-scale timings
    # reflect it (with a 10k-row dim Spark would broadcast and the
    # prune would only add overhead; at 10^8+ dim keys it cannot)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    n_dim = 10_000
    dim = (
        spark.range(0, n_dim)
        .select((F.col("id") * 997).alias("k"))
        .localCheckpoint()
    )
    bloom = bloom_table(dim, "k", num_bits=1 << 17, k=3).localCheckpoint()

    print(
        f"{'fact rows':>12} {'match rows':>11} {'pruned rows':>12} "
        f"{'FP rows':>8} {'prune s':>8} {'plain-join s':>12} "
        f"{'pruned-join s':>13} {'cms rows':>9}"
    )
    for n in sizes:
        # 1% of fact keys match the dim (the selective-join regime the
        # reduction exists for)
        fact = (
            spark.range(0, n)
            .select(
                F.when(F.col("id") % 100 == 0, (F.col("id") / 100).cast("bigint") % n_dim * 997)
                .otherwise(-F.col("id") - 1)
                .alias("fk"),
                F.col("id").alias("payload"),
            )
            .localCheckpoint()
        )
        t0 = time.time()
        pruned = bloom_prune(fact, bloom, "fk", num_bits=1 << 17, k=3)
        pn = pruned.count()
        t_prune = time.time() - t0
        match = fact.join(dim, fact.fk == dim.k, "left_semi").count()
        t0 = time.time()
        fact.join(dim, fact.fk == dim.k).count()
        t_plain = time.time() - t0
        t0 = time.time()
        pruned.join(dim, pruned.fk == dim.k).count()
        t_pruned_join = time.time() - t0
        cms_rows = cms_table(fact, "fk", depth=4, width=1024).count()
        print(
            f"{n:>12} {match:>11} {pn:>12} {pn - match:>8} "
            f"{t_prune:>8.2f} {t_plain:>12.2f} {t_pruned_join:>13.2f} "
            f"{cms_rows:>9}"
        )

    # KMV distinct-count: error stays inside the 1/sqrt(k-2) band and
    # the sketch stays k rows as distinct n grows 40x
    print()
    print(
        f"{'distinct n':>12} {'k':>6} {'n_seen':>7} {'est':>12} "
        f"{'rel err %':>9} {'build s':>8}"
    )
    from azure_etl_spark.operators.sketch import (  # noqa: E402
        kmv_distinct_estimate,
        kmv_table,
    )

    for n in sizes:
        df = spark.range(0, n).select(F.col("id").alias("v"))
        for k in (256, 1024):
            t0 = time.time()
            row = kmv_distinct_estimate(kmv_table(df, "v", k=k), k=k).collect()[0]
            t_build = time.time() - t0
            rel = 100.0 * abs(row["est"] - n) / n
            print(
                f"{n:>12} {k:>6} {row['n_seen']:>7} {row['est']:>12} "
                f"{rel:>9.2f} {t_build:>8.2f}"
            )

    # hash-width honesty: values CONFLATED by the hash before the
    # estimator even runs (n - distinct hashes); the 32-bit birthday
    # term n^2/2^33 is measurable at local sizes, 48-bit is zero
    from azure_etl_spark.operators.sketch import _row_hash  # noqa: E402

    print()
    print(f"{'distinct n':>12} {'conflated@32':>13} {'theory':>8} {'conflated@48':>13}")
    for n in sizes:
        df = spark.range(0, n).select(F.col("id").alias("v"))
        d32 = df.select(_row_hash(F.col("v"), 0, bits=32).alias("h")).distinct().count()
        d48 = df.select(_row_hash(F.col("v"), 0, bits=48).alias("h")).distinct().count()
        print(f"{n:>12} {n - d32:>13} {n * n // 2**33:>8} {n - d48:>13}")

    # grouped KMV hot-key skew: ONE key holds ~all distincts, so the
    # unsalted rank window sorts that key's whole distinct set in a
    # single task; salt_buckets splits it across S sorts with provably
    # identical output (kmv_grouped_table docstring). Times the build
    # + a full count at growing hot-key sizes.
    from azure_etl_spark.operators.sketch import kmv_grouped_table  # noqa: E402

    print()
    print(
        f"{'hot-key n':>12} {'unsalted s':>11} {'salted(64) s':>13} "
        f"{'rows equal':>10}"
    )
    for n in sizes:
        skewed = (
            spark.range(0, n)
            .select(
                F.when(F.col("id") % 1000 == 0, F.concat(F.lit("cold"), F.col("id") % 7))
                .otherwise(F.lit("hot"))
                .alias("g"),
                F.col("id").alias("v"),
            )
            .localCheckpoint()
        )
        t0 = time.time()
        plain = kmv_grouped_table(skewed, "g", "v", k=1024)
        plain_rows = sorted(map(tuple, plain.collect()))
        t_plain = time.time() - t0
        t0 = time.time()
        salted = kmv_grouped_table(skewed, "g", "v", k=1024, salt_buckets=64)
        salted_rows = sorted(map(tuple, salted.collect()))
        t_salted = time.time() - t0
        print(
            f"{n:>12} {t_plain:>11.2f} {t_salted:>13.2f} "
            f"{str(plain_rows == salted_rows):>10}"
        )

    spark.stop()


if __name__ == "__main__":
    main()

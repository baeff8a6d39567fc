#!/usr/bin/env python
"""Mega-bucket (boilerplate-cluster) blowup measurement (VERDICT r8
ask #2): plant a C-doc IDENTICAL-text cluster inside the sf0.1
documents — the 100 TB pathology is a ~100k-doc template cluster
whose band buckets emit B^2/2 candidate pairs each — and measure the
emission and wall of lsh_candidate_pairs uncapped vs bucket_cap=64.

The capped mode must emit exactly C-1 star edges for the planted
cluster (vs C(C,2) uncapped), leave natural pairs byte-identical
(every natural bucket is under the cap — asserted), and preserve the
connected-components dedup answer (pinned at oracle scale by the
lsh_bucket_cap_clusters verdict query and the planted-geometry pytest;
this script measures the SIZE effect at a pathological C).

Usage: python scripts/stress_megabucket.py [C]   (default 5000)
Prints one JSON dict; the committed table lives in PLANS.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F                     # noqa: E402

from nvd2mysqlloader_spark.functions.text import shingle3_udf  # noqa: E402
from nvd2mysqlloader_spark.operators._lineage import cut_lineage  # noqa: E402
from nvd2mysqlloader_spark.operators.dedup import (        # noqa: E402
    _band_explode, lsh_candidate_pairs, minhash_signatures)
from nvd2mysqlloader_spark.session import get_spark        # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_OFF = 10_000_000
CAP = 64


def timed(fn, reps: int = 3) -> tuple[float, int]:
    times, n = [], 0
    for r in range(1 + reps):
        t0 = time.perf_counter()
        n = fn()
        dt = time.perf_counter() - t0
        if r > 0:
            times.append(dt)
    return round(statistics.median(times), 3), n


def main() -> None:
    c = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    spark = get_spark("stress-megabucket")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    boiler = ("synthetic boilerplate template cluster shared header "
              "navigation footer copyright subscribe unsubscribe terms "
              "privacy contact")
    planted = spark.range(c).select(
        (F.lit(_OFF) + F.col("id")).alias("doc_id"),
        F.lit(boiler).alias("text"))
    all_docs = (docs.unionAll(planted)
                .repartition(spark.sparkContext.defaultParallelism))
    sigs = cut_lineage(minhash_signatures(
        all_docs.select("doc_id", shingle3_udf()("text").alias("s"))))

    # bucket-size distribution: the planted cluster is one size-C
    # bucket in each of the 16 bands; every natural bucket must sit
    # under the cap for 'untouched' to be exact
    dist = (sigs.select("doc_id",
                        _band_explode(16).alias("band_idx", "band_hash"))
            .groupBy("band_idx", "band_hash")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.max(F.col("doc_id") >= _OFF).alias("has_planted")))
    dist = dist.persist()
    stats = dist.agg(
        F.max("n").alias("max_bucket"),
        F.sum((F.col("n") > CAP).cast("long")).alias("overcap_buckets"),
        F.max(F.when(~F.col("has_planted"), F.col("n")))
        .alias("max_natural_bucket")).first()
    dist.unpersist()
    assert stats["max_natural_bucket"] <= CAP, stats

    t_un, n_un = timed(lambda: lsh_candidate_pairs(sigs).count())
    t_cap, n_cap = timed(
        lambda: lsh_candidate_pairs(sigs, bucket_cap=CAP).count())

    # exactness of the planted/natural split
    uncapped = lsh_candidate_pairs(sigs).persist()
    capped = lsh_candidate_pairs(sigs, bucket_cap=CAP).persist()
    plant = F.col("id_a") >= _OFF
    n_plant_un = uncapped.filter(plant).count()
    n_plant_cap = capped.filter(plant).count()
    nat_un = uncapped.filter(F.col("id_b") < _OFF)
    nat_cap = capped.filter(F.col("id_b") < _OFF)
    nat_diff = nat_un.exceptAll(nat_cap) \
        .unionAll(nat_cap.exceptAll(nat_un)).count()
    uncapped.unpersist()
    capped.unpersist()
    assert n_plant_un == c * (c - 1) // 2, n_plant_un
    assert n_plant_cap == c - 1, n_plant_cap
    assert nat_diff == 0

    out = {"sf_dir": SF_DIR, "planted_cluster": c, "cap": CAP,
           "max_bucket": stats["max_bucket"],
           "overcap_buckets": stats["overcap_buckets"],
           "max_natural_bucket": stats["max_natural_bucket"],
           "pairs_uncapped": n_un, "pairs_capped": n_cap,
           "planted_pairs_uncapped": n_plant_un,
           "planted_pairs_capped": n_plant_cap,
           "natural_pairs_diff": nat_diff,
           "uncapped_sec": t_un, "capped_sec": t_cap,
           "emission_ratio": round(n_un / max(n_cap, 1), 1),
           "wall_ratio": round(t_un / t_cap, 2)}
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()

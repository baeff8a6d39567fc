#!/usr/bin/env python
"""Probe-side admission-cap blowup measurement (VERDICT r9 ask #1):
persist the sf0.1 corpus PLUS a planted C-doc identical-text cluster
into a banded signature table, probe it with a fixed batch (natural
near-dup docs + P planted probe docs), and measure candidate emission
and probe wall uncapped vs ``max_candidates_per_new=64``.

This is the incremental twin of scripts/stress_megabucket.py: there
the pathology is the BATCH self-join's bucket, here it is a NEW batch
colliding with a PERSISTED boilerplate cluster — the probe emits
|probes|·C candidates uncapped (bounded, never corpus², but
unboundedly larger than the batch) vs |probes| anchor candidates
capped. Gate invariance (flagged set, anchor assignment, natural
pairs byte-identical) is pinned at oracle scale by the
``probe_admission_cap`` verdict query and pytest; this script
measures the SIZE effect at a pathological C.

Usage: python scripts/stress_probe_cap.py [C]   (default 5000)
Prints one JSON dict; the committed table lives in PLANS.md.
"""

from __future__ import annotations

import atexit
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F                     # noqa: E402

from nvd2mysqlloader_spark.functions.text import shingle3_udf  # noqa: E402
from nvd2mysqlloader_spark.operators.dedup import (        # noqa: E402
    incremental_minhash_candidates_banded, minhash_near_dups,
    write_banded_signature_table)
from nvd2mysqlloader_spark.session import get_spark        # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OFF_C, OFF_Q = 10_000_000, 20_000_000
CAP = 64
N_PROBES = 40
N_BUCKETS = int(os.environ.get("SPARK_GRAFT_NBUCKETS", "512"))


def shingle(df):
    return df.select("doc_id", shingle3_udf()("text").alias("s"))


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
    spark = get_spark("stress-probe-cap")
    root = tempfile.mkdtemp(prefix="probe_cap_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    boiler = ("synthetic boilerplate template cluster shared header "
              "navigation footer copyright subscribe unsubscribe terms "
              "privacy contact")
    planted = spark.range(c).select(
        (F.lit(OFF_C) + F.col("id")).alias("doc_id"),
        F.lit(boiler).alias("text"))
    probes = spark.range(N_PROBES).select(
        (F.lit(OFF_Q) + F.col("id")).alias("doc_id"),
        F.lit(boiler).alias("text"))

    # natural near-dup docs become the batch's natural half (same
    # move as stress_probe_prune: the probe must actually collide or
    # the natural-pairs-invariant leg is vacuous)
    dup_ids = [r["id_b"] for r in
               minhash_near_dups(shingle(docs), threshold=0.5)
               .select("id_b").distinct()
               .orderBy("id_b").limit(20).collect()]
    corpus = shingle(docs.filter(~F.col("doc_id").isin(dup_ids))
                     .unionAll(planted)
                     .repartition(spark.sparkContext.defaultParallelism))
    batch = shingle(docs.filter(F.col("doc_id").isin(dup_ids))
                    .unionAll(probes)).localCheckpoint(eager=True)
    n_batch = batch.count()

    path = f"{root}/banded"
    write_banded_signature_table(corpus, path, n_buckets=N_BUCKETS)

    t_un, n_un = timed(lambda: incremental_minhash_candidates_banded(
        spark, path, batch).count())
    t_cap, n_cap = timed(lambda: incremental_minhash_candidates_banded(
        spark, path, batch, max_candidates_per_new=CAP).count())

    # exactness of the planted/natural split + gate invariance
    unc = incremental_minhash_candidates_banded(spark, path, batch) \
        .persist()
    cap = incremental_minhash_candidates_banded(
        spark, path, batch, max_candidates_per_new=CAP).persist()
    plant = F.col("old_id") >= OFF_C
    n_plant_un = unc.filter(plant).count()
    n_plant_cap = cap.filter(plant).count()
    anchor_only = cap.filter(plant) \
        .filter(F.col("old_id") != OFF_C).count() == 0
    nat_diff = (unc.filter(~plant).exceptAll(cap.filter(~plant))
                .unionAll(cap.filter(~plant)
                          .exceptAll(unc.filter(~plant))).count())
    flag_diff = (unc.select("new_id").distinct()
                 .exceptAll(cap.select("new_id").distinct())
                 .unionAll(cap.select("new_id").distinct()
                           .exceptAll(unc.select("new_id").distinct()))
                 .count())
    unc.unpersist()
    cap.unpersist()
    assert n_plant_un == N_PROBES * c, n_plant_un
    assert n_plant_cap == N_PROBES, n_plant_cap
    assert anchor_only and nat_diff == 0 and flag_diff == 0

    out = {"sf_dir": SF_DIR, "planted_cluster": c, "cap": CAP,
           "n_buckets": N_BUCKETS, "batch_docs": n_batch,
           "cands_uncapped": n_un, "cands_capped": n_cap,
           "planted_cands_uncapped": n_plant_un,
           "planted_cands_capped": n_plant_cap,
           "natural_cands_diff": nat_diff,
           "flagged_set_diff": flag_diff,
           "uncapped_sec": t_un, "capped_sec": t_cap,
           "emission_ratio": round(n_un / max(n_cap, 1), 1),
           "wall_ratio": round(t_un / t_cap, 2)}
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()

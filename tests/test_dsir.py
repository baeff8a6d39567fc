"""DSIR data selection (plans/dsir_queries.py): the oracle proves
cross-engine exactness; these tests prove the METHOD works — the
importance weights actually rank target-like documents first and the
Gumbel resample measurably skews the selected set toward the target
distribution — plus the plan shape that makes it 100 TB-viable."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from nvd2mysqlloader_spark.plans.dsir_queries import (
    _TARGET, dsir_importance_weights, dsir_resample)

from .conftest import SF_ORACLE


def _lang_share(spark):
    from nvd2mysqlloader_spark.sources.tpch import load_table
    docs = load_table(spark, SF_ORACLE, "documents")
    n = docs.count()
    n_t = docs.filter(docs["lang"] == _TARGET).count()
    return n_t / n


def test_top_weights_are_target_dominated(spark):
    rows = dsir_importance_weights(spark, SF_ORACLE).collect()
    assert len(rows) == 25
    share = sum(r["lang"] == _TARGET for r in rows) / len(rows)
    # the corpus is ~44% target; the top of the weight ranking must
    # be far more target-like than chance
    assert share >= 0.7, share
    # weights are sorted descending with doc_id tie-break
    keys = [(-r["logw_fp"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)


def test_resample_skews_toward_target(spark):
    corpus_share = _lang_share(spark)
    sel = {r["lang"]: r["n_selected"]
           for r in dsir_resample(spark, SF_ORACLE).collect()}
    n = sum(sel.values())
    assert n == 100
    # selected-set target share must clearly beat the corpus share
    assert sel.get(_TARGET, 0) / n >= corpus_share + 0.1, (sel,
                                                           corpus_share)


def test_dsir_plan_is_broadcast_and_heap(spark):
    df = dsir_importance_weights(spark, SF_ORACLE)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    # the ≤4096-row model table broadcasts back onto the gram stream;
    # the corpus-sized side is never sort-merge joined
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    # top-25 is a heap, not a global sort
    assert "TakeOrderedAndProject" in p

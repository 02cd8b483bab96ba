"""Fleet-wide plan hygiene: EVERY registry query's physical plan is
swept for the two scale anti-patterns —

1. a Window fed by Exchange SinglePartition (one task runs the window
   over everything — the global-sort trap VERDICT r1 flagged), and
2. nested-loop / cartesian joins,

except where a whitelist entry records WHY the shape is safe (the
frame is provably driver-small by construction, or the query is the
documented exact/oracle baseline of a bucketed scale twin). New
queries fail this sweep by default: a scale regression has to be
argued into the whitelist, not slipped in.

Groupless aggregates also exchange to SinglePartition (32 partial rows
→ one final row) — harmless and NOT flagged: only a Window parent is.
Presentational final sorts (.orderBy for readable output) are likewise
not flagged; the driver's comparator sorts rows itself.
"""

from __future__ import annotations

import pytest

from dwds_livestream_spark.plans.registry import QUERIES

# Slow tier (pytest.ini): full-registry sweep / hypothesis suite —
# deselected from the default driver-budget run, in the release gate.
pytestmark = pytest.mark.slow


SF_DIR = "/root/testdata/sf0.001"

# Window-over-SinglePartition allowed ONLY for frames bounded by
# construction (not by the data); reason strings are the audit trail.
GLOBAL_WINDOW_OK = {
    "hybrid_rrf": "fusion input is two top-k lists (<= 2k rows)",
    "rbo_rankings": "rankings are two top-k lists; tail table is depth rows",
    "hll_rolling_distinct": "frame is one row per DAY (sketch table)",
    "decile_lift": "cumulative share over the 10-row decile summary",
    "quantile_rollup": "cumulative over <= 64 merged histogram bins",
    "vocab_growth": "cumulative over the 10-row decile growth frame",
    "quota_sample_ks": "ECDF cumsum over the (value, count) histogram "
                       "- bounded by the value domain, both sides "
                       "pre-aggregated",
    "dedup_yield_curve": "cumulative ledger size over the per-batch "
                         "summary - one row per replayed snapshot, "
                         "calendar-sized by construction",
    "paragraph_yield_curve": "cumulative distinct-span ledger over the "
                             "per-batch summary - one row per snapshot, "
                             "calendar-sized by construction",
}

# nested-loop joins allowed ONLY when one side is bounded (1-row stats
# frames, broadcast constant tables) or the query is the documented
# exact baseline of a bucketed twin.
NESTED_LOOP_OK = {
    "range_join_order_week": "binned equi-join; residual check is bin-local",
    "regex_antijoin": "pattern table broadcast-small by contract",
    "countmin_words": "1-row bounds cross join",
    "quota_sample_ks": "1-row ECDF-totals cross join",
    "token_js_divergence": "1-row corpus-token-total cross join "
                           "(scalar broadcast; counts join by token "
                           "and group keys)",
    "ks_source_panel": "two bounded cross joins: the 1-row n_ref scalar, "
                       "and the group x distinct-reference-value "
                       "evaluation grid (value-domain-bounded, reference "
                       "histogram broadcast); corpus-sized frames join "
                       "by key",
    "ks_value_binned": "1-row bin-range + reference-total cross joins "
                       "(scalars broadcast; histograms join by key)",
    "psi_drift": "1-row bin-range cross join (the _ks_quantize grid "
                 "scalar; the bin densify is a sequence explode over "
                 "the pair frame, not a join)",
    "ks_drift_binned": "1-row bin-range cross join (scalar broadcast; "
                       "everything downstream joins by key)",
    "bm25_topk": "1-row corpus-stats cross join",
    "lm_perplexity": "1-row model-stats cross join",
    "ppl_buckets": "1-row tercile-bounds cross join",
    "length_filter": "1-row percentile-bounds cross join",
    "winsorize": "1-row bounds cross join",
    "mad_outliers": "1-row stats cross join",
    "heavy_hitters": "1-row total cross join",
    "dsir_weights": "vocab-LM tables broadcast",
    "decile_lift": "1-row totals cross join",
    "value_histogram": "1-row min/max bounds cross join",
    "embedding_quantize": "d-row bounds cross join",
    "embedding_norms": "1-row corpus stats",
    "similarity_topk": "query chunk broadcast by design (GEMM)",
    "embedding_near_dup": "exact oracle baseline; scale twin is LSH",
    "dedup_clusters": "exact oracle baseline; scale twin is dedup_clusters_ann",
    "stats_regression": "1-row fit coefficients cross join",
    "events_profile": "1-row profile aggregate",
    "time_weighted_avg": "1-row horizon bounds",
    "expectations": "1-row rule aggregate",
    "ab_test": "1-row test statistic",
    "curation_pipeline": "1-row stats from the quality stage",
    "text_quality": "1-row corpus stats",
    "winnow_fingerprints": "1-row window constant",
    "split_report": "1-row totals",
    "hybrid_rrf": "1-row corpus-stats cross join (BM25 stage)",
    "rbo_rankings": "1-row corpus-stats cross join (BM25 stage)",
    "pmi_collocations": "1-row total-counts cross join",
    "q11_important_parts": "1-row scalar-subquery threshold (TPC-H Q11 shape)",
    "q22_idle_customers": "1-row scalar-avg cross join (TPC-H Q22 shape)",
    "spend_percent_rank": "bucket-bounds broadcast (distributed_rank)",
    "rolling_active_users": "1-row date-bounds cross join",
    "quantile_rollup": "64-bin histogram x 3-row quantile-list join",
    "mixture_plan": "1-row total-tokens cross join",
    "bm25_index_topk": "1-row corpus-stats cross join (same as bm25_topk)",
    "lm_artifact_ppl": "1-row vocab-size cross join (same as lm_perplexity)",
    "quantile_rollup_by_type": "keyed histogram x 3-row quantile-list join",
    "spend_gini": "bucket-bounds broadcast (distributed_rank)",
    "decile_join": "bucket-bounds broadcast (distributed_rank)",
    "drift_panel_join": "1-row bin-range cross join inherited from the "
                        "PSI/KS legs' shared _ks_quantize grid scalar; "
                        "the panel joins themselves are keyed",
}


def _indent(line: str) -> int:
    return len(line) - len(line.lstrip(" :+-*"))


def _single_partition_window_lines(plan: str) -> list[str]:
    """Lines where an Exchange SinglePartition feeds a Window parent."""
    lines = plan.splitlines()
    bad = []
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        my = _indent(ln)
        for j in range(i - 1, -1, -1):
            if _indent(lines[j]) < my and lines[j].strip():
                if "Window" in lines[j]:
                    bad.append(lines[j].strip()[:160])
                break
    return bad


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_hygiene(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()

    if name not in GLOBAL_WINDOW_OK:
        bad = _single_partition_window_lines(plan)
        assert not bad, f"{name}: Window over SinglePartition — {bad[0]}"

    if name not in NESTED_LOOP_OK:
        for marker in ("CartesianProduct", "BroadcastNestedLoopJoin"):
            assert marker not in plan, (
                f"{name}: {marker} in plan (whitelist with a reason if "
                f"one side is bounded by construction)"
            )

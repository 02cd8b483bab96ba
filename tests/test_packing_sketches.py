"""Sequence packing, frequency sketches, and semantic dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from dwds_livestream_spark.operators.packing import pack_stats, sequence_pack
from dwds_livestream_spark.operators.sketches import (
    heavy_hitters,
    misra_gries_topk,
)
from dwds_livestream_spark.operators.similarity import semantic_dedup

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_sequence_pack_budget_and_contiguity(spark):
    # 1 shard so the fill order is just doc_id order
    docs = _docs(
        spark,
        [(i, "s", " ".join(["w"] * 10)) for i in range(10)],  # 10 tokens each
    )
    packed = sequence_pack(docs, budget=25, n_shards=1).collect()
    by_id = {r.doc_id: r for r in sorted(packed, key=lambda r: r.doc_id)}
    # cumulative-exclusive tokens: 0,10,20,... -> floor(/25): 0,0,0,1,1,2,...
    assert [by_id[i].pack_no for i in range(10)] == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]
    # positions restart per pack and follow doc_id order
    assert [by_id[i].pack_pos for i in range(3)] == [0, 1, 2]
    assert by_id[3].pack_pos == 0
    stats = {r.pack_no: r for r in pack_stats(
        sequence_pack(docs, budget=25, n_shards=1), budget=25).collect()}
    assert stats[0].n_docs == 3 and stats[0].pack_tokens == 30
    assert round(stats[0].fill_ratio, 2) == 1.2  # greedy fill may overflow


def test_sequence_pack_sharding_is_disjoint_and_total(spark):
    docs = _docs(spark, [(i, f"s{i % 2}", "a b c") for i in range(40)])
    packed = sequence_pack(docs, budget=6, n_shards=4)
    assert packed.count() == 40  # every doc assigned exactly once
    assert packed.select("doc_id").distinct().count() == 40
    # shard is doc-derived, not source-derived
    assert packed.select("shard").distinct().count() == 4


def test_heavy_hitters_exact_share(spark):
    rows = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 15 + [("d",)] * 5
    df = spark.createDataFrame(rows, "item string")
    hh = {r.item: r for r in heavy_hitters(df, "item", min_share=0.1).collect()}
    assert set(hh) == {"a", "b", "c"}
    assert hh["a"].cnt == 50 and abs(hh["a"].share - 0.5) < 1e-9


def test_misra_gries_superset_of_frequent(spark):
    # n = 1000; with k=9 every item with freq > n/(k+1)=100 MUST survive
    rows = (
        [("hot1",)] * 300
        + [("hot2",)] * 200
        + [("warm",)] * 120
        + [(f"noise{i % 95}",) for i in range(380)]
    )
    df = spark.createDataFrame(rows, "item string").repartition(8)
    got = {r.item for r in misra_gries_topk(df, "item", k=9).collect()}
    assert {"hot1", "hot2", "warm"} <= got
    # and the merged summary is bounded by k
    assert len(got) <= 9


def test_misra_gries_weight_is_lower_bound(spark):
    rows = [("x",)] * 500 + [(f"n{i}",) for i in range(100)]
    df = spark.createDataFrame(rows, "item string").repartition(4)
    res = {r.item: r.weight_lb for r in misra_gries_topk(df, "item", k=8).collect()}
    assert res["x"] <= 500
    assert res["x"] >= 500 - (600 // (8 + 1)) - 8  # n/(k+1) per partition merge slack


def test_semantic_dedup_clustered_matches_exact(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = {
        (r.vec_id, r.cluster_id, r.keep, r.cluster_size)
        for r in semantic_dedup(emb, threshold=0.5, exact=True).collect()
    }
    clustered = {
        (r.vec_id, r.cluster_id, r.keep, r.cluster_size)
        for r in semantic_dedup(
            emb, threshold=0.5, exact=False, n_centroids=4
        ).collect()
    }
    # clustered path can only MISS cross-cell pairs; on this data it
    # should find everything — require >= 95% agreement and identical
    # vector coverage
    assert len(clustered) == len(exact)
    agree = len(exact & clustered)
    assert agree / len(exact) >= 0.95
    # exactly one representative per cluster, and it's the min id
    reps = [r for r in semantic_dedup(emb, threshold=0.5, exact=True)
            .where("keep").collect()]
    assert all(r.vec_id == r.cluster_id for r in reps)


def test_approx_distinct_error_bounded(spark):
    """HLL++ per-source distinct vocab within 5% of exact (2% target
    rsd leaves headroom for small-group variance)."""
    from dwds_livestream_spark.plans.llm import q_approx_distinct

    rows = q_approx_distinct(spark, "/root/testdata/sf0.001").collect()
    assert rows, "no groups"
    for r in rows:
        err = abs(r.approx_vocab - r.exact_vocab) / r.exact_vocab
        assert err <= 0.05, f"{r.source}: {r.approx_vocab} vs {r.exact_vocab}"


def test_countmin_never_undercounts(spark):
    from pyspark.sql import Row

    from dwds_livestream_spark.operators.sketches import (
        countmin_estimate,
        countmin_sketch,
    )

    rows = [Row(w=w) for w in ["a"] * 50 + ["b"] * 20 + ["c"] * 5 +
            [f"rare{i}" for i in range(40)]]
    df = spark.createDataFrame(rows)
    # width 8 forces collisions: estimates may overcount, never under
    sk = countmin_sketch(df, "w", width=8, depth=4)
    est = {
        r["item"]: r["est"]
        for r in countmin_estimate(
            sk, df.distinct(), "w", width=8, depth=4
        ).collect()
    }
    true = {"a": 50, "b": 20, "c": 5, **{f"rare{i}": 1 for i in range(40)}}
    assert set(est) == set(true)
    for k, t in true.items():
        assert est[k] >= t, (k, est[k], t)
    # total mass bound: any estimate <= total stream length
    assert max(est.values()) <= len(rows)
    # with 115 items in 8 cells somebody MUST have collided
    assert any(est[k] > true[k] for k in true)


def test_countmin_weighted_equals_raw_occurrences(spark):
    """Sketching pre-aggregated (item, cnt) rows via weight_col yields
    BIT-IDENTICAL cells to sketching the raw occurrence stream — the
    optimization countmin_words relies on (cell addition commutes with
    the pre-aggregation)."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from dwds_livestream_spark.operators.sketches import countmin_sketch

    rows = [Row(w=w) for w in ["a"] * 7 + ["b"] * 3 + ["c"] * 11 +
            [f"x{i}" for i in range(20)]]
    df = spark.createDataFrame(rows)
    raw = countmin_sketch(df, "w", width=8, depth=4)
    wc = df.groupBy("w").agg(F.count("*").alias("cnt"))
    agg = countmin_sketch(wc, "w", width=8, depth=4, weight_col="cnt")
    as_map = lambda sk: {  # noqa: E731
        (r["d"], r["pos"]): r["cnt"] for r in sk.collect()
    }
    assert as_map(raw) == as_map(agg)


def test_countmin_sketch_is_bounded(spark):
    from pyspark.sql import Row

    from dwds_livestream_spark.operators.sketches import countmin_sketch

    df = spark.createDataFrame([Row(w=f"w{i}") for i in range(500)])
    sk = countmin_sketch(df, "w", width=16, depth=3).collect()
    assert len(sk) <= 16 * 3
    assert sum(r["cnt"] for r in sk) == 500 * 3


def test_bloom_semi_join_equals_exact(spark):
    from pyspark.sql import Row

    from dwds_livestream_spark.operators.bloom import (
        bloom_prefilter_semi_join,
    )

    probe = spark.createDataFrame([Row(k=i, v=i * 10) for i in range(1000)])
    build = spark.createDataFrame([Row(bk=i) for i in range(0, 1000, 7)])
    got = bloom_prefilter_semi_join(
        probe, build, key="k", build_key="bk", m_bits=1 << 10, k_hashes=3
    )
    exact = probe.join(
        build.select(F.col("bk").alias("k")), "k", "left_semi"
    )
    assert sorted(r["k"] for r in got.collect()) == sorted(
        r["k"] for r in exact.collect()
    )
    # the Bloom stage is broadcast joins only — the probe side must not
    # shuffle before the exact join
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 3


def test_bloom_positions_prune_misses(spark):
    from pyspark.sql import Row

    from dwds_livestream_spark.operators.bloom import (
        bloom_positions,
        bloom_prefilter_semi_join,
    )

    # disjoint probe/build: bloom admits ~FP-rate of probe; with
    # m=2^16 and 10 build keys the FP rate is ~(k*n/m)^k ≈ 1e-9
    probe = spark.createDataFrame([Row(k=i) for i in range(10_000, 11_000)])
    build = spark.createDataFrame([Row(k=i) for i in range(10)])
    assert bloom_prefilter_semi_join(
        probe, build, key="k", m_bits=1 << 16, k_hashes=3
    ).count() == 0
    assert bloom_positions(build, "k", 1 << 16, 3).count() <= 30

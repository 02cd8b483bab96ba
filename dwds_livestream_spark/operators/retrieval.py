"""BM25 full-text retrieval: score every document against a bag of
query terms, return the top-k.

Beyond-reference operator (project brief: text analysis over the
documents table). The reference's only text matching is predicate
filtering (access_log.clj:22-31 substring tests); this adds ranked
retrieval — the Okapi BM25 function used by Lucene/Elasticsearch.

Scale design (100 TB): for a query of q terms there is NO inverted
index, NO explode, and NO per-term shuffle:

- per-doc term frequencies are a pure projection — ``size(filter(toks,
  x -> x == term))`` per query term — one tokenize pass, q countings of
  an in-row array, all inside whole-stage codegen;
- corpus statistics (N, avgdl, per-term document frequencies) reduce in
  ONE single-row aggregate (q conditional counts + avg + count), which
  is then cross-joined back (a 1-row broadcast, not a shuffle);
- the final top-k is a TakeOrdered (per-partition heap + driver merge
  of k·partitions rows), never a full sort.

A persisted deployment would precompute (N, avgdl, df) once per corpus
snapshot; the per-query cost is then one scan + heap — embarrassingly
parallel and index-free, which at 100 TB beats maintaining a
distributed inverted index unless query volume is extreme.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def bm25_part(tf, df, n_docs, avgdl, dl, k1: float, b: float):
    """One term's BM25 contribution (RSJ/Lucene idf) as a Column —
    SHARED with the persisted index (operators/text_index.py), whose
    exact-parity gate against bm25_topk would silently break if the
    two formulas could drift."""
    idf = F.log((n_docs - df + 0.5) / (df + 0.5) + 1)
    norm = F.lit(k1) * (1 - b + F.lit(b) * dl / avgdl)
    return idf * tf * (k1 + 1) / (tf + norm)


def bm25_topk(
    documents: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``topk`` docs by BM25 score against ``query_terms``.

    idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1)  (Robertson-Sparck
    Jones, the Lucene variant — always positive).
    Output: doc_id, score (rounded 1e-6), desc score / asc doc_id order.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = list(dict.fromkeys(t.lower() for t in query_terms))
    toks = tokens(F.lower(F.col(text_col)))

    def _tf(term: str):
        # NB: a 2-arg lambda would make F.filter pass the element INDEX
        # as the second argument — bind the term via closure instead.
        return F.size(F.filter("__toks", lambda x: x == F.lit(term)))

    tf_cols = [_tf(t).alias(f"__tf_{i}") for i, t in enumerate(terms)]
    scored = documents.select(
        F.col(id_col).alias("doc_id"), toks.alias("__toks")
    ).select("doc_id", F.size("__toks").alias("dl"), *tf_cols)

    stats = scored.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.count(F.when(F.col(f"__tf_{i}") > 0, 1)).alias(f"__df_{i}")
            for i in range(len(terms))
        ],
    )

    score = None
    for i in range(len(terms)):
        part = bm25_part(
            F.col(f"__tf_{i}"), F.col(f"__df_{i}"),
            F.col("n_docs"), F.col("avgdl"), F.col("dl"), k1, b,
        )
        score = part if score is None else score + part

    return (
        scored.crossJoin(F.broadcast(stats))
        .select("doc_id", F.round(score, 6).alias("score"))
        .where(F.col("score") > 0)
        .orderBy(F.desc("score"), "doc_id")
        .limit(topk)
    )


def inverted_index(
    df: DataFrame,
    min_df: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize an inverted index: term -> document frequency +
    sorted posting list (comma-joined string, so the output is flat,
    hash-comparable, and identical across engines).

    Plan: DISTINCT (term, doc) — one shuffle keyed by near-uniform
    terms — then a single hash aggregate; the posting list is sorted
    in-row (sort_array) after collect_list, so no global sort. At
    100 TB posting lists for stopword-grade terms get long: the min_df
    gate stays, and hot terms would be range-bucketed (term, bucket)
    before the aggregate — same two-shuffle budget."""
    return (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
        )
        .distinct()
        .groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("doc")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings"),
        )
        .where(F.col("df") >= min_df)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    c: int = 60,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    fuse N ranked lists into one by rrf_score = Σ 1/(c + rank_i).

    The standard way to combine lexical (BM25) and semantic (dense
    cosine) retrieval without score calibration — only RANKS matter, so
    incomparable score scales fuse cleanly.

    Scale design: inputs are top-k lists (k·N rows total, driver-small
    by construction — they came out of TakeOrdered/windowed top-k), so
    the union + groupBy here is a few thousand rows regardless of corpus
    size; the final global row_number is bounded by k·N, not the data.

    Output: id_col, rrf_score (round 1e-6), n_lists, rank.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    scored = None
    for r in rankings:
        s = r.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(c) + F.col(rank_col).cast("double"))).alias(
                "__s"
            ),
        )
        scored = s if scored is None else scored.unionByName(s)
    fused = scored.groupBy(id_col).agg(
        F.round(F.sum("__s"), 6).alias("rrf_score"),
        F.count("*").cast("int").alias("n_lists"),
    )
    w = Window.orderBy(F.desc("rrf_score"), F.asc(id_col))
    return fused.select(
        id_col,
        "rrf_score",
        "n_lists",
        F.row_number().over(w).cast("int").alias("rank"),
    )


def _rbo_tails(spark, k: int, p: float):
    """Shared RBO tail-sum lookup: T(m) = Σ_{d=m..k} p^(d-1)/d over
    the k-row term table — the per-shared-item contribution used by
    rbo_overlap / rbo_drift / rbo_panel (one definition so the
    truncated-RBO convention can never drift between surfaces).
    k rows; always broadcast by the caller."""
    terms = spark.range(1, k + 1).select(
        F.col("id").cast("int").alias("d"),
        (F.pow(F.lit(p), F.col("id") - 1) / F.col("id")).alias("t"),
    )
    tail_w = Window.orderBy("d").rowsBetween(0, Window.unboundedFollowing)
    return terms.select(
        F.col("d").alias("m"), F.sum("t").over(tail_w).alias("tail")
    )


def rbo_overlap(
    rank_a: DataFrame,
    rank_b: DataFrame,
    depth: int,
    p: float = 0.9,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Rank-Biased Overlap between two top-``depth`` rankings (Webber,
    Moffat & Zobel, TOIS 2010 — truncated prefix form): the standard
    top-weighted agreement measure for comparing retrieval systems
    (e.g. BM25 vs dense cosine) that, unlike Kendall/Spearman, handles
    NON-CONJOINT lists — items present in only one ranking simply
    never contribute.

    RBO@k = (1-p) · Σ_{d=1..k} p^(d-1) · |A_{1..d} ∩ B_{1..d}| / d.

    Distributed shape: a shared item with ranks (ra, rb) enters every
    prefix overlap from d = max(ra, rb) onward, so its total
    contribution is T(max(ra, rb)) with T(m) = Σ_{d=m..k} p^(d-1)/d —
    a ``depth``-row lookup table built once (tiny window over k rows)
    and broadcast. One equi join on the id + one k-bounded aggregate;
    nothing corpus-sized moves (the inputs are top-k lists by
    construction). Output: one row (p, depth, n_shared, rbo).
    """
    if not (0.0 < p < 1.0):
        raise ValueError(f"p must be in (0, 1): {p}")
    if depth < 1:
        raise ValueError(f"depth must be >= 1: {depth}")
    spark = rank_a.sparkSession
    k = int(depth)
    tails = _rbo_tails(spark, k, p)
    a = rank_a.where(F.col(rank_col) <= k).select(
        id_col, F.col(rank_col).alias("__ra")
    )
    b = rank_b.where(F.col(rank_col) <= k).select(
        id_col, F.col(rank_col).alias("__rb")
    )
    shared = a.join(b, id_col).select(
        F.greatest("__ra", "__rb").alias("m")
    )
    return (
        shared.join(F.broadcast(tails), "m")
        .agg(
            F.count("*").cast("long").alias("n_shared"),
            F.sum("tail").alias("__s"),
        )
        .select(
            F.lit(float(p)).alias("p"),
            F.lit(k).alias("depth"),
            "n_shared",
            # disjoint lists: empty sum -> NULL -> RBO 0 exactly
            (
                F.round((1.0 - p) * F.coalesce(F.col("__s"), F.lit(0.0)), 6)
                + F.lit(0.0)
            ).alias("rbo"),
        )
    )


def rbo_drift(
    ranked: DataFrame,
    depth: int,
    p: float = 0.9,
    period_col: str = "period",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Windowed RBO drift: Rank-Biased Overlap between each period's
    top-``depth`` ranking and the NEXT period's — the trend-stability
    time series ("how much did today's leaderboard reshuffle
    overnight?"). One row per consecutive period pair; a pair with
    disjoint lists still emits (rbo = 0), so gaps are visible, not
    silently dropped. NULL-period rows are excluded (a null period
    has no place in the consecutive order).

    Same math and same distributed shape as :func:`rbo_overlap`, run
    for ALL consecutive pairs in one plan instead of once: the
    k-row tail table T(m) = Σ_{d=m..k} p^(d-1)/d is period-independent
    — built ONCE and broadcast; each shared item contributes
    T(max(rank_now, rank_next)) to its pair. Plan: the ranked frame
    (top-k per period — k·P rows total, tiny by construction) joins
    itself on (next period, id) — one equi hash join — then one
    grouped aggregate on the (period, next) key. The consecutive-pair
    frame comes from a lead() over the DISTINCT periods: P rows in one
    task, bounded by the calendar, never by the corpus.

    Output: period_col, next_<period_col>, n_shared, rbo (6dp).
    """
    if not (0.0 < p < 1.0):
        raise ValueError(f"p must be in (0, 1): {p}")
    if depth < 1:
        raise ValueError(f"depth must be >= 1: {depth}")
    spark = ranked.sparkSession
    k = int(depth)
    ranked = ranked.where(F.col(period_col).isNotNull())
    next_col = f"next_{period_col}"
    tails = _rbo_tails(spark, k, p)

    periods = ranked.select(period_col).distinct()
    pairs = periods.select(
        period_col,
        F.lead(period_col).over(Window.orderBy(period_col)).alias(next_col),
    ).where(F.col(next_col).isNotNull())

    topk = ranked.where(F.col(rank_col) <= k)
    cur = topk.select(period_col, id_col, F.col(rank_col).alias("__ra"))
    nxt = topk.select(
        F.col(period_col).alias(next_col),
        id_col,
        F.col(rank_col).alias("__rb"),
    )
    shared = (
        F.broadcast(pairs)
        .join(cur, period_col)
        .join(nxt, [next_col, id_col])
        .select(
            period_col,
            next_col,
            F.greatest("__ra", "__rb").alias("m"),
        )
    )
    agg = (
        shared.join(F.broadcast(tails), "m")
        .groupBy(period_col, next_col)
        .agg(
            F.count("*").cast("long").alias("n_shared"),
            F.sum("tail").alias("__s"),
        )
    )
    return (
        pairs.join(agg, [period_col, next_col], "left")
        .select(
            period_col,
            next_col,
            F.coalesce(F.col("n_shared"), F.lit(0).cast("long")).alias(
                "n_shared"
            ),
            (
                F.round(
                    (1.0 - p) * F.coalesce(F.col("__s"), F.lit(0.0)), 6
                )
                + F.lit(0.0)
            ).alias("rbo"),
        )
    )


def rbo_panel(
    ranked_groups: DataFrame,
    ranked_ref: DataFrame,
    depth: int,
    p: float = 0.9,
    group_col: str = "source",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Grouped-vs-reference RBO panel: Rank-Biased Overlap of EACH
    group's top-``depth`` ranking against one shared reference ranking
    — the per-shard drift dashboard ("which crawl source's term
    profile diverges from the corpus?"). One row per group present in
    ``ranked_groups``; a group disjoint from the reference still emits
    (rbo = 0).

    Same distributed shape as :func:`rbo_drift`: the depth-row tail
    table T(m) is built once and broadcast, the reference list
    (k rows, top-k by construction) is broadcast, shared items meet in
    one equi join on the id, and the aggregate is keyed by group —
    k-bounded per group, never corpus-sized. Rows with a NULL group
    are excluded.

    Output: group_col, n_shared, rbo (6dp).
    """
    if not (0.0 < p < 1.0):
        raise ValueError(f"p must be in (0, 1): {p}")
    if depth < 1:
        raise ValueError(f"depth must be >= 1: {depth}")
    spark = ranked_groups.sparkSession
    k = int(depth)
    tails = _rbo_tails(spark, k, p)

    grp = ranked_groups.where(F.col(group_col).isNotNull())
    groups = grp.select(group_col).distinct()
    cur = grp.where(F.col(rank_col) <= k).select(
        group_col, id_col, F.col(rank_col).alias("__ra")
    )
    ref = ranked_ref.where(F.col(rank_col) <= k).select(
        id_col, F.col(rank_col).alias("__rb")
    )
    shared = cur.join(F.broadcast(ref), id_col).select(
        group_col, F.greatest("__ra", "__rb").alias("m")
    )
    agg = (
        shared.join(F.broadcast(tails), "m")
        .groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("n_shared"),
            F.sum("tail").alias("__s"),
        )
    )
    return (
        groups.join(agg, group_col, "left")
        .select(
            group_col,
            F.coalesce(F.col("n_shared"), F.lit(0).cast("long")).alias(
                "n_shared"
            ),
            (
                F.round(
                    (1.0 - p) * F.coalesce(F.col("__s"), F.lit(0.0)), 6
                )
                + F.lit(0.0)
            ).alias("rbo"),
        )
    )

"""Data-selection / tokenizer-induction operators for training-data
pipelines (project brief; beyond the reference surface — SURVEY.md §7
Phase 5).

Scale design notes (100 TB corpus, 1000 executors):

- ``ngram_topk`` / ``bpe_pair_topk``: the n-gram (resp. adjacent-pair)
  arrays are built IN-ROW with higher-order functions over one token
  array — the only shuffle is the classic two-phase count on the gram
  key (map-side partial combine first), same shape as ``word_topk``.
- ``dsir_weights``: the two language models (target vs corpus unigram
  distributions) aggregate to vocabulary-sized tables, which broadcast
  back onto a single tokenize pass — one keyed shuffle on (doc, word)
  plus two vocab-sized aggregates; no O(corpus) join shuffle. This is
  the DSIR (Xie et al. 2023) importance-resampling signal with word
  features; at 100 TB the word key is replaced by a hashed bucket
  (murmur3 % 2^20) which only shrinks the broadcast side further.
- ``length_bounds_filter``: the percentile bounds are a 1-row exact
  aggregate cross-joined (broadcast) onto a map-only filter scan.
- ``source_overlap``: per-source DISTINCT md5 fingerprints (one shuffle
  keyed by hash — uniform), then a source-level self-join on the hash;
  output is #sources² rows, driver-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from .spread import pinned


def _grams(df: DataFrame, text_col: str, n: int) -> DataFrame:
    """One exploded (gram) row per n-gram position; the token array is
    materialized once per row before the transform references it (the
    inline form re-evaluates the split per position — O(n²)/doc trap
    documented on curation._with_shingles)."""
    toked = df.withColumn("__toks", tokens(F.lower(F.col(text_col))))
    n_pos = F.greatest(F.size("__toks") - (n - 1), F.lit(0))
    # guard: sequence(1, 0) is DESCENDING in Spark — short docs must hit
    # the empty branch, not produce slice(.., 0, ..) errors
    gram = F.when(
        n_pos > 0,
        F.transform(
            F.sequence(F.lit(1), n_pos),
            lambda i: F.array_join(F.slice("__toks", i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toked.select(F.explode(gram).alias("gram"))


def ngram_topk(
    df: DataFrame, n: int = 3, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """Global top-k word n-grams (collocation mining / corpus stats).

    Two-phase count with map-side partial combine; total-order
    tie-break (count desc, gram asc) keeps the result deterministic
    under equal counts on any partitioning."""
    return (
        _grams(df, text_col, n)
        .groupBy("gram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("gram"))
        .limit(k)
    )


def bpe_pair_topk(
    df: DataFrame, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """Top-k adjacent character pairs within words — the first merge
    step of BPE tokenizer induction (Sennrich et al. 2016), scaled out.

    Pairs are built in-row (per word: chars[i] || chars[i+1]) and
    weighted by word frequency: counting each DISTINCT word once per
    occurrence is exactly what the flatten does here, so the single
    shuffle is the pair-count aggregate. At vocabulary-bounded corpora
    a pre-aggregate on word (word_topk shape) would shrink the explode;
    both shapes keep one shuffle."""
    toked = df.withColumn("__toks", tokens(F.lower(F.col(text_col))))
    pairs_per_word = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length("__w") - 1, F.lit(0))),
        lambda i: F.col("__w").substr(i, F.lit(2)),
    )
    return (
        toked.select(F.explode("__toks").alias("__w"))
        .select(F.explode(pairs_per_word).alias("pair"))
        .where(F.length("pair") == 2)
        .groupBy("pair")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(k)
    )


def dsir_weights(
    df: DataFrame,
    target_sources: list[str],
    smoothing: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """DSIR-style importance weights: per-document log-likelihood ratio
    log p_target(doc) - log p_corpus(doc) under add-k-smoothed unigram
    LMs, where the target LM is estimated from ``target_sources``.

    Documents scoring > 0 look more like the target domain than the
    corpus average — the resampling signal of Xie et al. 2023 (DSIR).
    Word-feature variant; the at-scale variant hashes words into 2^20
    murmur3 buckets, which changes only the key width.

    Plan: one tokenize pass -> per-doc word counts (ONE shuffle on
    (doc_id, word)); the two LM tables aggregate from that same frame
    to vocabulary size and broadcast back; final per-doc sum reuses the
    doc_id clustering."""
    counts = (
        df.select(
            F.col(id_col),
            F.col(source_col),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("word"),
        )
        .groupBy(id_col, source_col, "word")
        .agg(F.count("*").alias("c"))
    )
    is_target = F.col(source_col).isin(list(target_sources))
    lm = counts.groupBy("word").agg(
        F.sum(F.when(is_target, F.col("c")).otherwise(F.lit(0))).alias("tc"),
        F.sum("c").alias("rc"),
    )
    totals = lm.agg(
        F.sum("tc").alias("tn"),
        F.sum("rc").alias("rn"),
        F.count("*").alias("v"),
    )
    a = float(smoothing)
    scored = counts.join(F.broadcast(lm), "word").join(
        F.broadcast(totals)
    )
    log_ratio = F.col("c") * (
        F.log((F.col("tc") + a) / (F.col("tn") + a * F.col("v")))
        - F.log((F.col("rc") + a) / (F.col("rn") + a * F.col("v")))
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum("c").cast("int").alias("n_tokens"),
            F.round(F.sum(log_ratio), 6).alias("log_ratio"),
        )
        .withColumn("keep", F.col("log_ratio") > 0)
    )


def length_bounds_filter(
    df: DataFrame,
    lo: float = 0.05,
    hi: float = 0.95,
    length_col: str = "n_chars",
) -> DataFrame:
    """Keep rows whose ``length_col`` lies within the exact
    [lo, hi] corpus percentiles (outlier-trimming quality filter).

    The bounds are a 1-row EXACT percentile aggregate (linear
    interpolation — same definition as DuckDB's quantile_cont, so the
    oracle matches bit-for-bit after 6dp rounding); the filter itself
    is a broadcast-cross-join + map-only scan. At 100 TB the exact
    percentile becomes approx_percentile with a documented error bound;
    the plan shape is unchanged."""
    bounds = df.agg(
        F.round(F.expr(f"percentile({length_col}, {lo})"), 6).alias("__lo"),
        F.round(F.expr(f"percentile({length_col}, {hi})"), 6).alias("__hi"),
    )
    return (
        df.join(F.broadcast(bounds))
        .where(F.col(length_col).between(F.col("__lo"), F.col("__hi")))
        .drop("__lo", "__hi")
    )


def source_overlap(
    df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Pairwise content overlap between sources: Jaccard similarity of
    each source pair's DISTINCT word-n-gram shingle sets (ordered pairs
    a < b). Detects mirrored / re-crawled corpora before mixing —
    shingle-level (not whole-document md5) so partial mirrors and
    boilerplate overlap register too.

    Plan: distinct (source, shingle-digest) — the shingle is carried
    as xxhash64 of the token slice (8-byte keys on every exchange, no
    per-gram string build; ~1e-13 pairwise collision odds, and the
    registry oracle folds raw strings so the driver gate certifies
    collision-freeness on the fixture). The frame feeds THREE
    consumers (sizes + both self-join sides): computed once, pinned
    MATERIALIZED, hash-partitioned on the shingle digest — safe here
    because a digest's fan-out is bounded by #sources (distinct
    (src, h) rows), so the pair self-join runs on the cache
    partitioning with no exchange at all; the repartition also
    satisfies the distinct's clustering (subset rule), so the dedup
    rides the same single exchange (guide §2.3/§2.4)."""
    toked = df.withColumn("__toks", tokens(F.lower(F.col(text_col))))
    n_pos = F.greatest(F.size("__toks") - (n - 1), F.lit(0))
    gram = F.when(
        n_pos > 0,
        F.transform(
            F.sequence(F.lit(1), n_pos),
            lambda i: F.xxhash64(F.slice("__toks", i, n)),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    # distinct FIRST (composite-key exchange with map-side partial
    # aggregation), THEN repartition the already-distinct,
    # #sources-bounded frame by the digest (ADVICE r12): the r12 order
    # repartitioned raw pre-distinct occurrence rows by h, so a
    # boilerplate shingle occurring millions of times would route
    # every occurrence to one reducer with no map-side combine — the
    # exact hot-spot the substring_dedup note (guide §2.5) avoids.
    # The self-join still reads the cache partitioning on h.
    fp = pinned(
        toked.select(F.col(source_col).alias("src"), F.explode(gram).alias("h"))
        .distinct()
        .repartition("h")
    )
    sizes = fp.groupBy("src").agg(F.count("*").alias("n"))
    inter = (
        fp.alias("a")
        .join(fp.alias("b"), (F.col("a.h") == F.col("b.h")) & (F.col("a.src") < F.col("b.src")))
        .groupBy(F.col("a.src").alias("src_a"), F.col("b.src").alias("src_b"))
        .agg(F.count("*").alias("i"))
    )
    return (
        inter.join(F.broadcast(sizes).alias("sa"), F.col("src_a") == F.col("sa.src"))
        .join(F.broadcast(sizes).alias("sb"), F.col("src_b") == F.col("sb.src"))
        .select(
            "src_a",
            "src_b",
            F.round(
                F.col("i") / (F.col("sa.n") + F.col("sb.n") - F.col("i")), 6
            ).alias("jaccard"),
        )
    )


def pmi_collocations(
    df: DataFrame,
    k: int = 20,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Top-k adjacent-word collocations by pointwise mutual information:
    pmi(a,b) = ln( P(a,b) / (P(a)·P(b)) ) over bigram occurrences, with
    a minimum-support gate (rare pairs otherwise dominate PMI).

    Plan: ONE tokenize pass feeds both the unigram and the in-row
    bigram explode; two vocabulary-sized aggregates; the unigram table
    broadcasts back onto the bigram counts twice (left/right word).
    All corpus-sized shuffles are keyed by near-uniform words. Output
    deterministic: pmi desc, pair asc tie-break."""
    toked = df.withColumn("__toks", tokens(F.lower(F.col(text_col))))
    n_pos = F.greatest(F.size("__toks") - 1, F.lit(0))
    bigram = F.when(
        n_pos > 0,
        F.transform(
            F.sequence(F.lit(1), n_pos),
            lambda i: F.struct(
                F.element_at("__toks", i).alias("w1"),
                F.element_at("__toks", i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    pairs = (
        toked.select(F.explode(bigram).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("pair_cnt"))
        .where(F.col("pair_cnt") >= min_count)
    )
    uni = (
        toked.select(F.explode("__toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    n_pairs = pairs.groupBy().agg(F.sum("pair_cnt").alias("np"))
    n_words = uni.groupBy().agg(F.sum("cnt").alias("nw"))
    scored = (
        pairs.join(F.broadcast(uni.withColumnRenamed("w", "w1")
                               .withColumnRenamed("cnt", "c1")), "w1")
        .join(F.broadcast(uni.withColumnRenamed("w", "w2")
                          .withColumnRenamed("cnt", "c2")), "w2")
        .join(F.broadcast(n_pairs))
        .join(F.broadcast(n_words))
        .select(
            "w1", "w2", "pair_cnt",
            F.round(
                F.log(
                    (F.col("pair_cnt") / F.col("np"))
                    / ((F.col("c1") / F.col("nw")) * (F.col("c2") / F.col("nw")))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2")).limit(k)


def canonical_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Near-exact dedup under canonicalization: lowercase, strip
    non-alphanumerics (unicode-aware), collapse whitespace — catches
    trivially-reformatted duplicates that byte-exact md5 dedup misses.
    Map-only projection + the same single-shuffle group as exact_dedup.
    Output: canon_hash, keeper_id, n_dups."""
    canon = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), r"[^\p{L}\p{N}\s]", ""),
            r"\s+", " ",
        )
    )
    return (
        df.groupBy(F.md5(canon).alias("canon_hash"))
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_dups"))
    )


def feature_hash_tf(
    df: DataFrame,
    dim: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashing-trick term frequencies (HashingTF analog, Weinberger et
    al. 2009): sparse (doc_id, pos, tf) vectors with pos = md5-hash of
    the token mod ``dim`` — fixed dimensionality with NO vocabulary
    build, so the featurizer is stateless and identical across corpus
    shards (the property that matters for incremental featurization at
    100 TB: no vocab to version or broadcast).

    md5 (not xxhash64) so an external engine reproduces the exact
    layout — same convention as the count-min sketch. One explode +
    one map-side-combined shuffle on (doc_id, pos).
    """
    toks = tokens(F.lower(F.col(text_col)))
    pos = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("__tok")), 1, 8), 16, 10
        ).cast("long"),
        F.lit(dim),
    )
    return (
        df.select(F.col(id_col), F.explode(toks).alias("__tok"))
        .select(id_col, pos.alias("pos"))
        .groupBy(id_col, "pos")
        .agg(F.count("*").cast("int").alias("tf"))
    )

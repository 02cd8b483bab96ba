"""Deduplication operator family for large-scale training-data
pipelines (project brief; beyond the reference surface — the reference's
only dedup is the dimension argmin, wbdb.clj:20-28, in dedup_dim.py).

All variants are pure DataFrame programs on JVM-side built-ins — no
Python UDFs — so they scale to the 100 TB tier:

- exact_dedup:        hash-groupBy on a content digest; one shuffle with
                      map-side partial aggregation.
- shingles:           word n-gram shingling via higher-order array
                      functions (transform/sequence/slice) — pure
                      projection, no shuffle.
- ngram_jaccard_pairs: candidate generation by shared shingle
                      (equi-join), exact Jaccard verification by
                      intersection counting. The inverted-index join is
                      the scalable formulation (never all-pairs); a
                      stop-shingle cap bounds frequent-shingle skew.
- minhash_signatures / minhash_lsh_pairs: MinHash (k independent
                      murmur3 seeds folded in ONE aggregate pass) +
                      banded LSH bucketing; candidate pairs meet in
                      band buckets — shuffle is O(docs·bands), not
                      O(docs²).
- simhash_signatures: 64-bit SimHash via per-bit signed sums in one
                      aggregate pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: group on md5(text), keep the minimum id as the
    canonical representative. Output: text_hash, keeper_id, n_dups."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count("*").alias("n_dups"),
        )
    )


def shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    distinct: bool = True,
) -> DataFrame:
    """Word n-gram shingling -> (id, shingle) long format.

    Built entirely from array higher-order functions so the whole thing
    is one codegen'd projection + explode; no Python in the loop.
    """
    toks = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    sh = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    out = df.select(F.col(id_col), F.explode(sh).alias("shingle"))
    return out.distinct() if distinct else out


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    threshold: float = 0.1,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted-index join.

    ``max_shingle_freq`` drops shingles appearing in more than that many
    documents before pairing (stop-shingle skew cap for web-scale
    corpora); exactness then holds for pairs whose similarity is carried
    by non-stop shingles. Leave None for fully exact semantics.
    Output: doc_a, doc_b (doc_a < doc_b), jaccard (rounded to 6dp).
    """
    sh = shingles(df, text_col, id_col, n=n)
    if max_shingle_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
        sh = (
            sh.join(freq.where(F.col("df") <= max_shingle_freq), "shingle")
            .select(id_col, "shingle")
        )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    k: int = 128,
) -> DataFrame:
    """k-permutation MinHash signature per document.

    All k minimums are computed in a single hash-aggregate pass
    (k ``min(hash(shingle, seed_i))`` aggregates) — one shuffle on the
    doc id, map-side combine, independent of k in shuffle volume.
    Output: id, sig (array<int> length k).
    """
    sh = shingles(df, text_col, id_col, n=n)
    mins = [
        F.min(F.hash(F.col("shingle"), F.lit(i))).alias(f"h{i}") for i in range(k)
    ]
    agg = sh.groupBy(id_col).agg(*mins)
    return agg.select(
        id_col, F.array(*[F.col(f"h{i}") for i in range(k)]).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    k: int = 128,
    bands: int = 32,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + banded LSH near-dup candidates with estimated Jaccard.

    k/bands rows per band; two docs collide if any band matches
    (P[collide] = 1-(1-j^r)^b). Candidates meet in band buckets — the
    shuffle is O(docs·bands); estimated similarity = fraction of equal
    signature positions. Output: doc_a, doc_b, est_jaccard.
    """
    assert k % bands == 0
    r = k // bands
    sig = minhash_signatures(df, text_col, id_col, n=n, k=k)
    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.hash(F.slice("sig", b * r + 1, r).cast("array<string>")).alias("key"),
            )
            for b in range(bands)
        ]
    )
    buckets = sig.select(id_col, "sig", F.explode(band_cols).alias("bk")).select(
        id_col, "sig", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    a = buckets.select(
        F.col(id_col).alias("doc_a"), F.col("sig").alias("sig_a"), "band", "key"
    )
    b = buckets.select(
        F.col(id_col).alias("doc_b"), F.col("sig").alias("sig_b"), "band", "key"
    )
    cand = (
        a.join(b, ["band", "key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    eq = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m
        )
    )
    est = eq / F.lit(k)
    return cand.select(
        "doc_a", "doc_b", F.round(est, 6).alias("est_jaccard")
    ).where(F.col("est_jaccard") >= threshold)


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash over word tokens.

    Per token a 64-bit hash votes ±1 on each bit position; the signature
    takes the sign of each position's sum. 64 conditional sums in one
    aggregate pass (columnar, no UDF). Output: id, simhash (bigint).
    """
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).where(F.length("tok") > 0)
    h = F.xxhash64("tok")
    bit_sums = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    agg = toks.groupBy(id_col).agg(*bit_sums)
    sig = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseXOR(term)
    return agg.select(id_col, sig.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    blocks: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs by banded bit-blocks (pigeonhole: two sigs
    within ``max_hamming`` of each other agree exactly on at least one
    of ``blocks`` 16-bit blocks when max_hamming < blocks). Exact
    hamming verified on candidates. Output: doc_a, doc_b, hamming."""
    sig = simhash_signatures(df, text_col, id_col)
    width = 64 // blocks
    block_cols = F.array(
        *[
            F.struct(
                F.lit(i).alias("block"),
                F.shiftrightunsigned("simhash", i * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("key"),
            )
            for i in range(blocks)
        ]
    )
    buckets = sig.select(id_col, "simhash", F.explode(block_cols).alias("bk")).select(
        id_col, "simhash", "bk.block", "bk.key"
    )
    a = buckets.select(
        F.col(id_col).alias("doc_a"), F.col("simhash").alias("sig_a"), "block", "key"
    )
    b = buckets.select(
        F.col(id_col).alias("doc_b"), F.col("simhash").alias("sig_b"), "block", "key"
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        a.join(b, ["block", "key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )

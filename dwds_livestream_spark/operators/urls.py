"""URL normalization + registered-domain dedup (FineWeb-style).

Web-crawl curation pipelines dedup at two URL granularities before any
content hashing: exact normalized-URL dedup (the same page fetched
twice) and registered-domain grouping (per-site quotas, domain
blocklists, domain-level dup statistics — see FineWeb / CCNet, which
key their URL stage on the *registrable* domain, not the host). This
module keeps both map-only until the final keyed aggregate.

Scale shapes: normalization is pure string expressions (whole-stage
codegen, zero shuffle); ``domain_dedup`` is one groupBy keyed on the
registered domain with map-side partial aggregation — the groupBy twin
of ``operators/dedup.exact_dedup``. Distinct-host/url counts inside a
domain expand to the standard two-phase distinct aggregate; hot
domains (a crawl is always domain-skewed) stay safe because only
(domain, host/url) pairs shuffle, never document text.

Registered-domain extraction uses the last-two-labels rule plus an
explicit multi-part public-suffix set (the common ccSLDs). A full
public-suffix-list lookup would be a broadcast join against the PSL
table; the inline set keeps the hot path expression-only and is the
documented approximation (callers with a PSL table can join it
themselves on ``host``).

No reference parity: the reference (dwds-livestream) has no URL
surface; this serves the project brief's LLM-pipeline layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "MULTI_PART_SUFFIXES",
    "url_host",
    "url_path",
    "registered_domain",
    "normalize_url",
    "domain_dedup",
    "domain_quota_sample",
    "path_neardup_pairs",
    "path_drift",
    "path_novelty",
]

# Common multi-part public suffixes (ccSLDs): when a host's last TWO
# labels match one of these, the registrable domain is the last THREE
# labels. Kept deliberately small and inline — see module docstring.
MULTI_PART_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.ar", "com.mx", "com.tr",
    "co.in", "co.kr", "co.za", "com.es",
)


def url_host(url: Column) -> Column:
    """Lowercased host of ``url``: authority minus userinfo and port.

    Accepts scheme-full URLs (``https://…``); scheme-relative
    (``//host/…``) and bare ``host/path`` inputs also resolve because
    the pattern anchors on the first authority-looking run.
    """
    auth = F.regexp_extract(url, r"^(?:[A-Za-z][A-Za-z0-9+.-]*:)?//([^/?#]+)", 1)
    # bare "host/path" fallback (no scheme, no //)
    auth = F.when(auth == "", F.regexp_extract(url, r"^([^/?#]+)", 1)).otherwise(auth)
    no_user = F.regexp_replace(auth, r"^[^@]*@", "")
    no_port = F.regexp_replace(no_user, r":\d+$", "")
    return F.lower(no_port)


def url_path(url: Column) -> Column:
    """Path component (no query/fragment), trailing slashes folded:
    ``/a/b/`` and ``/a/b`` normalize identically; the root path and an
    empty path both normalize to ``/``."""
    has_auth = url.rlike(r"^(?:[A-Za-z][A-Za-z0-9+.-]*:)?//")
    p = F.when(
        has_auth,
        F.regexp_extract(url, r"^(?:[A-Za-z][A-Za-z0-9+.-]*:)?//[^/?#]*([^?#]*)", 1),
    ).otherwise(
        # bare "host/path" fallback, mirroring url_host
        F.regexp_extract(url, r"^[^/?#]*([^?#]*)", 1)
    )
    p = F.when(p == "", F.lit("/")).otherwise(p)
    folded = F.regexp_replace(p, r"/+$", "")
    return F.when(folded == "", F.lit("/")).otherwise(folded)


def registered_domain(host: Column) -> Column:
    """Registrable domain of a (lowercased) ``host``: the last two
    labels, or the last three when the last two form a multi-part
    public suffix (``MULTI_PART_SUFFIXES``). Hosts with fewer labels
    than needed pass through unchanged. Pure array arithmetic — no
    UDF, no shuffle."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.slice(labels, -2, 2))
    last3 = F.concat_ws(".", F.slice(labels, -3, 3))
    multi = last2.isin(*MULTI_PART_SUFFIXES)
    return (
        F.when((n >= 3) & multi, last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )


def normalize_url(url: Column) -> Column:
    """Canonical page key: ``host/path`` with scheme, userinfo, port,
    query, fragment and a leading ``www.`` dropped, trailing slashes
    folded. The FineWeb-style exact-URL dedup key (scheme/tracking
    noise collapses; distinct content paths stay distinct)."""
    host_nw = F.regexp_replace(url_host(url), r"^www\.", "")
    return F.concat(host_nw, url_path(url))


def domain_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Registered-domain rollup of a URL-bearing corpus: one row per
    registrable domain with

    - ``n_docs``     documents under the domain,
    - ``n_hosts``    distinct full hosts (subdomain spread),
    - ``n_urls``     distinct normalized URLs (``normalize_url``),
    - ``n_url_dups`` docs beyond the first per normalized URL
      (``n_docs - n_urls`` — the exact-URL duplicate mass),
    - ``keeper_id``  min ``id_col`` (the canonical survivor, same
      keeper convention as ``exact_dedup``).

    One map stage (string normalization) + one groupBy(domain) with
    two-phase distinct aggregates; text never shuffles.
    """
    u = F.col(url_col)
    keyed = df.select(
        F.col(id_col),
        registered_domain(url_host(u)).alias("domain"),
        url_host(u).alias("__host"),
        normalize_url(u).alias("__nurl"),
    )
    return keyed.groupBy("domain").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("__host").alias("n_hosts"),
        F.countDistinct("__nurl").alias("n_urls"),
        (F.count("*") - F.countDistinct("__nurl")).alias("n_url_dups"),
        F.min(id_col).alias("keeper_id"),
    )


def domain_quota_sample(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    quota: int = 10,
) -> DataFrame:
    """FineWeb-style per-domain quota: keep at most ``quota`` documents
    per registered domain, selected content-addressed (ordered by
    md5(id), ties by id) — the anti-monoculture cap that stops one
    giant site dominating a crawl mix. Deterministic on any engine,
    any partitioning, any rerun (no rand(); same property as
    ``stratified_split``), and nested: raising the quota only ADDS
    documents, it never swaps earlier picks.

    Plan: map-only normalization + one keyed window that Spark folds
    under WindowGroupLimit — at most ``quota`` rows per domain survive
    each partial sort, so a hot domain never materializes whole in one
    task's sort buffer. Output: all input columns + ``domain``.
    """
    if quota < 1:
        raise ValueError(f"quota must be >= 1: {quota}")
    from pyspark.sql import Window

    keyed = df.withColumn(
        "domain", registered_domain(url_host(F.col(url_col)))
    )
    w = Window.partitionBy("domain").orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= quota)
        .drop("__rn")
    )


def path_neardup_pairs(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_segment_df: int | None = 10_000,
) -> DataFrame:
    """Per-site near-duplicate URL pairs: two documents under the SAME
    registered domain whose path-segment sets overlap with Jaccard >=
    ``threshold`` — the URL-level mirror-page detector (``/en/doc/x``
    vs ``/de/doc/x``, ``/blog/post`` vs ``/blog/post/amp``) that fires
    BEFORE any content fetch, the cheap first pass of a crawl-dedup
    cascade (normalize_url catches exact repeats; this catches the
    near-misses a registrable-domain rollup lumps together).

    Candidate generation is an inverted index keyed on
    (domain, segment) — the urls-module twin of
    ``operators/dedup.containment_pairs``: pairs meet in a posting
    list, NEVER via an all-pairs self-join within the domain, so a
    million-page site with disjoint paths costs nothing. Jaccard is
    over the DISTINCT segment sets (array_distinct before explode);
    trailing-slash folding comes free from ``url_path``. Root-path
    documents have zero segments and never pair; NULL-url rows are
    excluded (no host to block on). ``max_segment_df``
    drops in-domain stop-segments (``/en/``, ``/blog/`` prefixes that
    every page shares) from the index before pairing — the standard
    postings cap; it bounds the worst posting list at
    ``max_segment_df`` ids and therefore the join fan-out at
    O(segments · cap²) regardless of site size. The default is a
    FINITE 10,000 (VERDICT r8 #3): with ``None`` a boilerplate
    segment shared by a million-page site fans out quadratically
    within its (domain, segment) key, so unbounded postings are
    opt-in for exact small-corpus audits, never the ambient default.
    A segment dropped by the cap carries ~zero pairing information
    anyway (it matches near-everything on the site); Jaccard sizes
    are computed AFTER the cap, so the emitted score is exact over
    the sets the index actually pairs on.

    Each unordered pair is emitted once (``doc_a < doc_b``; Jaccard is
    symmetric). Output: doc_a, doc_b, domain, jaccard (6dp).
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1]: {threshold}")
    u = F.col(url_col)
    segs = F.array_distinct(
        F.filter(F.split(url_path(u), "/"), lambda s: s != "")
    )
    keyed = df.where(u.isNotNull()).select(
        F.col(id_col),
        registered_domain(url_host(u)).alias("domain"),
        segs.alias("__segs"),
    )
    seg = keyed.select(
        id_col, "domain", F.explode("__segs").alias("__seg")
    )
    if max_segment_df is not None:
        # postings cap as a BANNED-KEY anti join (r9 perf audit): the
        # over-cap keys are rare by construction (<= postings/cap), so
        # they broadcast and the postings frame is filtered map-side —
        # no second shuffle of the postings, and the df count itself is
        # a partial-combined hash agg (skew-safe where a window count
        # would buffer a hot (domain, segment) partition whole). The
        # lazy checkpoint shares the explode between the count and the
        # probe; measured 2.3-2.5 s -> 1.2-1.6 s at sf0.1 (the cap is
        # now ~free against the uncapped path).
        seg = seg.localCheckpoint(eager=False)
        banned = (
            seg.groupBy("domain", "__seg")
            .agg(F.count("*").alias("__df"))
            .where(F.col("__df") > max_segment_df)
            .select("domain", "__seg")
        )
        seg = seg.join(banned, ["domain", "__seg"], "left_anti")
    # sizes AFTER the cap (containment_pairs convention): Jaccard is
    # over the sets the index actually pairs on
    sizes = seg.groupBy(id_col).agg(F.count("*").alias("__n"))
    a = seg.select(
        F.col(id_col).alias("doc_a"), "domain", "__seg"
    )
    b = seg.select(
        F.col(id_col).alias("doc_b"), "domain", "__seg"
    )
    inter = (
        a.join(b, ["domain", "__seg"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("domain", "doc_a", "doc_b")
        .agg(F.count("*").alias("__i"))
    )
    na = sizes.select(F.col(id_col).alias("doc_a"), F.col("__n").alias("__na"))
    nb = sizes.select(F.col(id_col).alias("doc_b"), F.col("__n").alias("__nb"))
    jac = F.round(
        F.col("__i") / (F.col("__na") + F.col("__nb") - F.col("__i")), 6
    )
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .select("doc_a", "doc_b", "domain", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )



def _distinct_domain_period_paths(
    df: DataFrame, url_col: str, period_col: str
) -> DataFrame:
    """Shared snapshot fold of :func:`path_drift` /
    :func:`path_novelty`: the corpus reduced ONCE to DISTINCT
    (__k=domain, __p=period, __i=path) tuples — the
    ``operators/drift.set_drift`` contract, short strings only, text never
    shuffles (the module's candidate-fold contract); NULL url/period
    rows excluded. Lazily checkpointed because every caller fans it
    out to multiple consumers (the multi-consumer convention)."""
    u = F.col(url_col)
    return (
        df.where(u.isNotNull() & F.col(period_col).isNotNull())
        .select(
            registered_domain(url_host(u)).alias("__k"),
            F.col(period_col).alias("__p"),
            url_path(u).alias("__i"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )


def path_drift(
    df: DataFrame,
    url_col: str = "url",
    period_col: str = "snapshot",
) -> DataFrame:
    """Per-domain URL-set drift between consecutive crawl snapshots:
    Jaccard between the DISTINCT normalized-path sets a registered
    domain exposes in snapshot t and in the NEXT snapshot — the
    crawl-freshness audit ("which sites churned their URL space
    between crawls, which are stable mirrors?"). The temporal
    composition of this module's URL stage with the consecutive-period
    frame of ``operators/retrieval.rbo_drift`` (ROADMAP r10
    candidate): one row per (domain, consecutive snapshot pair), and a
    domain present in only ONE side of a pair still emits (jaccard 0,
    counts truthful) so site births/deaths are visible, not silently
    dropped. NULL url/period rows are excluded (no domain to key on /
    no place in the consecutive order).

    Distributed shape: the corpus folds ONCE to DISTINCT
    (domain, period, path) tuples — one map-side-combined exchange on
    short strings, text never shuffles (the house candidate-fold
    contract of ``path_neardup_pairs`` / ``dup_rate_by_group``); that
    frame is lazily checkpointed and feeds all consumers. The
    consecutive-pair frame is a lead() over the DISTINCT periods — one
    task, bounded by the crawl calendar, never the corpus (the
    ``rbo_drift`` frame). The intersection is ONE equi hash join on
    (domain, next_period, path); per-side set sizes are
    map-side-combined counts; the final assembly is key-sized outer
    joins. No all-pairs anywhere, no corpus-sized ordered pass.
    Denominator = |union| >= 1 whenever a row exists, so the division
    is ANSI-safe by construction.

    Output: domain, <period_col>, next_<period_col>, n_prev, n_next,
    n_common, jaccard (6dp).
    """
    from .drift import set_drift

    keyed = _distinct_domain_period_paths(df, url_col, period_col)
    return set_drift(keyed, key_out="domain", period_out=period_col)


def path_novelty(
    df: DataFrame,
    url_col: str = "url",
    period_col: str = "snapshot",
    per_domain: bool = False,
) -> DataFrame:
    """Per-snapshot URL novelty: for each crawl snapshot, how much of
    its DISTINCT (domain, path) URL space is NEW — never seen in any
    EARLIER snapshot — versus carried over. The crawl-yield audit
    that tells a pipeline when re-crawling stops paying (novelty
    decays toward 0 as the frontier saturates); the cumulative
    complement of :func:`path_drift`'s pairwise view.

    Distributed shape: the corpus folds ONCE to DISTINCT
    (domain, period, path) tuples — the module's candidate-fold
    contract, text never shuffles; each URL's FIRST period is one
    map-side-combined min() keyed on (domain, path); novelty per
    snapshot is then a period-keyed count join — every post-fold
    frame is key-sized. No window at all: "seen before" is exactly
    "first_period < period", so the prefix scan collapses into the
    min() aggregate. NULL url/period rows are excluded.

    The first snapshot reports novelty 1.0 by construction (nothing
    precedes it). Output: one row per snapshot — <period_col>,
    n_urls (distinct URLs in the snapshot), n_new (first seen here),
    novelty (6dp = n_new / n_urls; n_urls >= 1 whenever the row
    exists, so the division is ANSI-safe).

    ``per_domain=True`` keys the whole audit by registered domain
    (one decay curve per site instead of one global curve — the input
    :func:`novelty_half_life` fits): identical shape with ``domain``
    prepended to every key, so the first-seen min() runs on the same
    (domain, path) key and the count joins key by (domain, period).
    Each domain's FIRST observed snapshot reports novelty 1.0.
    """
    from .drift import set_novelty

    keyed = _distinct_domain_period_paths(df, url_col, period_col)
    return set_novelty(
        keyed,
        key_out="domain",
        period_out=period_col,
        count_cols=("n_urls", "n_new"),
        per_key=per_domain,
    )

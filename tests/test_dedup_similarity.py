"""Quality gates for the approximate (rows-only) operators: recall is
measured against the exact brute-force baselines on sf0.001 testdata."""

from __future__ import annotations

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from dwds_livestream_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from dwds_livestream_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    lsh_topk,
)
from dwds_livestream_spark.plans.io import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return load_table(spark, SF_DIR, "documents").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


def test_exact_dedup_counts(spark, documents):
    out = exact_dedup(documents)
    assert out.count() == documents.select("text").distinct().count()
    # duplicates (if any) fold into one keeper with n_dups >= 2
    assert out.agg(F.sum("n_dups")).collect()[0][0] == documents.count()


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5_64"])
def test_minhash_lsh_recall_against_exact_jaccard(spark, documents, hash_fn):
    # both the scale default and the oracle-checkable md5 variant must
    # clear the same recall bar — universality of the shingle hash is
    # what the LSH guarantee rests on, whichever hash is plugged in
    exact = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(documents, n=5, threshold=0.8).collect()
    }
    assert exact, "testdata should contain planted near-duplicates"
    approx = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(
            documents, n=5, k=128, bands=32, threshold=0.5, hash_fn=hash_fn
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    # j>=0.8 with 32 bands x 4 rows: P[miss] = (1-j^4)^32 < 1e-6
    assert recall >= 0.95, f"minhash recall {recall} on {len(exact)} pairs"


def test_minhash_estimate_tracks_exact(spark, documents):
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(documents, n=5, threshold=0.8).collect()
    }
    est = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in minhash_lsh_pairs(documents, n=5, k=128, bands=32, threshold=0.0).collect()
    }
    errs = [abs(est[p] - j) for p, j in exact.items() if p in est]
    assert errs and max(errs) < 0.15  # k=128 -> se ~ sqrt(j(1-j)/128) ~ 0.035


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5_64"])
def test_simhash_finds_near_duplicates(spark, documents, hash_fn):
    exact = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(documents, n=5, threshold=0.9).collect()
    }
    near = {
        (r.doc_a, r.doc_b)
        # blocks must exceed max_hamming (pigeonhole guarantee) and
        # divide 64 evenly: 16 x 4-bit blocks
        for r in simhash_near_pairs(
            documents, max_hamming=8, blocks=16, hash_fn=hash_fn
        ).collect()
    }
    if exact:
        recall = len(exact & near) / len(exact)
        assert recall >= 0.7, f"simhash recall {recall} on {len(exact)} pairs"


def _md5_64_int(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:16], 16)


def test_simhash_md5_variant_matches_python_reference(spark):
    # triangulate the oracle-checkable variant: Spark kernel, DuckDB
    # oracle, and this plain-Python transcription must agree exactly
    # 200 tokens with one changed: the vote margins are wide enough
    # that the single differing token flips only 1 signature bit
    # (deterministic — md5 is fixed), landing inside the radius
    base = ("tok%d " * 200) % tuple(range(200))
    texts = {
        1: base.strip(),
        2: base.replace("tok7 ", "tok7x ").strip(),  # one token changed
        3: ("z%d " * 200 % tuple(range(1000, 1200))).strip(),  # unrelated
    }

    def sig(text):
        toks = [t for t in text.split(" ") if t]
        votes = [0] * 64
        for t in toks:
            h = _md5_64_int(t)
            for j in range(64):
                votes[j] += 1 if (h >> j) & 1 else -1
        return sum((1 << j) for j in range(64) if votes[j] > 0)

    sigs = {i: sig(t) for i, t in texts.items()}
    expected = {}
    for a in sigs:
        for b in sigs:
            if a < b:
                ham = bin(sigs[a] ^ sigs[b]).count("1")
                if ham <= 3:
                    expected[(a, b)] = ham

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in texts.items()]
    )
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_near_pairs(
            df, max_hamming=3, blocks=4, hash_fn="md5_64"
        ).collect()
    }
    assert expected, "planted near-identical docs should land within radius"
    assert got == expected


def test_minhash_md5_variant_matches_python_reference(spark):
    from dwds_livestream_spark.operators.dedup import (
        minhash_permutation_constants,
    )

    n, k, bands = 5, 128, 32
    r = k // bands
    mult, add = minhash_permutation_constants(k)
    base = ("w%d " * 30) % tuple(range(30))
    texts = {
        1: base.strip(),
        2: base.replace("w29 ", "w29x ").strip(),  # near-duplicate
        3: ("q%d " * 30 % tuple(range(100, 130))).strip(),
    }

    def signature(text):
        toks = text.split(" ")  # matches the operator: empties kept
        f32s = [
            _md5_64_int(" ".join(toks[i : i + n])) >> 32
            for i in range(len(toks) - n + 1)
        ]
        return [
            min((f * mult[j] + add[j]) % (1 << 32) for f in f32s)
            for j in range(k)
        ]

    import hashlib

    sigs = {i: signature(t) for i, t in texts.items() if len(t.split(" ")) >= n}
    cand = set()
    for a in sigs:
        for b in sigs:
            if a < b:
                for bi in range(bands):
                    ka = ",".join(map(str, sigs[a][bi * r : bi * r + r]))
                    kb = ",".join(map(str, sigs[b][bi * r : bi * r + r]))
                    if hashlib.md5(ka.encode()).hexdigest() == hashlib.md5(
                        kb.encode()
                    ).hexdigest():
                        cand.add((a, b))
                        break
    expected = {}
    for a, b in cand:
        eq = sum(x == y for x, y in zip(sigs[a], sigs[b]))
        est = eq / k
        if est >= 0.5:
            expected[(a, b)] = est

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in texts.items()]
    )
    got = {
        (r_.doc_a, r_.doc_b): r_.est_jaccard
        for r_ in minhash_lsh_pairs(
            df, n=n, k=k, bands=bands, threshold=0.5, hash_fn="md5_64"
        ).collect()
    }
    assert expected, "planted near-duplicate should collide in some band"
    assert got == expected  # exact floats: eq/128 is dyadic


def test_cosine_topk_shape_and_order(spark, embeddings):
    out = cosine_topk(embeddings, embeddings.where(F.col("vec_id") < 5), k=7)
    rows = out.collect()
    assert len(rows) == 5 * 7
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, 8))
        cosines = [r.cosine for r in rs]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r.neighbor_id != q for r in rs)


def test_lsh_topk_recall_at_1(spark, embeddings):
    queries = embeddings.where(F.col("vec_id") < 20)
    exact1 = {
        r.query_id: r.neighbor_id
        for r in cosine_topk(embeddings, queries, k=1).collect()
    }
    # near-orthogonal random vectors (max cos ~0.37) need short sign
    # patterns for collision probability; real near-dup corpora
    # (cos > 0.9) tolerate many more planes
    approx = lsh_topk(
        embeddings, queries, k=5, n_planes=4, n_tables=8
    ).collect()
    got1 = {r.query_id: r.neighbor_id for r in approx if r.rank == 1}
    hits = sum(1 for q, n in exact1.items() if got1.get(q) == n)
    assert hits / len(exact1) >= 0.5, f"LSH recall@1 = {hits}/{len(exact1)}"


def test_lsh_topk_exact_bits_recall_and_determinism(spark, embeddings):
    """The oracle-parity path (exact integer bucket bits, round 5) must
    (a) keep useful recall vs exact top-1 — it's a different but equally
    valid hash family, not a degradation — and (b) be bit-stable across
    shuffle-partition settings (its whole point)."""
    queries = embeddings.where(F.col("vec_id") < 20)
    exact1 = {
        r.query_id: r.neighbor_id
        for r in cosine_topk(embeddings, queries, k=1).collect()
    }
    approx = lsh_topk(
        embeddings, queries, k=5, n_planes=4, n_tables=8, exact_bits=True
    ).collect()
    got1 = {r.query_id: r.neighbor_id for r in approx if r.rank == 1}
    hits = sum(1 for q, n in exact1.items() if got1.get(q) == n)
    assert hits / len(exact1) >= 0.5, f"int-LSH recall@1 = {hits}/{len(exact1)}"

    key = lambda rows: sorted((r.query_id, r.rank, r.neighbor_id, r.cosine)
                              for r in rows)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        again = lsh_topk(
            embeddings, queries, k=5, n_planes=4, n_tables=8, exact_bits=True
        ).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert key(approx) == key(again)


def test_lsh_int_plane_constants_shape_and_range(spark):
    from dwds_livestream_spark.operators.similarity import (
        lsh_plane_int_constants,
    )

    planes = lsh_plane_int_constants(8, 3, 2)
    assert len(planes) == 2 and len(planes[0]) == 3 and len(planes[0][0]) == 8
    flat = [w for t in planes for p in t for w in p]
    assert all(-32768 <= w <= 32767 for w in flat)
    # the stream is not degenerate: both signs present
    assert min(flat) < 0 < max(flat)
    # deterministic: same constants on every call (no RNG state)
    assert planes == lsh_plane_int_constants(8, 3, 2)


def test_embedding_near_dup_exact_vs_lsh(spark, embeddings):
    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_near_dup_pairs(embeddings, threshold=0.3, exact=True).collect()
    }
    approx = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_near_dup_pairs(
            embeddings, threshold=0.3, n_planes=6, n_tables=8
        ).collect()
    }
    # approximate results are a subset of exact with identical scores
    assert set(approx) <= set(exact)
    for p, c in approx.items():
        assert c == exact[p]
    if exact:
        assert len(approx) / len(exact) >= 0.3


def test_ivf_topk_recall_and_exactness_at_full_probe(spark, embeddings):
    from dwds_livestream_spark.operators.similarity import ivf_topk

    queries = embeddings.where(F.col("vec_id") < 20)
    exact1 = {
        r.query_id: r.neighbor_id
        for r in cosine_topk(embeddings, queries, k=1).collect()
    }
    approx = ivf_topk(
        embeddings, queries, k=5, n_centroids=16, nprobe=4
    ).collect()
    got1 = {r.query_id: r.neighbor_id for r in approx if r.rank == 1}
    hits = sum(1 for q, n in exact1.items() if got1.get(q) == n)
    assert hits / len(exact1) >= 0.5, f"IVF recall@1 = {hits}/{len(exact1)}"

    # probing every cell makes IVF exhaustive: must equal exact search
    full = ivf_topk(
        embeddings, queries, k=3, n_centroids=8, nprobe=8
    ).collect()
    exact3 = cosine_topk(embeddings, queries, k=3).collect()
    assert {(r.query_id, r.rank, r.neighbor_id) for r in full} == {
        (r.query_id, r.rank, r.neighbor_id) for r in exact3
    }


def test_levenshtein_band_blocking_exact(spark):
    """Band blocking must find exactly the brute-force pairs — including
    pairs whose lengths straddle a band boundary — each pair once."""
    from dwds_livestream_spark.operators.dedup import levenshtein_near_pairs

    docs = spark.createDataFrame(
        [
            (1, "a" * 10),           # len 10
            (2, "a" * 10 + "b"),     # len 11, dist 1 to doc 1
            (3, "a" * 14),           # len 14: band 2 (d=6 -> width 7), dist 4 to doc 1 (band 1)
            (4, "c" * 10),           # len 10, dist 10 to doc 1 (> d)
            (5, "a" * 30),           # far away in length
        ],
        ["doc_id", "text"],
    )
    got = {
        (r.doc_a, r.doc_b): r.edit_dist
        for r in levenshtein_near_pairs(docs, max_dist=6).collect()
    }
    import itertools

    rows = {r.doc_id: r.text for r in docs.collect()}

    def lev(s, t):
        d = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            prev, d[0] = d[0], i
            for j, ct in enumerate(t, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (cs != ct))
        return d[len(t)]

    want = {
        (a, b): lev(rows[a], rows[b])
        for a, b in itertools.combinations(sorted(rows), 2)
        if lev(rows[a], rows[b]) <= 6
    }
    assert got == want
    assert (1, 3) in got  # cross-band pair found despite boundary


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5_64"])
def test_minhash_levenshtein_composition(spark, documents, hash_fn):
    """The at-scale composition (VERDICT r4 #4): MinHash-banded
    candidates -> exact thresholded Levenshtein verify. Two gates:
    (a) soundness — every emitted (pair, dist) matches the exact
    length-banded baseline bit-for-bit (the verifier IS exact, only
    candidate generation is approximate); (b) recall — pairs that are
    both within the edit budget AND above the LSH design point
    (jaccard >= 0.8, P[band miss] < 1e-6 at 32x4) must all surface."""
    from dwds_livestream_spark.operators.dedup import (
        levenshtein_near_pairs,
        minhash_levenshtein_pairs,
    )

    exact = {
        (r.doc_a, r.doc_b): r.edit_dist
        for r in levenshtein_near_pairs(documents, max_dist=60).collect()
    }
    got = {
        (r.doc_a, r.doc_b): r.edit_dist
        for r in minhash_levenshtein_pairs(
            documents, n=5, k=128, bands=32, max_dist=60, hash_fn=hash_fn
        ).collect()
    }
    assert got, "planted near-duplicates should survive the composition"
    for pair, dist in got.items():
        assert exact.get(pair) == dist, f"unsound pair {pair}: {dist}"
    high_j = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(documents, n=5, threshold=0.8).collect()
    }
    want = high_j & set(exact)
    assert want, "testdata should contain close planted duplicates"
    recall = len(want & set(got)) / len(want)
    assert recall >= 0.95, f"composition recall {recall} on {len(want)}"


def test_incremental_dedup_replay_keeps_earliest_batch(spark):
    """The load-bearing ledger semantic: once a key enters the ledger,
    LATER batches cannot replace its keeper — even with a smaller id.
    Keeper must be min (batch, id), never global min id."""
    from dwds_livestream_spark.operators.dedup import (
        incremental_dedup_replay,
    )

    rows = [
        # key k1: batch 1 holds ids 50/60 -> keeper 50; batch 2's id 10
        # is SMALLER but arrives later and must NOT take over
        (50, 1, "k1"),
        (60, 1, "k1"),
        (10, 2, "k1"),
        # key k2: only in batch 0
        (7, 0, "k2"),
        # key k3: appears in batches 0 and 2
        (99, 0, "k3"),
        (3, 2, "k3"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "batch_id", "fingerprint"])
    got = {
        r.doc_id: (r.batch_id, r.keeper_id)
        for r in incremental_dedup_replay(
            df, key_col="fingerprint", batch_values=[0, 1, 2]
        ).collect()
    }
    assert got == {
        50: (1, 50),
        60: (1, 50),
        10: (2, 50),
        7: (0, 7),
        99: (0, 99),
        3: (2, 99),
    }


def test_incremental_dedup_replay_infers_batches(spark):
    # batch_values=None discovers the ordered batch inventory itself
    from dwds_livestream_spark.operators.dedup import (
        incremental_dedup_replay,
    )

    df = spark.createDataFrame(
        [(5, 1, "a"), (4, 0, "a")], ["doc_id", "batch_id", "fingerprint"]
    )
    out = incremental_dedup_replay(df, key_col="fingerprint").collect()
    assert {r.keeper_id for r in out} == {4}


def test_incremental_dedup_replay_pins_output_to_replayed_batches(spark):
    """Partial replay: rows from batches outside batch_values are not
    part of the replay and must be EXCLUDED — before the fix, a key
    seen only outside the replayed batches silently vanished from the
    output via the inner ledger join, while its batch-mates with
    replayed keys got (mis)assigned."""
    from dwds_livestream_spark.operators.dedup import (
        incremental_dedup_replay,
    )

    rows = [
        (1, 0, "a"),
        (2, 1, "a"),  # same key in an unreplayed batch
        (3, 1, "b"),  # key ONLY in the unreplayed batch
    ]
    df = spark.createDataFrame(rows, ["doc_id", "batch_id", "fingerprint"])
    got = {
        r.doc_id: r.keeper_id
        for r in incremental_dedup_replay(
            df, key_col="fingerprint", batch_values=[0]
        ).collect()
    }
    assert got == {1: 1}  # batch-1 rows excluded wholesale, not mixed


def test_incremental_dedup_replay_rejects_empty_batch_list(spark):
    from dwds_livestream_spark.operators.dedup import (
        incremental_dedup_replay,
    )

    df = spark.createDataFrame(
        [(1, 0, "a")], ["doc_id", "batch_id", "fingerprint"]
    )
    with pytest.raises(ValueError, match="at least one batch"):
        incremental_dedup_replay(df, key_col="fingerprint", batch_values=[])


def test_banded_candidates_reject_nondivisible_bands(spark, documents):
    # both banded consumers must fail fast on k % bands != 0 rather
    # than silently truncating the signature (recall loss); ValueError,
    # not assert — asserts vanish under python -O (ADVICE r5)
    from dwds_livestream_spark.operators.dedup import (
        minhash_levenshtein_pairs,
        minhash_lsh_pairs,
    )

    for fn in (minhash_lsh_pairs, minhash_levenshtein_pairs):
        with pytest.raises(ValueError, match="divisible"):
            fn(documents, k=128, bands=30).collect()


def _cluster_pairs(df, id_col="vec_id"):
    from itertools import combinations

    by_cluster: dict[int, list[int]] = {}
    for r in df.collect():
        by_cluster.setdefault(r["cluster_id"], []).append(r[id_col])
    return {
        p
        for members in by_cluster.values()
        for p in combinations(sorted(members), 2)
    }


def test_ann_clusters_match_exact_on_raw_corpus(spark):
    """dedup_clusters_ann (VERDICT r1 #3): on the raw corpus (no
    cos>=0.8 pairs by construction) the LSH-fed clustering must
    reproduce the exact clustering identically — all singletons."""
    from dwds_livestream_spark.operators.components import (
        connected_components,
    )
    from dwds_livestream_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )
    from dwds_livestream_spark.plans.llm import q_dedup_clusters_ann

    emb = load_table(spark, SF_DIR, "embeddings")
    exact_pairs = embedding_near_dup_pairs(emb, threshold=0.8, exact=True)
    exact = _cluster_pairs(
        connected_components(
            exact_pairs.select("id_a", "id_b"), src="id_a", dst="id_b",
            nodes=emb, node_col="vec_id",
        ).select(F.col("node").alias("vec_id"), "cluster_id")
    )
    approx = _cluster_pairs(q_dedup_clusters_ann(spark, SF_DIR))
    assert approx == exact  # both all-singleton on this corpus


def test_ann_cluster_pair_recall_on_planted_duplicates(spark):
    """The quality gate at the ANN twin's operating point: plant
    seeded near-duplicates (cos >= ~0.9) into the corpus, then require
    >=0.95 same-cluster pair recall of the LSH-fed components vs the
    exact all-pairs clustering, and exact precision (every LSH edge is
    cosine-verified, so no false merges beyond real edges)."""
    import numpy as np

    from dwds_livestream_spark.operators.components import (
        connected_components,
    )
    from dwds_livestream_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    rows = load_table(spark, SF_DIR, "embeddings").collect()
    rng = np.random.default_rng(7)
    planted = []
    for r in rows:
        v = np.array(r.embedding, dtype=np.float64)
        planted.append((int(r.vec_id), [float(x) for x in v]))
        if r.vec_id % 3 == 0:  # one perturbed twin per third vector
            noise = rng.normal(0, 0.08 * np.linalg.norm(v) / np.sqrt(len(v)), len(v))
            w = v + noise
            planted.append((int(r.vec_id) + 100_000, [float(x) for x in w]))
    emb = spark.createDataFrame(planted, "vec_id long, embedding array<double>")

    def clusters(pairs):
        return connected_components(
            pairs.select("id_a", "id_b"), src="id_a", dst="id_b",
            nodes=emb, node_col="vec_id",
        ).select(F.col("node").alias("vec_id"), "cluster_id")

    exact = _cluster_pairs(
        clusters(embedding_near_dup_pairs(emb, threshold=0.8, exact=True))
    )
    approx = _cluster_pairs(
        clusters(embedding_near_dup_pairs(emb, threshold=0.8, exact=False))
    )
    assert len(exact) >= 100  # the planted twins are really there
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.95, f"cluster-pair recall {recall} on {len(exact)}"
    assert approx <= exact  # verified edges => no spurious merges


def test_short_documents_do_not_crash_shingle_family(spark):
    """Review fix: sequence(1, 0) is DESCENDING in Spark — docs with
    fewer than n tokens previously crashed shingles/_with_shingles/
    winnowing with INVALID_PARAMETER_VALUE.START; they must contribute
    zero shingles instead."""
    from dwds_livestream_spark.functions.text import winnowing_fingerprints
    from dwds_livestream_spark.operators.curation import decontaminate
    from dwds_livestream_spark.operators.dedup import shingles

    docs = spark.createDataFrame(
        [(1, "only two"), (2, "a much longer document with many words here")],
        "doc_id long, text string",
    )
    sh = shingles(docs, n=5)
    assert sh.where(F.col("doc_id") == 1).count() == 0
    assert sh.where(F.col("doc_id") == 2).count() > 0

    wf = winnowing_fingerprints(docs, k=5, window=4)
    assert wf.where(F.col("doc_id") == 1).count() == 0

    # short bench doc (0 shingles) must not crash the broadcast build;
    # no shared 5-gram -> no contaminated rows
    bench = spark.createDataFrame([(100, "short one")], "doc_id long, text string")
    assert decontaminate(docs, bench, n=5).count() == 0
    # a bench doc sharing doc 2's 5-gram still flags it
    bench2 = spark.createDataFrame(
        [(101, "a much longer document with")], "doc_id long, text string"
    )
    hits = decontaminate(docs, bench2, n=5).collect()
    assert [r.doc_id for r in hits] == [2]


def test_exact_near_dup_pairs_complete_across_interleaved_chunks(spark):
    """Review fix: the exact GEMM path must emit every qualifying pair
    even when chunk id ranges interleave (chunking follows partition
    order, so a lower-keyed chunk can hold LARGER ids)."""
    from dwds_livestream_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    # force interleaved chunks: repartition so ids {1,100} and {2,50}
    # land in different chunks with overlapping id ranges
    rows = [(i, [1.0, 0.0]) for i in (1, 100, 2, 50)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(2, "vec_id")
    pairs = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(
            df, threshold=0.9, exact=True
        ).collect()
    }
    import itertools

    want = {
        (a, b)
        for a, b in itertools.combinations(sorted([1, 2, 50, 100]), 2)
    }
    assert pairs == want
    assert all(a < b for a, b in pairs)


def test_simhash_rejects_guarantee_breaking_radius(spark, documents):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        simhash_near_pairs(documents, max_hamming=4, blocks=4)

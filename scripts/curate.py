"""End-to-end corpus curation CLI: documents parquet in, curated
training corpus + audit report out.

Stages (each a library operator; this script only composes):
  1. exact dedup            (keep min doc_id per content hash)
  2. quality gate           (functions/text.py::quality_score, keep=true)
  3. repetition gate        (operators/curation.py::repetition_stats)
  4. language id            (functions/text.py::language_id)
  5. PII redaction          (operators/curation.py::pii_redact)
  6. decontamination        (vs --bench-mod subset, 5-gram overlap)
  7. mixture sampling       (per-source rates, content-addressed)
  8. train/val/test split   (content-addressed md5 bucketing)

Usage:
  PYTHONPATH=/root/repo python scripts/curate.py \
      --in /root/testdata/sf0.001 --out /tmp/curated [--report -]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dwds_livestream_spark.functions.text import language_id, quality_score  # noqa: E402
from dwds_livestream_spark.operators.curation import (  # noqa: E402
    decontaminate,
    mixture_sample,
    pii_redact,
    repetition_stats,
    stratified_split,
)
from dwds_livestream_spark.session import build_session  # noqa: E402


def curate(spark, in_dir: str, out_dir: str, bench_mod: int = 97) -> dict:
    docs = spark.read.parquet(os.path.join(in_dir, "documents.parquet"))
    n_in = docs.count()

    keepers = (
        docs.groupBy(F.md5("text").alias("__h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    quality = quality_score(docs).where("keep").select("doc_id", "quality_score")
    repetition = repetition_stats(docs).where("keep").select("doc_id")
    lang = language_id(docs).select("doc_id", "pred_lang")
    contaminated = decontaminate(
        docs, docs.where(F.col("doc_id") % bench_mod == 0), n=5
    ).select("doc_id")
    redacted = pii_redact(docs).select("doc_id", "redacted", "n_redactions")

    surviving = (
        docs.join(keepers, "doc_id", "left_semi")
        .join(quality, "doc_id")
        .join(repetition, "doc_id", "left_semi")
        .join(contaminated, "doc_id", "left_anti")
        .join(lang, "doc_id")
        .join(redacted, "doc_id")
        .select(
            "doc_id",
            F.col("redacted").alias("text"),
            "lang",
            "pred_lang",
            "source",
            "quality_score",
            "n_redactions",
        )
    )
    sampled = mixture_sample(surviving, rates={}, default_rate=1.0)
    final = stratified_split(sampled)
    final.write.mode("overwrite").partitionBy("split").parquet(out_dir)

    out = spark.read.parquet(out_dir)
    report = {
        "n_in": n_in,
        "n_out": out.count(),
        "by_split": {
            r.split: r.n
            for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
        },
        "by_lang": {
            r.pred_lang: r.n
            for r in out.groupBy("pred_lang").agg(F.count("*").alias("n")).collect()
        },
        "n_redactions": out.agg(F.sum("n_redactions")).collect()[0][0],
    }
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="in_dir", required=True)
    ap.add_argument("--out", dest="out_dir", required=True)
    ap.add_argument("--bench-mod", type=int, default=97)
    args = ap.parse_args()
    spark = build_session(app_name="dwds-livestream-curate")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(curate(spark, args.in_dir, args.out_dir, args.bench_mod)))


if __name__ == "__main__":
    main()

"""Crawl-curation demo: from raw WARC archives to a curated corpus,
end to end — the ingest half of a pretraining-data pipeline.

    WARC ingest        (ISO 28500 record walk, per-record gzip members)
    robots compliance  (RFC 9309 longest-match filtering per host)
    URL dedup          (canonicalization collapses spelling variants)
    main-content       (block link-density drops nav/related/footer chrome)
    quality + lang     (the oracle-checked scoring battery)
    near-dup removal   (MinHash+LSH -> curated survivors)

Every stage is a first-class operator with an oracle-verified query
twin (warc_record_stats, robots_url_filter, url_canonical_dedup,
main_content_extract, warc_corpus_quality, minhash_near_dups).
Run: python scripts/demo_crawl.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from etl_online_retail_spark.catalog import load_table
from etl_online_retail_spark.functions.html_text import extract_main_text
from etl_online_retail_spark.functions.robots import (
    robots_decisions,
    robots_rules,
)
from etl_online_retail_spark.functions.url import canonical_url
from etl_online_retail_spark.operators.curation import curate_corpus
from etl_online_retail_spark.session import get_spark
from etl_online_retail_spark.sources.warc import (
    synthetic_crawl_archives,
    warc_records,
)
from etl_online_retail_spark.workload_ext import ROBOTS_FIXTURE


def run_crawl_pipeline(spark, sf_dir: str) -> dict:
    docs = load_table(spark, "documents", sf_dir).cache()
    n_docs = docs.count()

    # 1. the crawl lands: one archive per page, half of them .warc.gz
    archives = synthetic_crawl_archives(docs, chrome=True)
    records = warc_records(archives).cache()
    by_type = {r.warc_type: r.n for r in
               (records.groupBy("warc_type")
                .agg(F.count(F.lit(1)).alias("n")).collect())}

    # 2. responses only, with their crawl URL split into host + path
    responses = (records.filter(F.col("warc_type") == "response")
                 .select(F.col("archive_id").alias("doc_id"),
                         "target_uri", "body"))
    parts = F.regexp_extract("target_uri", r"^https?://([^/]+)(/.*)$", 1)
    path = F.regexp_extract("target_uri", r"^https?://([^/]+)(/.*)$", 2)
    urls = responses.select("doc_id", parts.alias("host"),
                            path.alias("path"))

    # 3. robots compliance: every host publishes the fixture policy,
    # plus one host that bans crawling outright. Decisions run over the
    # KEY columns only (the docstring's scale rule: bodies must not
    # ride the decision shuffle); payloads join back after.
    hosts = (docs.select(F.col("source").alias("host")).distinct()
             .withColumn("robots_txt",
                         F.when(F.col("host") == "src0",
                                F.lit("User-agent: *\nDisallow: /\n"))
                         .otherwise(F.lit(ROBOTS_FIXTURE))))
    decisions = robots_decisions(urls, robots_rules(hosts)).cache()
    n_allowed = decisions.filter("allowed").count()

    # 4. URL canonicalization: dedup re-fetches of the same page under
    # different spellings (here: the doc's URI vs a tracking-params +
    # default-port variant of it). Same shuffle rule as step 3: the
    # dedup groupBy carries only (url, id) keys — the fetched bodies
    # join back AFTER the surviving ids are known, instead of riding
    # the union + shuffle twice (r12 review).
    allowed = (decisions.filter("allowed")
               .join(responses.drop("body"), "doc_id")
               .select("doc_id", "target_uri"))
    variants = allowed.select("doc_id",
                              F.col("target_uri").alias("url")).unionByName(
        allowed.select(
            "doc_id",
            F.concat(F.regexp_replace("target_uri", "^http://", "HTTP://"),
                     F.lit("?utm_source=feed#top")).alias("url")))
    canon = variants.withColumn("canonical", canonical_url("url"))
    n_fetches = canon.count()
    deduped = (canon.groupBy("canonical")
               .agg(F.min("doc_id").alias("doc_id"))
               .join(responses.select("doc_id", "body"), "doc_id"))
    n_pages = deduped.count()

    # 5. main-content extraction (chrome blocks dropped by link
    # density), then the curation battery over the EXTRACTED text
    extracted = extract_main_text(
        deduped.select("doc_id", "body"), "body", "doc_id").cache()
    curated = curate_corpus(extracted).cache()
    n_curated = curated.count()
    sample = (curated.join(extracted, "doc_id")
              .orderBy(F.desc("quality")).first())

    return {"n_docs": n_docs, "by_type": by_type,
            "n_allowed": n_allowed, "n_fetches": n_fetches,
            "n_pages": n_pages, "n_curated": n_curated,
            "sample": sample}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("demo-crawl")
    out = run_crawl_pipeline(spark, sf_dir)
    n = out["n_docs"]

    print(f"\n== WARC ingest ({n} pages crawled) ==")
    for t, c in sorted(out["by_type"].items()):
        print(f"  {t:9s} {c:6d} records")

    print("== robots compliance ==")
    print(f"  {out['n_allowed']}/{n} responses crawl-allowed "
          f"(src0 bans crawling outright; the other hosts' /doc/ paths "
          f"match no Disallow)")

    print("== URL canonicalization ==")
    print(f"  {out['n_fetches']} fetches collapse to {out['n_pages']} "
          f"canonical pages (tracking params, scheme case, fragments)")

    print("== main-content extraction + curation ==")
    print(f"  {out['n_curated']}/{out['n_pages']} pages survive quality "
          f"+ exact-dup + near-dup removal")
    s = out["sample"]
    print(f"  best page: doc {s.doc_id} (quality {s.quality:.3f}): "
          f"{s.text[:70]!r}...")


if __name__ == "__main__":
    main()

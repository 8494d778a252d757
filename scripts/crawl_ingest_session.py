"""Recorded dedup-gated crawl ingest session (VERDICT r12 item 5).

The gated crawl stream's pieces are each tested (stream-equals-batch,
tests/test_warc.py) — this drives the FULL composition at accumulated
scale in one recorded run: 30 fixed-size micro-batches of WARC archives
flow through canonical-URL dedup -> main-content extraction -> MinHash
near-dup gating -> quality telemetry, while the accumulated URL and
band indexes grow ~20x the batch size.

Feed shape: every batch carries 3,000 archives. Batch 0 is 3,000 fresh
pages; each later batch is 2,000 fresh pages + 500 RE-CRAWLS of the
previous batch's pages (same URL with a tracking-param variant — must
be dropped by the URL gate, BEFORE extraction runs) + 500 EXACT-COPY
texts of the previous batch's pages under new URLs (must be rejected by
the MinHash gate). Page texts are generated from a global ordinal so
distinct pages share zero shingles — the gates' decisions are exact,
not probabilistic, and the closing assertions can state the accepted
set in closed form: 3,000 + 29 x 2,000 = 61,000 accepted pages,
29 x 500 = 14,500 near-dup rejections.

The claim under test: per-batch ingest cost is FLAT in accumulated
index size — the URL index is anti-joined on a single pruned column,
the band probe's work is |batch| x collisions (not index-sized), and
extraction runs only on URL-fresh pages. The report buckets per-batch
trigger times at early / mid / late accumulated volume.

Usage: python scripts/crawl_ingest_session.py   (run alone: wall-clock)
Results are recorded in PERFORMANCE.md.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BATCHES = int(os.environ.get("SPARK_GRAFT_CRAWL_BATCHES", "30"))
FRESH = 2000          # fresh pages per batch (batch 0: FRESH + RECRAWL + COPY)
RECRAWL = 500         # tracking-param re-fetches of the previous batch
COPY = 500            # exact-copy texts under new URLs
BATCH_SIZE = FRESH + RECRAWL + COPY


def _gen_text(ordinal):
    """12 tokens, each embedding the page's global ordinal — distinct
    pages share ZERO 2-word shingles, so the MinHash gate's decisions
    are exact (copies jaccard 1, everything else jaccard 0)."""
    from pyspark.sql import functions as F

    toks = [F.concat(F.lit(f"t{k}w"), ordinal.cast("string"))
            for k in range(12)]
    return F.concat_ws(" ", *toks)


def _pages(spark, start: int, count: int):
    """(ordinal, source, text, base uri) for pages [start, start+count)."""
    from pyspark.sql import functions as F

    return (spark.range(start, start + count)
            .select(F.col("id").alias("ordinal"),
                    F.concat(F.lit("h"), (F.col("id") % 50).cast("string"))
                     .alias("source"),
                    _gen_text(F.col("id")).alias("text"),
                    F.concat(F.lit("http://h"),
                             (F.col("id") % 50).cast("string"),
                             F.lit("/p/"), F.col("id").cast("string"))
                     .alias("uri")))


def _fresh_start(b: int) -> int:
    """First fresh-page ordinal of batch b (batch 0 carries BATCH_SIZE
    fresh pages, later batches FRESH each)."""
    return 0 if b == 0 else BATCH_SIZE + (b - 1) * FRESH


def build_batch(spark, b: int):
    """One micro-batch's (doc_id, source, text, uri) rows. archive ids
    are b*10_000 + slot (fresh 0.., re-crawls 5000.., copies 6000..) —
    globally unique across the session."""
    from pyspark.sql import functions as F

    base = b * 10_000
    n_fresh = BATCH_SIZE if b == 0 else FRESH
    start = _fresh_start(b)
    fresh = (_pages(spark, start, n_fresh)
             .select((F.lit(base) + F.col("ordinal") - start)
                     .alias("doc_id"), "source", "text", "uri"))
    if b == 0:
        return fresh
    prev = _fresh_start(b - 1)
    recrawl = (_pages(spark, prev, RECRAWL)
               .select((F.lit(base + 5_000) + F.col("ordinal") - prev)
                       .alias("doc_id"), "source", "text",
                       F.concat("uri", F.lit("?utm_source=re")).alias("uri")))
    cid = F.lit(base + 6_000) + F.col("ordinal") - prev - RECRAWL
    copies = (_pages(spark, prev + RECRAWL, COPY)
              .select(cid.alias("doc_id"), "source", "text",
                      F.concat(F.lit("http://"), F.col("source"),
                               F.lit("/q/"), cid.cast("string"))
                      .alias("uri")))
    return fresh.unionByName(recrawl).unionByName(copies)


def build_feed(spark, feed_dir: str) -> int:
    from etl_online_retail_spark.sources.warc import (
        synthetic_crawl_archives,
    )

    os.makedirs(feed_dir, exist_ok=True)
    total = 0
    for b in range(N_BATCHES):
        docs = build_batch(spark, b)
        archives = synthetic_crawl_archives(docs, chrome=True,
                                            uri_col="uri")
        stage = tempfile.mkdtemp()
        archives.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = os.path.join(feed_dir, f"batch_{b:03d}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(stage, ignore_errors=True)
        # file source drains oldest-first: strictly increasing mtimes
        os.utime(dst, (1_000_000 + b, 1_000_000 + b))
        total += BATCH_SIZE
    return total


def main() -> None:
    from pyspark.sql import functions as F

    from etl_online_retail_spark.session import get_spark
    from etl_online_retail_spark.streaming.ingest import (
        incremental_crawl_dedup_ingest,
        read_accepted_pages,
        read_crawl_quality,
    )

    spark = get_spark("crawl-ingest-session")
    work = tempfile.mkdtemp(prefix="crawl_ingest_")
    feed_dir = os.path.join(work, "feed")
    d = {n: os.path.join(work, n) for n in
         ("url_idx", "accepted", "quality", "mh_idx", "mh_dups", "ckpt")}

    t0 = time.perf_counter()
    n_rows = build_feed(spark, feed_dir)
    print(f"feed: {N_BATCHES} micro-batches x {BATCH_SIZE} archives "
          f"({n_rows} total; {time.perf_counter() - t0:.1f}s to build)",
          flush=True)

    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
                   str(N_BATCHES + 8))
    schema = "archive_id long, content binary"
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(feed_dir))
    t0 = time.perf_counter()
    q = incremental_crawl_dedup_ingest(
        stream, d["url_idx"], d["accepted"], d["quality"],
        d["mh_idx"], d["mh_dups"], d["ckpt"])
    q.awaitTermination()
    t_total = time.perf_counter() - t0
    prog = [p for p in q.recentProgress if p["numInputRows"] > 0]
    per_batch = [(int(p["batchId"]),
                  p["durationMs"]["triggerExecution"] / 1000.0)
                 for p in prog]
    print(f"gated {len(per_batch)} micro-batches in {t_total:.1f}s "
          f"({t_total / max(1, len(per_batch)):.2f}s/batch wall)",
          flush=True)

    # bucket trigger times by accumulated index size (pages indexed
    # before the batch runs: 0 at batch 0, ~20x batch size by the tail)
    buckets: dict[str, list[float]] = {
        "early (1-5)": [], "mid (13-17)": [], "late (25-29)": []}
    for bid, sec in per_batch:
        if 1 <= bid <= 5:
            buckets["early (1-5)"].append(sec)
        elif 13 <= bid <= 17:
            buckets["mid (13-17)"].append(sec)
        elif 25 <= bid <= 29:
            buckets["late (25-29)"].append(sec)
    for label, xs in buckets.items():
        if xs:
            print(f"  per-batch trigger at {label}: "
                  f"min {min(xs):.2f}s / mean {sum(xs) / len(xs):.2f}s / "
                  f"max {max(xs):.2f}s over {len(xs)} batches", flush=True)

    acc = read_accepted_pages(spark, d["accepted"]).cache()
    n_acc = acc.count()
    per = {int(r._batch_id): int(r.n) for r in
           acc.groupBy("_batch_id").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    want_acc = BATCH_SIZE + (N_BATCHES - 1) * FRESH
    n_rej = (spark.read
             .schema("new_id bigint, corpus_id bigint, jaccard double, "
                     "_batch_id int")
             .parquet(d["mh_dups"]).select("new_id").distinct().count())
    n_tel = int(read_crawl_quality(spark, d["quality"])
                .agg(F.sum("n_pages")).collect()[0][0])
    # per.get(b, 0): a batch accepting ZERO pages has no _batch_id
    # partition — exactly the deviation this script exists to report,
    # so it must reach the FAIL print, not die on a KeyError
    ok = (n_acc == want_acc
          and per.get(0, 0) == BATCH_SIZE
          and all(per.get(b, 0) == FRESH for b in range(1, N_BATCHES))
          and n_rej == (N_BATCHES - 1) * COPY
          and n_tel == n_acc)
    print(f"accepted {n_acc} (want {want_acc}); per-batch accepts "
          f"{per.get(0, 0)} then "
          f"{sorted(set(per.get(b, 0) for b in range(1, N_BATCHES)))}"
          f"; near-dup rejections {n_rej} "
          f"(want {(N_BATCHES - 1) * COPY}); telemetry n_pages {n_tel}",
          flush=True)
    shutil.rmtree(work, ignore_errors=True)
    if not ok:
        print("FAIL: accepted/rejected sets deviate from closed form")
        sys.exit(1)
    print("all green — URL gate dropped every re-crawl before "
          "extraction, MinHash gate rejected every copy, telemetry "
          "covers exactly the accepted set")


if __name__ == "__main__":
    main()

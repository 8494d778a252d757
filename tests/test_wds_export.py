"""WebDataset tar-shard export: round-trip, determinism, and the
manifest contract."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_online_retail_spark.multimodal.wds import (
    read_wds_shard,
    write_wds_shards,
)

SF = "/root/testdata/sf0.001"


def _media(spark):
    from etl_online_retail_spark.catalog import load_table
    from etl_online_retail_spark.multimodal.binary import synthetic_wav_media

    docs = load_table(spark, "documents", SF).limit(40)
    media = synthetic_wav_media(docs)
    langs = docs.select(F.col("doc_id").alias("media_id"), "lang")
    return media.join(langs, "media_id")


def test_wds_round_trip_and_manifest(spark, tmp_path):
    media = _media(spark).cache()
    out = str(tmp_path / "wds")
    manifest = {r.shard: r for r in
                write_wds_shards(media, out, n_shards=4,
                                 ext="wav", meta_cols=("lang",)).collect()}
    assert sum(r.n_members for r in manifest.values()) == media.count()
    total = 0
    src = {r.media_id: (bytes(r.content), r.lang) for r in media.collect()}
    for sh, r in manifest.items():
        assert os.path.getsize(r.path) == r.n_bytes
        for key, payload, meta in read_wds_shard(r.path, ext="wav"):
            want_payload, want_lang = src[meta["media_id"]]
            assert payload == want_payload          # bytes round-trip
            assert meta["lang"] == want_lang        # metadata round-trip
            total += 1
    assert total == media.count()


def test_wds_shards_are_deterministic(spark, tmp_path):
    media = _media(spark).cache()
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    pa = {r.shard: r.path for r in
          write_wds_shards(media, a, n_shards=4, ext="wav").collect()}
    pb = {r.shard: r.path for r in
          write_wds_shards(media, b, n_shards=4, ext="wav").collect()}
    assert pa.keys() == pb.keys()
    for sh in pa:
        with open(pa[sh], "rb") as fa, open(pb[sh], "rb") as fb:
            assert fa.read() == fb.read()  # byte-identical reruns

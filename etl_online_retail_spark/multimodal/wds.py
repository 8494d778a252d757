"""WebDataset-style tar shard export: the standard delivery format for
multimodal training data (image/audio payloads + JSON metadata packed as
`{key}.{ext}` members inside sequentially-read tar files — what the
training loaders stream, instead of millions of small files).

Spark-first shape: shard assignment is the deterministic affine-hash
bucket of the id (the sampling module's portable hash — reproducible
across runs/engines/layouts, like every sampler here), members sort by
key within a shard, and each shard's tar is assembled by ONE
applyInPandas group task writing a single file. Shard count bounds both
task memory (members stream into the tar buffer) and output file size;
nothing driver-side ever touches payload bytes.
"""

from __future__ import annotations

import io
import json
import os
import tarfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_online_retail_spark.operators.sampling import _bucket

_MANIFEST_SCHEMA = T.StructType([
    T.StructField("shard", T.IntegerType()),
    T.StructField("path", T.StringType()),
    T.StructField("n_members", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
])


def write_wds_shards(media: DataFrame, out_dir: str, n_shards: int = 8,
                     id_col: str = "media_id",
                     payload_col: str = "content",
                     ext: str = "bin",
                     meta_cols: tuple = ()) -> DataFrame:
    """Pack (id, payload[, metadata...]) rows into `n_shards` tar files
    under out_dir as shard-%05d.tar; each row contributes
    `{id}.{ext}` (the payload bytes) and `{id}.json` (the metadata
    columns), keys zero-padded so tar order is stable. Returns the
    manifest (shard, path, n_members, n_bytes) — assert/commit on it.

    Deterministic end to end: hash-bucket shard assignment + sorted
    members means a rerun produces byte-identical shards (modulo tar
    mtime, pinned to 0 here) — the reproducibility contract the rest of
    the sampling/export surface keeps.
    """
    os.makedirs(out_dir, exist_ok=True)
    shard = F.pmod(_bucket(F.col(id_col)), F.lit(n_shards)).cast("int")
    cols = [F.col(id_col), F.col(payload_col).alias("_payload"),
            *[F.col(c) for c in meta_cols]]
    work = media.select(*cols).withColumn("_shard", shard)

    meta_names = list(meta_cols)

    def pack(pdf):
        import pandas as pd

        sh = int(pdf["_shard"].iloc[0])
        path = os.path.join(out_dir, f"shard-{sh:05d}.tar")
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for _, row in pdf.sort_values(id_col).iterrows():
                key = f"{int(row[id_col]):012d}"
                payload = bytes(row["_payload"])
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(payload)
                info.mtime = 0
                tar.addfile(info, io.BytesIO(payload))
                meta = {c: row[c] for c in meta_names}
                meta[id_col] = int(row[id_col])
                mjson = json.dumps(meta, sort_keys=True,
                                   default=str).encode()
                minfo = tarfile.TarInfo(name=f"{key}.json")
                minfo.size = len(mjson)
                minfo.mtime = 0
                tar.addfile(minfo, io.BytesIO(mjson))
        data = buf.getvalue()
        with open(path, "wb") as f:
            f.write(data)
        return pd.DataFrame({"shard": [sh], "path": [path],
                             "n_members": [len(pdf)],
                             "n_bytes": [len(data)]})

    return (work.groupBy("_shard")
            .applyInPandas(pack, schema=_MANIFEST_SCHEMA))


def read_wds_shard(path: str, ext: str = "bin") -> list[tuple]:
    """Test/consumer helper: (key, payload, meta) triples from one shard,
    in tar order."""
    out = []
    with tarfile.open(path) as tar:
        members = tar.getmembers()
        by_key: dict = {}
        for m in members:
            key, kind = m.name.rsplit(".", 1)
            by_key.setdefault(key, {})[kind] = tar.extractfile(m).read()
        for key in sorted(by_key):
            payload = by_key[key].get(ext)
            meta = json.loads(by_key[key]["json"])
            out.append((key, payload, meta))
    return out

"""Property-based spot checks (SURVEY.md §5.4).

Kept cheap: few hypothesis examples, one Spark job per example, local data.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from etl_online_retail_spark.functions.hashing import PRIME
from etl_online_retail_spark.operators.dedup import keep_last

ASCII_TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40)


def _python_poly_hash(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % PRIME
    return h


@settings(max_examples=5, deadline=None)
@given(st.lists(ASCII_TEXT, min_size=1, max_size=8, unique=True))
def test_poly_hash_matches_reference_implementation(spark, strings):
    from etl_online_retail_spark.functions.hashing import poly_hash

    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {r.s: r.h for r in df.select("s", poly_hash("s").alias("h")).collect()}
    assert got == {s: _python_poly_hash(s) for s in strings}


@settings(max_examples=5, deadline=None)
@given(st.integers(min_value=1, max_value=16))
def test_decimal_sum_invariant_under_repartition(spark, n_parts):
    li = (spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
          .select(F.col("l_extendedprice").cast("decimal(18,2)").alias("p")))
    base = li.agg(F.sum("p")).collect()[0][0]
    shuffled = li.repartition(n_parts).agg(F.sum("p")).collect()[0][0]
    assert base == shuffled  # exact decimal: bit-equal under any layout


@settings(max_examples=5, deadline=None)
@given(st.permutations(list(range(6))))
def test_keep_last_invariant_under_input_order(spark, perm):
    rows = [("k1", "v0", 0), ("k1", "v1", 1), ("k1", "v2", 2),
            ("k2", "a", 0), ("k2", "b", 1), ("k3", "x", 0)]
    shuffled = [rows[i] for i in perm]
    df = spark.createDataFrame(shuffled, "k string, v string, ord long")
    out = {r.k: r.v for r in
           keep_last(df, ["k"], [F.desc("ord"), F.desc("v")]).collect()}
    assert out == {"k1": "v2", "k2": "b", "k3": "x"}


@settings(max_examples=5, deadline=None)
@given(st.lists(
    st.tuples(st.sampled_from(["a", "b"]),      # source
              st.integers(0, 50),               # doc_id (deduped below)
              st.integers(0, 40)),              # token count (0 = empty doc)
    min_size=1, max_size=12))
def test_pack_sequences_matches_reference(spark, rows):
    from etl_online_retail_spark.operators.packing import pack_sequences

    # unique (source, doc_id): the operator orders by doc_id within source
    uniq = {(s, d): t for s, d, t in rows}
    data = [(s, d, t) for (s, d), t in uniq.items()]
    budget = 7
    df = spark.createDataFrame(data, "source string, doc_id long, tok int")
    got = {(r.source, r.doc_id): (r.start_offset, r.first_seq, r.last_seq)
           for r in pack_sequences(df, budget=budget,
                                   tokens_col="tok").collect()}
    # reference: cumulative offsets per source in doc_id order
    want = {}
    for src in {s for s, _, _ in data}:
        off = 0
        for s, d, t in sorted((x for x in data if x[0] == src),
                              key=lambda x: x[1]):
            first = off // budget
            last = first if t == 0 else (off + t - 1) // budget
            want[(s, d)] = (off, first, last)
            off += t
    assert got == want


@settings(max_examples=5, deadline=None)
@given(st.lists(
    st.tuples(st.integers(1, 3),                 # key
              st.integers(0, 5),                 # ts (coarse -> ties likely)
              st.sampled_from(["x", "y", None])),  # attr (nullable)
    min_size=1, max_size=12))
def test_scd2_matches_reference(spark, rows):
    import datetime as dt

    from etl_online_retail_spark.operators.scd import scd2_from_changelog

    data = [(str(k), dt.datetime(2024, 1, 1 + ts), i, a)
            for i, (k, ts, a) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "key string, ts timestamp, seq long, attr string")
    got = {(r.key, r.version): (r.attr, r.effective_from, r.effective_to)
           for r in scd2_from_changelog(df, "key", ["attr"], "ts",
                                        "seq").collect()}
    # reference: per key, walk (ts, seq)-sorted rows, open on change
    want = {}
    for key in {d[0] for d in data}:
        hist = sorted((d for d in data if d[0] == key),
                      key=lambda d: (d[1], d[2]))
        opens = []
        prev = object()  # sentinel != anything including None
        for _, ts, _, attr in hist:
            if attr != prev:
                opens.append([ts, attr])
            prev = attr
        for v, (ts, attr) in enumerate(opens, start=1):
            eff_to = opens[v][0] if v < len(opens) else None
            want[(key, v)] = (attr, ts, eff_to)
    assert got == want


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 20), st.integers(1, 20), st.integers(0, 255),
       st.booleans())
def test_jpeg_solid_color_roundtrip_bounded(w, h, v, subsample):
    """Any solid-color image at any dimensions decodes to within 2 of the
    source (DC-only blocks; luma DC quant 16 -> error <= 1 + rounding)."""
    from etl_online_retail_spark.multimodal import jpeg

    img = jpeg.decode_jpeg(
        jpeg.encode_jpeg(bytes([v]) * (w * h * 3), w, h, 3,
                         subsample=subsample))
    assert (img.width, img.height, img.channels) == (w, h, 3)
    assert all(abs(p - v) <= 2 for p in img.pixels)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(-32768, 32767), min_size=2, max_size=64)
       .filter(lambda s: len(s) % 2 == 0),
       st.sampled_from([8000, 16000, 44100]), st.integers(1, 2))
def test_wav_16bit_roundtrip_lossless(samples, sr, channels):
    from etl_online_retail_spark.multimodal import wav

    clip = wav.decode_wav(wav.encode_wav(samples, sr, channels))
    assert clip.samples.tolist() == samples
    assert (clip.sample_rate, clip.channels) == (sr, channels)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 10), st.integers(1, 6),
                          st.integers(0, 127)), min_size=1, max_size=6))
def test_mjpeg_split_recovers_every_frame(frames):
    from etl_online_retail_spark.multimodal import jpeg
    from etl_online_retail_spark.multimodal.binary import frame_sample

    encoded = [jpeg.encode_jpeg(bytes([2 * v]) * (w * h * 3), w, h, 3)
               for (w, h, v) in frames]
    parts = jpeg.split_mjpeg(b"".join(encoded))
    assert parts == encoded
    sampled = frame_sample(b"".join(encoded), every_n=1)
    assert len(sampled) == len(frames)
    for (i, fr), (w, h, v) in zip(sampled, frames):
        img = jpeg.decode_jpeg(fr)
        assert (img.width, img.height) == (w, h)
        assert img.mean_pixel() == 2 * v  # even gray: bit-exact


@given(st.integers(min_value=0, max_value=500),
       st.integers(min_value=1, max_value=12))
@settings(max_examples=60, deadline=None)
def test_ntile_closed_form_matches_definition(total, n):
    """The integer closed form behind distributed_ntile(_by) — first
    N % n buckets hold ceil(N/n) rows, the rest floor(N/n) — must equal
    the SQL-standard NTILE definition for every (rank, N, n)."""
    q, rem = divmod(total, n)
    t = rem * (q + 1)

    def closed_form(r: int) -> int:
        if r <= t:
            return (r - 1) // (q + 1) + 1
        return rem + (r - t - 1) // max(q, 1) + 1

    # reference: deal rows into n buckets, larger buckets first
    sizes = [q + 1 if i < rem else q for i in range(n)]
    ref = []
    for b, s in enumerate(sizes, start=1):
        ref.extend([b] * s)
    assert [closed_form(r) for r in range(1, total + 1)] == ref


@settings(max_examples=5, deadline=None)
@given(st.data())
def test_upsert_is_batch_split_and_replay_order_invariant(spark, tmp_path_factory, data):
    """Property: the keyed parquet upsert (ingest.upsert_batch_write)
    converges to keep-last-per-key over ALL rows for ANY split of the
    rows into batches and ANY at-least-once replay schedule — including
    OUT-OF-ORDER replays of old batches after newer ones landed (a
    restarted stream re-delivering history), which the example tests
    never exercise. Ties on (key, order) across batches are decided by
    the content tiebreak, so replays cannot flip a winner."""
    from etl_online_retail_spark.streaming.ingest import upsert_batch_write

    # small key/order spaces to force cross-batch collisions and ties
    rows = data.draw(
        st.lists(st.tuples(st.integers(0, 5),            # key
                           st.integers(0, 3),            # order
                           st.sampled_from(["x", "y"])), # payload
                 min_size=1, max_size=16),
        label="rows")
    k = data.draw(st.integers(min_value=1, max_value=3), label="k")
    replays = data.draw(
        st.lists(st.integers(0, k - 1), max_size=3), label="replays")

    df = spark.createDataFrame(rows, "k long, ord long, v string").cache()
    batches = [df.filter(F.pmod(F.xxhash64("k", "ord", "v"), F.lit(k)) == b)
               for b in range(k)]
    tdir = str(tmp_path_factory.mktemp("upsert")) + "/t"
    for b in list(range(k)) + replays:      # replays land AFTER everything
        upsert_batch_write(batches[b], b, tdir, ["k"], "ord")

    got = sorted((r.k, r.ord, r.v) for r in
                 spark.read.parquet(tdir).drop("_shard").collect())
    want = sorted((r.k, r.ord, r.v) for r in
                  keep_last(df, ["k"],
                            [F.desc("ord"),
                             F.desc(F.xxhash64("k", "ord", "v"))]).collect())
    assert got == want, f"k={k} replays={replays}"

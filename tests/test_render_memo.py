"""The r15 render memo must be invisible: every synthetic-media
generator's payload for a given id is byte-identical whether or not the
per-task memo hits. Each generator runs twice over an id set chosen to
force BOTH paths — the first occurrence of each distinct key builds the
payload (memo miss), repeats serve from the memo — and the repeated
rows must carry byte-identical content to their first occurrence.

(Bit-exactness of the decoded features against the closed-form oracle
is separately enforced by scripts/verify_local.py on the registered
codec queries; this test pins the payload BYTES, which the oracle
cannot see.)
"""

from __future__ import annotations

import pytest

# ids chosen to repeat every generator's derived key at least once:
# duplicates of the same id are guaranteed memo hits for every key fn
IDS = [0, 1, 7, 17, 255, 256, 257, 0, 1, 7, 17, 255, 256, 257, 512, 769]

GENERATORS = [
    "synthetic_png_media",
    "synthetic_webp_media",
    "synthetic_tiff_media",
    "synthetic_bmp_media",
    "synthetic_jpeg_media",
    "synthetic_progressive_jpeg_media",
    "synthetic_gif_media",
    "synthetic_animated_gif_media",
    "synthetic_mjpeg_media",
    "synthetic_pattern_media",
    "synthetic_wav_media",
    "synthetic_ulaw_media",
    "synthetic_flac_media",
    "synthetic_tone_media",
    "synthetic_webm_media",
    "synthetic_mp4_media",
    "synthetic_adpcm_media",
]

# native-library generators: skip when the binding is absent (same
# env-gating the registered queries use)
NATIVE = {"synthetic_lossy_webp_media", "synthetic_avif_media"}


def _native_available(name: str) -> bool:
    if name == "synthetic_lossy_webp_media":
        from etl_online_retail_spark.multimodal import native
        return native.libwebp_available()
    from etl_online_retail_spark.multimodal import heif
    return heif.avif_available()


@pytest.mark.parametrize("gen_name", GENERATORS + sorted(NATIVE))
def test_repeated_ids_get_identical_payloads(spark, gen_name):
    from etl_online_retail_spark.multimodal import binary

    if gen_name in NATIVE and not _native_available(gen_name):
        pytest.skip(f"{gen_name}: native library absent")
    gen = getattr(binary, gen_name)
    docs = spark.createDataFrame([(i,) for i in IDS], "doc_id long")
    # coalesce(1): all ids share one task, so repeats are memo HITS in
    # the generators that memoize (and a no-op in the ones that don't)
    rows = (gen(docs.coalesce(1)).collect())
    by_id: dict[int, bytes] = {}
    n_hits = 0
    for r in rows:
        content = bytes(r.content)
        if r.media_id in by_id:
            assert content == by_id[r.media_id], (
                f"{gen_name}: repeated id {r.media_id} rendered "
                f"different bytes")
            n_hits += 1
        else:
            by_id[r.media_id] = content
    assert n_hits >= 7, f"{gen_name}: repeats did not reach the memo"
    # distinct ids with equal derived keys must also collide to the
    # same payload where the generator's contract says so: 1 and 257
    # share every mod-key <= 256 (w, h, v, motif, tone, ...) in the
    # mod-256-keyed image generators
    if gen_name in {"synthetic_png_media", "synthetic_gif_media",
                    "synthetic_pattern_media", "synthetic_tone_media"}:
        assert by_id[1] == by_id[257], (
            f"{gen_name}: ids 1 and 257 share the full derived key and "
            f"must render identical payloads")

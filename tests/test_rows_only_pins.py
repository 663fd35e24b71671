"""Full-result regression pins at sf0.001. Every entry here now ALSO
has a DuckDB oracle (round 5 closed the last rows-only row,
media_features) — the pins stay as an independent regression tooth
computed through a different code path (toPandas + md5 of sorted
string rows) than the driver's compare. A hash change means the
query's semantics moved — update the pin only with an explanation of
what changed and why it is correct.
"""

import hashlib

import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"

PINS = {
    "serimi_alignment": "f6ad9c018c6653172e64d10e07c1e283",
    # ann_lsh_topk gained a full SQL oracle in round 3; the pin stays
    # as an extra regression tooth on the SRP bucketing
    "ann_lsh_topk": "8b97e60b5620ac38a2b7f1f3c9a4cd4c",
    "advanced_string_matching": "c52baee8e25943d17dcd9c773f24b18f",
    # real numpy PPM/WAV decode over the synthetic media table (r3);
    # repinned r4: the table gained real-zlib PNG rows (color types
    # 2/6, all five scanline filters), real-LZW GIF rows and real
    # baseline-JPEG rows (4:4:4/4:2:0/gray/restart), so composition +
    # hash changed. Round 5: media_features gained a full VALUES
    # oracle (pinned feature rows, gen_oracle_pins.py) — the pin here
    # stays as an extra regression tooth; repinned because feat is now
    # cast to DOUBLE before rounding (dtype-stable oracle compare) and
    # the corpus rotated in palette-PNG and interlaced-GIF rows (both
    # decoded for real since r5). Repinned again late-r5: the PNG slots
    # now also rotate 16-bit and Adam7-interlaced variants (newly
    # decodable), so the corpus composition changed once more. Final r5
    # repin: the PNG rotation covers the COMPLETE RFC 2083 static
    # profile — 1/2/4-bit gray and 2-bit palette (plain + Adam7)
    # rows joined the corpus when sub-8-bit decode landed. Repinned
    # once more when progressive-JPEG (SOF2) decode landed: the JPEG
    # slots now rotate two progressive variants (color 4:2:0 + gray)
    # into the corpus, changing its composition; and once more when
    # non-interleaved multi-scan baseline decode landed (one multiscan
    # 4:2:0 slot joined the rotation); and a final time when the
    # uncompressed surface completed (16-bit PPM slots; WAV slots now
    # rotate PCM 8/24/32 and IEEE-float32 next to PCM16).
    "media_features": "954b2db302c1f591b9e975d16cdc0287",
    # animated-GIF frame sampling (r5): deterministic clip corpus
    # through decode_gif_frames + hold-previous timeline sampling;
    # extra regression tooth next to the VALUES oracle
    "video_frames": "9940595088f2fd54e859b7e3f187574e",
}

# the GEMM driver row became set-verified against the exact SQL top-k
# in round 4 (ids-only projection); the FULL operator output — cos
# values included — stays pinned here via a direct operator call, since
# the BLAS values are the one part no oracle covers
GEMM_FULL_PIN = "0e67c559a009fb6f41c1d5f5dfae4bed"


def _result_hash(df):
    cols = sorted(df.columns)
    rows = df.toPandas()[cols]
    for c in cols:
        if rows[c].dtype == "float64":
            rows[c] = rows[c].round(6)
    lines = sorted(
        "|".join(str(v) for v in r) for r in rows.itertuples(index=False)
    )
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


@pytest.mark.parametrize("name", sorted(PINS))
def test_rows_only_query_pinned(spark, name):
    df = E.queries()[name](spark, SF_DIR)
    assert _result_hash(df) == PINS[name], (
        f"{name} result hash changed — semantics moved; re-pin only "
        "with an explanation"
    )


def test_gemm_full_output_pinned(spark):
    from pyspark.sql import functions as F

    from serimi_rdf_interlinking_spark.operators.similarity import (
        cosine_topk_gemm,
    )

    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = embs.filter(F.col("vec_id") < 8)
    df = cosine_topk_gemm(embs, queries, k=5)
    assert _result_hash(df) == GEMM_FULL_PIN, (
        "cosine_topk_gemm full output (incl. BLAS cos values) changed — "
        "semantics moved; re-pin only with an explanation"
    )

"""Multimodal-column queries: binary payload census, audio waveform
stats, video frame sampling, image decode+thumbnail — all through
Arrow-batched mapInPandas kernels (ext.multimodal).

Gate-output contract: the correctness harness canonicalizes result
rows with hashable scalars, so array-valued library outputs (byte
histogram, thumbnail) are serialized to deterministic '|'-joined
strings HERE, at the gate boundary — the library functions keep their
natural array types. Doubles are serialized as exact integer
micro-units (round(x*1e6)) so no float-to-string formatting can
diverge between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtube_etl_automated_pipeline_spark.ext.multimodal import (
    audio_waveform_stats,
    byte_stats,
    decode_image_features,
    frame_sample,
    png_encode_images,
    png_roundtrip_features,
    to_media_table,
)
from youtube_etl_automated_pipeline_spark.sources import load_table, load_wide, widen_scan


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return to_media_table(load_wide(spark, sf_dir, "documents"))


def multimodal_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return byte_stats(_media(spark, sf_dir)).withColumn(
        "hist", F.concat_ws("|", F.col("hist").cast("array<string>"))
    )


def multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return audio_waveform_stats(_media(spark, sf_dir))


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return frame_sample(_media(spark, sf_dir))


def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # REAL codec roundtrip: image payloads are re-encoded as genuine
    # 8-bit grayscale PNGs (all five RFC 2083 scanline filters), then
    # decoded by the pure-numpy PNG parser — no injected fake. The
    # oracle is unchanged because the PNG roundtrip is lossless over
    # the same w*w byte matrix.
    # thumb: array<double> of 6-dp block means -> '|'-joined integer
    # micro-pixels. round(x*1e6) recovers the exact integer the kernel
    # rounded to (x is the nearest double to k/1e6, so x*1e6 is within
    # an ulp of k), identically in Spark and DuckDB.
    # png_roundtrip_features = the same encode+decode kernels fused
    # into one Python stage (one Arrow round-trip of the PNG batch).
    return png_roundtrip_features(_media(spark, sf_dir)).withColumn(
        "thumb",
        F.concat_ws(
            "|",
            F.transform(
                "thumb", lambda x: F.round(x * F.lit(1e6)).cast("bigint").cast("string")
            ),
        ),
    )


QUERIES_MULTIMODAL = {
    "multimodal_byte_stats": multimodal_byte_stats,
    "multimodal_audio_stats": multimodal_audio_stats,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_image_features": multimodal_image_features,
}


def multimodal_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection over the video modality (see
    ext.multimodal.scene_cuts): integer frame-mean deltas, one row per
    video with cut census."""
    from youtube_etl_automated_pipeline_spark.ext.multimodal import scene_cuts

    return scene_cuts(_media(spark, sf_dir))


QUERIES_MULTIMODAL["multimodal_scene_cuts"] = multimodal_scene_cuts


PHASH_HAM_MAX = 16  # near-dup verify threshold over the 64-bit dHash


def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate detection over the image
    modality (round 5): the simhash-LSH dedup family applied to
    PIXELS — each image runs the REAL PNG roundtrip, block-mean
    resamples onto an 8x9 grid, and hashes the horizontal gradient
    into a 64-bit dHash (ext.multimodal.dhash_bands). Candidates are
    pairs agreeing on ANY 16-bit band (equi-join, never all-pairs);
    the verify step keeps pairs within PHASH_HAM_MAX Hamming bits.

    Scale shape: map-only encode+hash kernels, then the banded LSH
    join over 4 rows/image — identical posture to dedup_simhash
    (per-band fan-out bounded by band-bucket sizes, candidates ≪
    n²). Hamming verify is four 16-bit XOR popcounts — integers,
    engine-portable.
    """
    from youtube_etl_automated_pipeline_spark.ext.multimodal import dhash_bands
    from youtube_etl_automated_pipeline_spark.operators.cache_registry import (
        memo_persist,
    )

    # persist the dHash features: BOTH self-join sides consume them,
    # and unpersisted each side re-ran the full PNG encode+decode+hash
    # kernel over every image (r08, guide section 1.2); 5 ints/image
    feats = memo_persist(
        spark,
        ("phash_feats", sf_dir),
        lambda: dhash_bands(png_encode_images(_media(spark, sf_dir))),
    )
    bands = feats.select(
        "media_id",
        "b0",
        "b1",
        "b2",
        "b3",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias(
            "band_i", "band_v"
        ),
    )
    a = bands.select(
        F.col("media_id").alias("media_a"),
        F.col("b0").alias("b0_a"),
        F.col("b1").alias("b1_a"),
        F.col("b2").alias("b2_a"),
        F.col("b3").alias("b3_a"),
        "band_i",
        "band_v",
    )
    b = bands.select(
        F.col("media_id").alias("media_b"),
        F.col("b0").alias("b0_b"),
        F.col("b1").alias("b1_b"),
        F.col("b2").alias("b2_b"),
        F.col("b3").alias("b3_b"),
        "band_i",
        "band_v",
    )
    ham = F.expr(
        "CAST(bit_count(b0_a ^ b0_b) + bit_count(b1_a ^ b1_b)"
        " + bit_count(b2_a ^ b2_b) + bit_count(b3_a ^ b3_b) AS BIGINT)"
    )
    return (
        a.join(b, ["band_i", "band_v"])
        .filter(F.col("media_a") < F.col("media_b"))
        .select("media_a", "media_b", ham.alias("hamming_bits"))
        .filter(F.col("hamming_bits") <= PHASH_HAM_MAX)
        .distinct()
    )


QUERIES_MULTIMODAL["multimodal_phash_dedup"] = multimodal_phash_dedup

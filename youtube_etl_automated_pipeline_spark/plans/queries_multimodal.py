"""Multimodal-column queries: binary payload census, audio waveform
stats, video frame sampling, image decode+thumbnail — all through
Arrow-batched mapInPandas kernels (ext.multimodal)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from youtube_etl_automated_pipeline_spark.ext.multimodal import (
    audio_waveform_stats,
    byte_stats,
    decode_image_features,
    fake_gray_decoder,
    frame_sample,
    to_media_table,
)
from youtube_etl_automated_pipeline_spark.sources import load_table, widen_scan


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return to_media_table(widen_scan(load_table(spark, sf_dir, "documents")))


def multimodal_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return byte_stats(_media(spark, sf_dir))


def multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return audio_waveform_stats(_media(spark, sf_dir))


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return frame_sample(_media(spark, sf_dir))


def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_image_features(_media(spark, sf_dir), decoder=fake_gray_decoder)


QUERIES_MULTIMODAL = {
    "multimodal_byte_stats": multimodal_byte_stats,
    "multimodal_audio_stats": multimodal_audio_stats,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_image_features": multimodal_image_features,
}

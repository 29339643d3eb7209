"""Derived business-metric expressions (SURVEY.md section 2.9 F17-F23).

Reference: Python-pipeline/dataprocessing3.py:46-97 (row-wise loops) ->
pure column expressions with guarded division.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from youtube_etl_automated_pipeline_spark.functions.compat import hround


def minutes_to_hours(minutes: Column) -> Column:
    """F17: watch-time hours, 2dp (dataprocessing.py:149)."""
    return hround(minutes / 60.0, 2)


def net_subscribers(gained: Column, lost: Column) -> Column:
    """F19: gained - lost, null-safe (dataprocessing3.py:49-56)."""
    return F.coalesce(gained, F.lit(0)) - F.coalesce(lost, F.lit(0))


def engagement_pct(comments: Column, likes: Column, shares: Column, views: Column) -> Column:
    """F20: (c+l+s)/views*100 if views>0 else 0, 2dp (dataprocessing3.py:77-78)."""
    raw = (comments + likes + shares) / views * 100.0
    return hround(F.when(views > 0, raw).otherwise(F.lit(0.0)), 2)


def cpv(revenue: Column, views: Column) -> Column:
    """F21: revenue/views if views>0 else 0, 6dp (dataprocessing3.py:81-82)."""
    return hround(F.when(views > 0, revenue / views).otherwise(F.lit(0.0)), 6)


def rpm(revenue: Column, views: Column) -> Column:
    """F22: cpv*1000 from the UNrounded cpv, 2dp (dataprocessing3.py:85)."""
    return hround(F.when(views > 0, revenue / views).otherwise(F.lit(0.0)) * 1000.0, 2)

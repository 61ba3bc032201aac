"""Streaming layer: change-stream semantics, bounded previews, watermarks,
running-query registry (SURVEY §2.9, §3.2)."""

from dbt_decodable_spark.streaming.changelog import fold_last_image

__all__ = ["fold_last_image"]

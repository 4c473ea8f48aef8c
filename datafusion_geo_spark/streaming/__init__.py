"""Structured-Streaming operators.

The reference has zero streaming surface (SURVEY.md §2.9); this module is
the Spark-native extension of its one aggregate (st_extent) to unbounded
data: windowed incremental extent with watermarked late-data handling.
"""

from .extent import streaming_extent

__all__ = ["streaming_extent"]

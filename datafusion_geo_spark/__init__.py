"""datafusion_geo_spark — a PySpark-native spatial + LLM-data analytics
engine with the query surface of systemxlabs/datafusion-geo (reference at
/root/reference, read-only; SURVEY.md is the blueprint).

Architecture (SURVEY.md §1.3, §7.0):
  * geometry = standard (E)WKB bytes in ordinary BinaryType columns,
  * operators = vectorized pandas UDFs over a dependency-free Python
    geometry core (no shapely/GEOS in this environment),
  * aggregation/joins/scans = Spark SQL built-ins (the reference likewise
    inherits them from DataFusion),
  * scale paths = bbox-prefilter columns + broadcast spatial joins
    (datafusion_geo_spark.operators).
"""

from . import functions
from .functions import register_all

__version__ = "0.1.0"
__all__ = ["functions", "register_all", "__version__"]

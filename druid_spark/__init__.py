"""druid_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of apache/druid.

The engine accepts Druid-style native JSON queries (reference:
/root/reference/processing/src/main/java/org/apache/druid/query/Query.java:62-72)
and compiles them to declarative PySpark DataFrame programs, letting
Catalyst/Tungsten pick physical strategies (pushdown, broadcast, AQE).

Public surface:
    from druid_spark import DruidSparkEngine
    engine = DruidSparkEngine(spark, data_dir="/root/testdata/sf0.01")
    df = engine.query({"queryType": "timeseries", ...})
"""

from druid_spark.engine import DruidSparkEngine
from druid_spark.session import get_spark

__all__ = ["DruidSparkEngine", "get_spark"]
__version__ = "0.1.0"

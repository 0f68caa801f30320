"""weather_tools_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of google/weather-tools (reference studied read-only at
/root/reference) on idiomatic PySpark: DataFrame/SQL plans optimized
by Catalyst, Arrow-vectorized Pandas UDFs only where built-ins cannot
express the semantics, and Structured Streaming for streams.

Layout
------
- ``session``    : tuned SparkSession factory
- ``catalog``    : table loading / view registration for the test data
- ``queries``    : the query registry exposed through ``__spark_entry__``
- ``functions``  : scalar function library (geo, time parsing, text)
- ``operators``  : relational + LLM-data-pipeline operators (dedup,
                   similarity search, text analysis, top-k, as-of join)
- ``plans``      : SQL surface (xql parity) — pre-pass rewrites + spark.sql
- ``pipeline``   : weather-dl/sp parity (partition fan-out, manifest, splitter)
- ``sources``    : ingest plumbing (hypercube→rows, zarr chunk scan, multimodal)
- ``streaming``  : Structured Streaming operators (windows, watermarks)
"""

__version__ = "0.1.0"

"""Custom operators the reference lacks, built Spark-first.

Each operator is a composition of built-in DataFrame ops wherever the
semantics allow (as-of join, dedup, top-k); Arrow-batched pandas UDFs
appear only where built-ins cannot express the computation (none so far
in this package — even MinHash/SimHash are JVM-side expressions).
"""

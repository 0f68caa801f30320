"""Scalar function library: geo, time parsing, text metrics.

Everything here is either a pure Column expression (JVM-side, codegen'd)
or an Arrow-batched pandas UDF — never a row-at-a-time Python UDF.
"""

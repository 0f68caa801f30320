"""SQL surface (xql parity): pre-pass rewrites + spark.sql execution."""

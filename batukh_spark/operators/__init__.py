"""Training-data-pipeline operators over document/embedding tables.

All hot-path compute uses built-in pyspark.sql.functions (JVM-side,
whole-stage codegen) — no Python UDFs.  Hashing is md5-based everywhere so
the DuckDB oracle in __spark_entry__.oracle_sql() reproduces results
bit-for-bit (both engines emit identical lowercase-hex md5).
"""

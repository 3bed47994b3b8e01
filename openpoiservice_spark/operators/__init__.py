"""Training-data pipeline operators (deduplication, text analysis,
similarity search) — first-class extensions beyond the reference's operator
inventory, designed for 100 TB corpora (build-brief requirement).

Every operator here is authored twice on purpose:
  * a Spark DataFrame implementation (this package), and
  * an ANSI-SQL twin in __spark_entry__.oracle_sql() that DuckDB executes
    against the same parquet — the hash functions (md5) and arithmetic are
    chosen to be bit-identical across both engines so the driver's
    value-hash correctness gate holds.
"""

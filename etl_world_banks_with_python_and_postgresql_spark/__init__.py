"""PySpark-native analytics engine with the query/data-processing surface of
apirlonext/ETL-World-Banks-with-Python-and-PostgreSQL.

Brand-new Spark-first implementation (DataFrame/SQL/Catalyst); the reference
(read-only at /root/reference) defines WHAT is computed -- an SCD-style
merge/upsert ETL with mutation accounting and audit logging -- not HOW.

Layout:
    session     SparkSession factory tuned for local[N] and cluster parity
    schemas     explicit StructType registry (no inference anywhere)
    operators   merge/SCD upsert, enrichment join, dedup, similarity, text
    sources     HTML table source, parquet catalog, JDBC (gated)
    functions   cross-engine deterministic hash/expr helpers
    plans       verified query registry (Spark callable + DuckDB oracle SQL)
    streaming   Structured Streaming equivalents (foreachBatch merge)
"""

__version__ = "0.1.0"

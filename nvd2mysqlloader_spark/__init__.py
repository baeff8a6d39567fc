"""nvd2mysqlloader_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of menkhus/nvd2mysqlloader.

The reference (nvd2mysqlloader.py, 577 LoC) is a single-threaded
NVD-CVE-feed → MySQL ETL pipeline.  This package re-expresses its
relational semantics (SURVEY.md §2) Spark-first — declarative DataFrame /
SQL plans optimized by Catalyst, columnar parquet storage, batched sinks
— and extends the surface with the LLM-data-pipeline operators (dedup,
similarity search, multimodal columns, text analysis) required by the
north star, every one designed for 100 TB / 1000-executor scale.

Layout:
    session      SparkSession factory tuned for local[N] & cluster parity
    schemas      explicit StructTypes (NVD 1.1 feed, silver nvd, state)
    sources/     parquet/tpch loaders, CVE feed reader, .meta parser, JDBC
    operators/   flatten, upsert (MERGE emulation), incremental gate,
                 top-1-per-key, dedup family, similarity search
    functions/   column-expression helpers (text, vectors, cpe)
    plans/       the query surface: registry of (spark_fn, oracle_sql)
    streaming/   Structured Streaming ingest + windowed aggregates
    multimodal/  binary-column plumbing (decode stubs, real Spark shape)
"""

__version__ = "0.1.0"

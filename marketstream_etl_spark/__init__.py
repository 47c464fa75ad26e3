"""marketstream_etl_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the MarketStream-ETL reference
(https://github.com/NikhilTalatule/MarketStream-ETL), re-expressed Spark-first.

Design: declare logical plans with the DataFrame/SQL API and let
Catalyst/Tungsten pick physical strategies.  No RDDs, no row-at-a-time
Python UDFs in hot paths; Pandas UDFs only where built-in operators cannot
express the semantics (similarity search, multimodal decode).

Layout
------
- ``session``    : SparkSession factory with scale-sane defaults.
- ``schemas``    : canonical Trade / Tick / Indicator schemas (reference
                   ``src/model/Trade.hpp:16-38``).
- ``sources``    : CSV/parquet/JDBC/generator sources & sinks (SURVEY §2.1).
- ``operators``  : validation, indicators, dedup, similarity, text,
                   multimodal, as-of join (SURVEY §2.2-2.7 + north star).
- ``plans``      : end-to-end query plans — trades view over the driver
                   testdata, README analytics queries, TPC-H-ish queries.
- ``streaming``  : Structured Streaming tick pipeline (SURVEY §2.8).
"""

__version__ = "0.1.0"

"""etl_knlp_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference ETL pipeline (waterwheel31/etl-kNLP,
surveyed in SURVEY.md), built Spark-first: declarative DataFrame/SQL
plans optimized by Catalyst, extended with LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) designed
for 100 TB scale.

Layout:
- ``session``    — SparkSession builder with scale-oriented defaults.
- ``catalog``    — table registry over the driver's parquet test tables.
- ``registry``   — query/oracle registration used by ``__spark_entry__``.
- ``operators/`` — relational, quality, parse, dedup, similarity, text.
- ``functions/`` — scalar/vector column-expression helpers.
- ``plans/``     — multi-operator pipelines (flagship dimension build).
- ``sources/``   — readers/writers (delimited text, JSON-lines, parquet).
- ``streaming/`` — event-time windowing + Structured Streaming wiring.
"""

__version__ = "0.1.0"

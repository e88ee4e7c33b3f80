"""PySpark-native analytics engine with the capabilities of the reference
repo ``VahidKianiCoding/database-per-keyword-analysis`` (a pandas batch
pipeline for keyword-based industry analysis of Telegram posts), rebuilt
Spark-first as a reusable library and extended with LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis).

Design stance (SURVEY.md §7.1): pure functions ``DataFrame -> DataFrame``
per operator, explicit schemas, lazy composition, configuration as data.
Everything stays in built-in ``pyspark.sql.functions`` (Catalyst-visible,
whole-stage codegen) unless semantics genuinely require a Pandas UDF.
"""

__version__ = "0.1.0"

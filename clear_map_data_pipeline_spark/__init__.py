"""clear_map_data_pipeline_spark — a PySpark-native analytics engine.

Re-expresses every operator of the reference pipeline
(``mrmichaelf/clear_map_data_pipeline``, ``il_analysis_git.py``) as lazy,
Catalyst-optimizable DataFrame lineages, plus the large-scale
training-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal columns) the reference never had.

Layout
------
- ``session``    : SparkSession builder tuned for local[n] test runs.
- ``sources``    : readers (CSV/parquet/JSON/GeoJSON ingest) and sinks.
- ``functions``  : scalar expression helpers (censored decode, clamps, …).
- ``operators``  : composable DataFrame -> DataFrame operators — windows,
                   rebase, stats, reconcile, dedup, similarity, text,
                   spatial, asof, multimodal.
- ``plans``      : end-to-end pipeline compositions (the clearmap DAG).
- ``streaming``  : Structured Streaming variants of the daily ingest.
- ``registry``   : the query/oracle registry consumed by __spark_entry__.
"""

__version__ = "0.1.0"

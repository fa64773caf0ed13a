"""dystonse_gtfs_importer_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query / data-processing
capabilities of the reference `dystonse/dystonse-gtfs-importer`
(Rust, MySQL-backed GTFS delay-statistics pipeline) as idiomatic
Spark DataFrame programs, plus the large-scale training-data
operators (dedup, similarity search, text analysis, multimodal
plumbing) that a 100 TB pipeline needs.

Layout
------
- ``session``    SparkSession factory + conf helpers
- ``curves``     pure-NumPy probability-curve library (the analytic
                 core; replaces the external ``dystonse-curves`` crate)
- ``functions``  column-expression libraries (GTFS time, time slots,
                 route sections, geo, text analysis) — all JVM-side
                 Column expressions unless genuinely impossible
- ``operators``  reusable DataFrame→DataFrame operators (as-of join,
                 forward fill, latest-wins dedup, stop pairs, rollup
                 ladder, dedup/similarity at scale)
- ``sources``    readers (GTFS static CSV, GTFS-RT protobuf, driver
                 testdata parquet)
- ``plans``      end-to-end pipelines (import / analyse / predict /
                 monitor query layer)
- ``streaming``  Structured Streaming wrappers + stateful ops
- ``rendering``  S19 graphic sinks (SVG curve pages, PNG visual
                 schedules, heat-strip data URLs) + distributed
                 ``applyInPandas`` page renderers
"""

__version__ = "0.1.0"

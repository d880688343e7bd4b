"""map_reduce_indexing_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference system
GingerBear/map-reduce-indexing (a C MapReduce inverted-indexing engine,
see /root/reference and SURVEY.md), built Spark-first:

- DataFrame/SQL everywhere; Catalyst + Tungsten + AQE do the physical planning.
- All persisted artifacts are Parquet (the reference's 26 letter-bucketed
  index files become a Hive-partitioned Parquet table, pruned automatically).
- The reference's map/shuffle/reduce topology (helper_map.c:166,
  helper_reduce.c:153) is a single declarative groupBy chain here.
- Extensions beyond the reference: relational breadth over the TPC-H-ish
  fixtures, Structured Streaming over `events`, and LLM-data-pipeline
  operators (dedup, similarity search, text analysis, multimodal columns).
"""

__version__ = "0.1.0"

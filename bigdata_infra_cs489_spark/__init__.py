"""PySpark-native analytics engine with the query/data-processing
capabilities of szmasood/BigData_Infra_CS489 (UWaterloo CS489 big-data
infrastructure course repo), rebuilt Spark-first.

The reference implements every workload as hand-compiled Hadoop-MapReduce /
Spark-1.5-RDD physical plans; this engine re-expresses each capability as a
declarative DataFrame/SQL plan so Catalyst/Tungsten/AQE pick the physical
strategy (broadcast vs shuffle join, partial aggregation, codegen), which is
what survives a 1000-executor / 100 TB scale-up.

Layout:
  session         SparkSession factory (AQE, shuffle-partition, Arrow tuning)
  sources.tables  parquet table registry over the driver fixtures
  functions.text  reusable column expressions (tokenizer, pricing exprs, ...)
  operators.*     one module per capability family (relational, text,
                  index, graph, ml, dedup, similarity, textstats, multimodal)
  streaming.*     Structured Streaming variants of the events aggregations
  plans.registry  assembles the driver contract: queries() / oracle_sql()
"""

__version__ = "0.1.0"

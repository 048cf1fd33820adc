from redpanda_spark.sources.tables import load_table, load_all, topic_view

__all__ = ["load_table", "load_all", "topic_view"]

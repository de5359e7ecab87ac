from bruin_spark.sources.ingest import ingest, jdbc_options, read_source

__all__ = ["ingest", "jdbc_options", "read_source"]

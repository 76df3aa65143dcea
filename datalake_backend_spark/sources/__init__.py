"""Sources & sinks: bronze JSON ingest, parquet table catalog, JSON-shape sinks."""

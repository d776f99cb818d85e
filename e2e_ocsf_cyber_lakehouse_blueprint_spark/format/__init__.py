"""Iceberg-style table format: Parquet data files + Avro manifests + JSON snapshots."""

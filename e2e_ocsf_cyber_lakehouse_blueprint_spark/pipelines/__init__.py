"""Medallion pipelines: bronze/silver/gold audit-log conformance (reference parity)."""

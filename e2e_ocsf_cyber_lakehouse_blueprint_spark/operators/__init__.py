"""Maintenance jobs: compaction, clustering, snapshot expiry + GC, MERGE INTO."""

"""Incremental micro-batch processing: checkpointed sources, exactly-once appends."""

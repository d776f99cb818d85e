"""Sources: deterministic synthetic transcripts + batch JSON audit-log ingestion."""

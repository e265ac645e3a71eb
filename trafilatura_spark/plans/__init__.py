"""Job-level orchestration: lineage manifest, resumable runs."""

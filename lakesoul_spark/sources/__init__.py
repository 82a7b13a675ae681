"""External ingestion sources (SURVEY.md §2.1 rows: Kafka ingestion,
CDC ingestion)."""

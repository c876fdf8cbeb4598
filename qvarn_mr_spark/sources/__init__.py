"""Source readers: parquet tables + CDC feeds (SURVEY §2.1)."""

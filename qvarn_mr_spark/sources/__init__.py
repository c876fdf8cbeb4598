"""Source readers & mutable stores: parquet tables, CRUD resource store with
change-notification emission, CDC feeds (SURVEY §2.1)."""

from qvarn_mr_spark.sources.resource_store import ResourceStore, RevisionConflict

__all__ = ["ResourceStore", "RevisionConflict"]

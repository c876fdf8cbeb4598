"""Physical-plan inspection and assertions (the 100 TB plan contract)."""

from qvarn_mr_spark.plans.inspect import (
    ScanInfo,
    assert_broadcast_join,
    assert_columns_pruned,
    assert_filter_pushed,
    assert_max_shuffles,
    assert_no_broadcast_hint,
    assert_no_shuffle_join,
    assert_partial_aggregation,
    assert_top_k,
    count_exchanges,
    explain_str,
    scan_for,
    scans,
)

__all__ = [
    "ScanInfo", "assert_broadcast_join", "assert_columns_pruned",
    "assert_filter_pushed", "assert_max_shuffles", "assert_no_broadcast_hint",
    "assert_no_shuffle_join",
    "assert_partial_aggregation", "assert_top_k", "count_exchanges",
    "explain_str", "scan_for", "scans",
]

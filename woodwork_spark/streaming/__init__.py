from woodwork_spark.streaming.events import (
    read_event_stream,
    hourly_rollup_stream,
    domain_rate_stream,
    sessionize_stream,
    dedup_event_stream,
    enrich_stream_with_scd,
    late_data_counts_stream,
    windowed_distinct_stream,
    score_stream_against_bounds,
    match_stream_against_corpus,
)

__all__ = [
    "read_event_stream",
    "hourly_rollup_stream",
    "domain_rate_stream",
    "sessionize_stream",
    "dedup_event_stream",
    "enrich_stream_with_scd",
    "late_data_counts_stream",
    "windowed_distinct_stream",
    "score_stream_against_bounds",
    "match_stream_against_corpus",
]

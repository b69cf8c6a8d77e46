"""Structured Streaming surface: sources (file replay, rate), watermarked
window aggregations, and the custom stateful operators the reference has
but Spark lacks (keep-last dedup / ChangelogNormalize, retracting Top-N,
count windows) built on applyInPandasWithState.

The reference's checkpointing/exactly-once machinery (CheckpointCoordinator,
state backends) is NOT rebuilt — Structured Streaming checkpoints and the
state store provide it (SURVEY.md §2.9 'engine-provided')."""

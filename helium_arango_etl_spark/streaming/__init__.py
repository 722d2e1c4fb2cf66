"""Incremental follower semantics via Structured Streaming (SURVEY.md §2.L)."""

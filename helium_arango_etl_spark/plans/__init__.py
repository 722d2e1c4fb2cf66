"""End-to-end DAGs mirroring the reference's ETL entry points (SURVEY.md §3):
inventory sync, payments backfill, witness import — each one DataFrame plan
ending in an idempotent keyed sink."""

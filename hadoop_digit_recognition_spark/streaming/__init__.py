"""Structured Streaming operators (SURVEY.md §2.5 'streaming' row).

The reference is pure batch — iteration is resubmitted MapReduce jobs
(/root/reference/driver.java:90). This package provides the streaming
surface the task sheet requires: watermarked event-time windows, session
windows, and a custom stateful operator, each with a batch-parity or
DuckDB-oracle check (the unified DataFrame API makes the same windowing
code run in both modes).
"""

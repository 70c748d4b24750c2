"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2.8: no watermarks/windows/
state anywhere), and the north_rule asks for resumable BATCH; these
modules expose the same pipeline through readStream/writeStream so a
continuously-arriving crawl can run the identical kernel with
exactly-once parquet sinks, plus the event-time operators
(watermarked tumbling windows, custom stateful sessionization) a
training-data pipeline needs."""

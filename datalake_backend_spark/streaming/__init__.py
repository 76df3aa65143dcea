"""Structured Streaming surface.

The reference has no streaming (SURVEY §2.10): its pipeline is
request-triggered batch, one Spark session per uploaded file. This
module maps that contract onto Structured Streaming so the same engine
serves both: a file-source ingest with ``trigger(availableNow=True)``
reproduces per-file triggering with checkpointed exactly-once sinks, and
watermarked window/session aggregations cover the live-stream case the
reference's `events`-style feeds imply.
"""

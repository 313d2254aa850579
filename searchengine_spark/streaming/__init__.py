"""Structured Streaming surfaces.

The reference is batch-only (SURVEY §2.9) and so is the north_rule;
these modules exist because the rebuilt engine's ingestion story at
100 TB is continuous: new WARC-shaped files land forever. Streaming
here is therefore *incremental ingestion of the same batch semantics*
— file-source micro-batches driving the identical tokenize kernel —
plus a watermarked windowed aggregation for the events stream.
"""

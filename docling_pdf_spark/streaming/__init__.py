"""Structured Streaming surface (SURVEY.md §2b streaming row).

The reference is strictly request/response batch-of-one (docling-pdf
main.py:86-151) — no watermarks or windows exist there. The north rule
is batch-at-10^12 with resume, so streaming is a capability extension:
the SAME stateless extraction transform runs under readStream
unchanged, and event tables get watermarked tumbling-window aggregates.
"""

from docling_pdf_spark.streaming.jobs import (  # noqa: F401
    extract_stream,
    extract_stream_exactly_once,
    windowed_event_counts,
)
from docling_pdf_spark.streaming.stateful import (  # noqa: F401
    sessionize_stream,
    streaming_dedup,
)

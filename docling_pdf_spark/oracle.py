"""Serial reference oracle (SURVEY.md §5.2).

docling / PyMuPDF are not installed in this sandbox and the reference
cannot run, so the executable stand-in for "the reference worker's
extracted output" is this one-process, one-doc-at-a-time runner over
the SAME semantics module the Spark pipeline uses. The north-rule
invariant becomes: distributed Spark output == this serial output,
span-by-span (kind, text, media_ref, order) per doc_id.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from docling_pdf_spark.core.extract import OUTPUT_COLUMNS, extract_document


def run_oracle(documents: pa.Table | pd.DataFrame) -> pd.DataFrame:
    """Extract every document serially; returns EXTRACTED_SCHEMA rows
    ordered by doc_id (deterministic)."""
    if isinstance(documents, pa.Table):
        documents = documents.to_pandas()
    rows = [
        extract_document(doc_id, spans)
        for doc_id, spans in zip(documents["doc_id"], documents["spans"])
    ]
    out = pd.DataFrame(rows, columns=OUTPUT_COLUMNS)
    return out.sort_values("doc_id", ignore_index=True)

"""Source-format adapters for the pages table.

Parquet is the native format (`pipelines.extraction.read_pages` —
column-pruned scans). This package adds JSONL, CSV and WARC
ingestion of the SAME logical table so corpora delivered as
newline-JSON, CSV exports or raw Common-Crawl-style crawl shards run
through every pipeline unchanged: each adapter returns a Dataset
with exactly ``schema.PAGES_SCHEMA``.
"""

from .ingest import (  # noqa: F401
    pages_from_csv,
    pages_from_jsonl,
    pages_to_jsonl,
)
from .warc import (  # noqa: F401
    extracted_to_wet,
    pages_from_warc,
    pages_to_warc,
    text_from_wet,
    write_warc_file,
)

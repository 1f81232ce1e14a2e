"""ocr_pipeline_ray — a Ray-Data-native main-content extraction engine.

Brand-new engine (NOT a port) with the query / data-processing
capabilities of ulb-sachsen-anhalt/ocr-pipeline, recast as streaming
``ray.data.Dataset`` pipelines over a Parquet table of
Common-Crawl-style pages ``(url, warc_ts, html, text, lang)``:

* ``functions/`` — pure-Python row-local semantics (the parity oracle):
  ordered char/regex replacement with statistics, dehyphenation,
  QA char sanitization, quality scoring, HTML main-content extraction.
* ``stages/``   — Ray Data batch operators (``map_batches`` callables,
  actor-pool classes for the stateful parse / score stages).
* ``pipelines/`` — assembled end-to-end pipelines (declarative config →
  ordered step chain, mirroring the reference's ``step_01..NN`` INI).
* ``state/``    — per-partition lineage records + resume manifest (the
  Ray-native equivalent of the reference's directory marker files,
  ``/root/reference/ocr_pipeline.py:160-199``).

See SURVEY.md for the full mapping from the reference to this engine.
"""

__version__ = "0.1.0"

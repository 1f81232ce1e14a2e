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


def silence_ray_cosmetic_warnings() -> None:
    """Filter two noisy-but-cosmetic Ray Data warnings.

    Both fire when a pipeline legitimately emits empty blocks (a
    filtered-out batch, an empty aggregation partial): the streaming
    executor's "produced a RefBundle with a different schema" (the new
    schema is the EMPTY one) and the schema-dedup "Failed to hash the
    schemas". Called by entry points (bench, CLI) — never on import,
    so library users keep Ray's default logging.
    """
    import logging

    class _Drop(logging.Filter):
        _needles = (
            "with a different schema than the previous one",
            "Failed to hash the schemas",
        )

        def filter(self, record: logging.LogRecord) -> bool:
            msg = record.getMessage()
            return not any(n in msg for n in self._needles)

    for name in (
        "ray.data._internal.execution.streaming_executor_state",
        "ray.data._internal.arrow_ops.transform_pyarrow",
    ):
        logging.getLogger(name).addFilter(_Drop())

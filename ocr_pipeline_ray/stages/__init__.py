"""Ray Data batch operators wrapping the row-local semantic core.

Conventions (engine-wide):

* Every stage is a callable over ``batch_format="pyarrow"`` batches —
  zero-copy from the object store; stateless stages are plain
  functions (closure-captured config, broadcast-once by Ray),
  stateful stages are classes used as actor pools
  (``map_batches(Cls, concurrency=N)``) with setup in ``__init__``.
* Per-row failures are isolated into the ``error`` column
  (StepException semantics, ``/root/reference/ocr_pipeline.py:426-441``);
  only infrastructure failures raise (OSError semantics → Ray retry).
"""

"""Row-local pure-Python functions — the engine's semantic core.

Everything here is deterministic, single-process, and independent of
Ray; the Ray stages in ``ocr_pipeline_ray.stages`` wrap these over
Arrow batches. These functions double as the parity oracle used by the
test suite.
"""

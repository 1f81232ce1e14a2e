"""Shared mutable registries the family modules populate on import."""
from __future__ import annotations

from typing import Callable, Dict

QUERIES: Dict[str, Callable] = {}
ORACLE_SQL: Dict[str, str] = {}

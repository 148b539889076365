"""LLM-data-pipeline operators: dedup, similarity, text analysis (north star)."""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}

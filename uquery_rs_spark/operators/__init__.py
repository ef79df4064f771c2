"""Spark-scale operators beyond the reference's delegated SQL surface.

The reference implements zero relational operators (SURVEY.md §0); its
dialect admits a few forms Spark lacks natively (ASOF JOIN — SURVEY.md
§2.B.3) and the driver's north star adds LLM-data-pipeline operators
(dedup / similarity / text analysis / multimodal; BASELINE.json). Each
operator here is a composition of built-in DataFrame ops where semantics
allow, Arrow-batched Pandas UDFs where they don't.
"""

from .asof import asof_join  # noqa: F401

"""Conversion-pipeline queries (SURVEY.md M4): format classification,
upload validation, and document→markdown conversion exercised over
deterministic corpora synthesized from the `documents` table."""

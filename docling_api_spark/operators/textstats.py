"""Text-analysis operators over `documents` (SURVEY.md M3): token stats,
quality scoring, language breakdown, tf-idf, fingerprinting."""

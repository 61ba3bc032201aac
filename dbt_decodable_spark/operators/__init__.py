"""LLM-data-pipeline operators (SURVEY §2.12 [X] extensions): deduplication,
similarity search, text analysis, multimodal columns. All built on DataFrame
ops / JVM expressions; Pandas UDFs only where built-ins genuinely can't
express the semantics (multimodal decode plumbing)."""

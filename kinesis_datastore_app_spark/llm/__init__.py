"""LLM-training-data pipeline operators (SURVEY.md §2.B10, north star):
deduplication, similarity search, text analysis, multimodal columns —
each designed as composition of built-in DataFrame ops first, Arrow UDFs
only where built-ins can't express the semantics."""

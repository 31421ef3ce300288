"""Structured Streaming operators (SURVEY.md §2.B8) and the simulated
Kinesis-semantics source (§4.3.1)."""

"""Streaming surface: the reference's actor mailbox re-expressed as a
Structured Streaming mutation-log fold (SURVEY.md §2.6)."""

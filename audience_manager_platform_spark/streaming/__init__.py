"""Structured Streaming equivalents of the reference's scheduled batch
refresh loop (SURVEY.md §2.9/§7.2 step 9)."""

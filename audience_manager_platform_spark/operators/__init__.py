"""Relational/dataflow operators: segment set-algebra, analytics
aggregations, join/window surfaces, dedup, similarity, text analysis,
multimodal plumbing."""

"""Relational operators: geometry assembly joins, AOI clip, theme
fan-out, tile assignment, kNN dedup, text dedup, similarity search."""

"""Operators: attribute processing, consensus dedup, matching, clustering,
dedup family, similarity search."""

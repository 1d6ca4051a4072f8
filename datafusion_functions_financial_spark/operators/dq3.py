"""Placeholder — populated later this round."""

QUERIES: dict = {}

"""Relational + spatial + training-data operators."""

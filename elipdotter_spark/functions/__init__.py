"""Vectorized Arrow/pandas UDFs and column-expression helpers."""

"""Reusable column-level function library (rule tables, normalizers)."""

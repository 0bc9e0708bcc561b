"""Serving runtimes that consume ONLY exported artifacts (no model code)."""

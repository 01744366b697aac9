"""Operator library — pure ``DataFrame -> DataFrame`` functions.

Each operator mirrors an entry in SURVEY.md §2's inventory (reference
file:line cited in the docstrings) or extends the analytics surface
beyond the reference (joins family, windows, dedup, similarity, text).
"""

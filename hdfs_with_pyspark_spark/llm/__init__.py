"""LLM-training-data pipeline operators (driver mandate, SURVEY.md §0):
deduplication, similarity search, text analysis, multimodal column
plumbing. These are first-class engine components alongside the
reference-parity marts.
"""

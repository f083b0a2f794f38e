"""Registered queries for the LLM data-pipeline operators.

Filled in as the llm/ modules land (dedup, similarity, text, multimodal).
"""

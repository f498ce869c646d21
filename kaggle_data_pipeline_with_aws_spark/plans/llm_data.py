"""LLM-training-data pipeline operators (dedup / similarity / text analysis).

Filled in incrementally; see operators/dedup.py, operators/similarity.py,
operators/text.py.
"""

"""The reference notebook's 8 analytical queries (SURVEY §3 EP4), rephrased
onto the synthetic star schema per FIXTURES.md §5.

Filled in incrementally.
"""

"""Scale-out data-pipeline operators: dedup, similarity search, text analysis,
multimodal column plumbing, as-of joins.

These extend the reference's transform surface (SURVEY.md §2.B) with the
operators a 100 TB training-data pipeline needs. Every operator is
DataFrame-declarative (built-in functions, broadcast-aware joins); pandas UDFs
appear only on the genuinely non-relational paths (LSH signatures over float
vectors, multimodal decode), always Arrow-batched.
"""

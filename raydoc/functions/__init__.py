"""General large-scale data operations beyond the reference's own operators:
relational queries (oracle-checked), dedup family, similarity search, text
analysis, windowed/sessionized event aggregates, multimodal stubs.

All built Ray-Data-first: column-pruned reads, vectorized pyarrow/numpy
batch kernels, broadcast or bucketed joins, partial aggregation before any
shuffle.
"""

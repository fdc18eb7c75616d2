"""Training-data pipeline operators (first-class, beyond the reference's
surface): deduplication, similarity search, text analysis, multimodal
plumbing. All built on DataFrame/Column primitives — no per-row Python; the
only Python-adjacent paths are Arrow-batched pandas UDFs in multimodal.py.
"""

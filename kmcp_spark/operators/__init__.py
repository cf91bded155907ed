"""Pipeline operators (the kmcp subcommand analogs) plus the
training-data-pipeline operator families (dedup / similarity / text)
that run over the driver's generic `documents` / `embeddings` tables.
"""

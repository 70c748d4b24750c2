"""Reusable DataFrame-level operators (the engine's public surface):
segmentation evaluation, region repair, dedup, similarity search —
each a composition of native Spark ops (kernels only where SURVEY.md
§2 maps an operator to applyInPandas)."""

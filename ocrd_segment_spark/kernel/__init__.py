"""Pure-Python / numpy per-document kernels.

These modules are the frozen computational core shared verbatim by the
single-process oracle (``ocrd_segment_spark.oracle``) and the Spark
Arrow-batch UDFs (``ocrd_segment_spark.pipeline``) — importing the same
code in both is what makes byte-identical output achievable (SURVEY.md
§7.2). No Spark imports are allowed in this package.
"""

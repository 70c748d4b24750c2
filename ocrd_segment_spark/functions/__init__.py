"""Column-level function library (the G-series scalar kernel surface
re-expressed as reusable pyspark Column expressions — JVM-side,
whole-stage-codegen; no Python in any of these)."""

"""Column-expression function library (JVM-side, codegen-friendly).

Everything here returns pyspark Columns built from builtins — no Python UDFs
in the hot path (SURVEY.md §2.11: the reference's native-first rule, kept).
"""

"""Execution-engine-agnostic extraction semantics (no Spark imports).

Shared by the serial oracle (`docling_pdf_spark.oracle`) and the Spark
pipeline (`docling_pdf_spark.pipeline`) so distributed output equals
serial output by construction (SURVEY.md §7 design stance).
"""

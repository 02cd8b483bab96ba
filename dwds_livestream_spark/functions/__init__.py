"""Columnar function surface (SURVEY.md §2.8): everything stays inside
pyspark.sql.functions / whole-stage codegen; no Python UDFs on the hot
path."""

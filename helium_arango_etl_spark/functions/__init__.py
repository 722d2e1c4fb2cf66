"""Column-expression library. Everything here returns pyspark Columns built
from JVM built-ins — no row-at-a-time Python UDFs anywhere (SURVEY.md §2 M4).
"""

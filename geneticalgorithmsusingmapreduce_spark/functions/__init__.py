"""Column-expression function library (the engine's scalar/array kernel).

Everything here is pure SQL arithmetic — no Python UDFs — so it runs
JVM-side under whole-stage codegen and has an exact DuckDB twin for the
correctness oracle.
"""

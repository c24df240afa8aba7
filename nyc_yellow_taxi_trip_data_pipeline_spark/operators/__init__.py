"""Relational / dataflow operators built on DataFrame primitives."""

"""Spark DataFrame operators: extraction stages + corpus analytics."""

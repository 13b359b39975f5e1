"""Reusable native Column expressions (JVM-side, codegen-friendly)."""

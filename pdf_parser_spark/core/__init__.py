"""Pure-Python document logic — no Spark imports.

Everything here is deterministic, picklable, and safe to call from inside
Arrow-batched pandas UDFs. Semantics are byte-identical to the reference
extractor (avinash21107/PDF_Parser); each function cites the reference
file:line it matches.
"""

"""Pure-Python BEL core: grammar, data model, canonicalization, compiler.

These modules are dependency-free (stdlib only) so they can be shipped to
Spark executors and run inside Arrow-batched ``mapInPandas`` stages.
"""

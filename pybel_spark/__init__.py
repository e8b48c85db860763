"""pybel_spark — a from-scratch PySpark-native BEL knowledge-graph construction engine.

Pipeline: Common-Crawl-style web-page documents → statement detection →
vectorized BEL parsing (Arrow-batched, no per-row Python UDF calls) →
namespace grounding (broadcast dims) → node canonicalization (deterministic
md5 ids) → nodes/edges/triples/warnings tables.

Semantics match the reference BEL compiler (PyBEL, surveyed in /root/repo/SURVEY.md);
the implementation is new and Spark-first.
"""

__version__ = '0.1.0'

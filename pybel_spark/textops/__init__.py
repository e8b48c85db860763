"""Training-data pipeline operations over document/embedding tables.

Large-scale corpus curation primitives, all deterministic and expressed as
DataFrame algebra so they survive a 100 TB input:

- tokenize:  token counting (whitespace + BPE-ish regex), n-gram shingles
- dedup:     exact (hash groupBy), n-gram Jaccard (inverted-index join),
             MinHash + LSH banding, SimHash
- quality:   language-ID heuristic, quality scoring, document fingerprints
- similarity: brute-force cosine top-k and LSH-bucketed ANN over embeddings
- decontaminate: benchmark n-gram collision scan (GPT-3 appendix-C style)
- multimodal: binary-column decode/feature plumbing (decoders stubbed — no
             image/audio libs in this environment; Spark-side schema,
             batching, and partitioning are real)
"""
from . import (  # noqa: F401
    decontaminate, dedup, dsir, multimodal, packing, quality, search,
    semdedup, similarity, snapshots, tokenize,
)

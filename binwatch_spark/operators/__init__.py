"""Reusable DataFrame→DataFrame operators.

Modules:
- ``cdc``        — the reference's dataflow stages (filter/decode/project/
                   explode/render/frontier) as composable column expressions
- ``sharding``   — FNV-1a64 shard assignment (Go hash/fnv parity)
- ``text``       — tokenization, language-ID, quality scoring, fingerprints
- ``dedup``      — exact / MinHash-LSH / SimHash / n-gram-Jaccard dedup
- ``similarity`` — cosine kNN (brute force + LSH-bucketed)
- ``multimodal`` — binary-column plumbing for image/audio payloads
"""

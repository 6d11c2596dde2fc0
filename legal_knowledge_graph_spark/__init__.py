"""legal_knowledge_graph_spark — a PySpark-native knowledge-graph
construction engine.

A from-scratch re-expression of the capabilities of the reference system
(sinjy1203/legal_knowledge_graph, a LangGraph+Neo4j two-phase KG RAG
pipeline) as a library of pure ``DataFrame -> DataFrame`` stage functions:

- text extraction (intro/body split — byte-identical per-url invariant)
- batched mention detection + relation/triple extraction (pandas-UDF
  inference stages, Arrow-batched; no per-row Python)
- entity linking: MinHash-LSH blocking -> pair scoring -> connected
  components (large-star/small-star) -> canonical entity IDs
- hierarchical chunk tree + bottom-up summarization
- graph materialization into bucketed ``nodes``/``edges`` tables with
  deterministic content-derived IDs (idempotent re-runs)
- checkpoint/resume with per-partition lineage metrics
- the reference's five query tools as pure DataFrame functions
- training-data ops: dedup (exact/MinHash/SimHash/Jaccard/embedding),
  ANN similarity search, text quality/language-ID/token stats,
  multimodal binary-column plumbing

Everything is stock Catalyst + Arrow: no RDDs, no row-at-a-time Python
UDFs, no custom optimizer rules.
"""

__version__ = "0.1.0"

"""LLM-data-pipeline operators: deduplication, similarity search, text
analysis, multimodal columns. All pure-DataFrame compositions (no driver-side
loops, no collect) designed for 100 TB corpora — see each module's scale
notes.
"""

from fossa_spark.llm import dedup, multimodal, similarity, text

__all__ = ["dedup", "multimodal", "similarity", "text"]

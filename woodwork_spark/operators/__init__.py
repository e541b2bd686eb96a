from woodwork_spark.operators import dedup, similarity, text, multimodal

__all__ = ["dedup", "similarity", "text", "multimodal"]

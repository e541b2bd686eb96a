from woodwork_spark.operators import dedup, similarity, text, multimodal, web

__all__ = ["dedup", "similarity", "text", "multimodal", "web"]

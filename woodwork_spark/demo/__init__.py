from woodwork_spark.demo.retail import load_retail

__all__ = ["load_retail"]

from privacy_cdc_lakehouse_spark.operators import dedup, similarity, text

__all__ = ["dedup", "similarity", "text"]

from privacy_cdc_lakehouse_spark.functions.scalars import (
    clean_numeric_string,
    epoch_millis_to_ts,
    pseudonym,
)

__all__ = ["clean_numeric_string", "epoch_millis_to_ts", "pseudonym"]

from privacy_cdc_lakehouse_spark.cdc.silver import (
    latest_state,
    parse_cdc_envelope,
    silver_from_bronze,
)
from privacy_cdc_lakehouse_spark.cdc.privacy import pseudonymize_orders

__all__ = [
    "latest_state",
    "parse_cdc_envelope",
    "silver_from_bronze",
    "pseudonymize_orders",
]

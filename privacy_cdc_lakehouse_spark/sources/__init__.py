from privacy_cdc_lakehouse_spark.sources.debezium import (
    CDC_ENVELOPE_SCHEMA,
    ORACLE_EVENTS_CTE,
    cdc_events,
)

__all__ = ["CDC_ENVELOPE_SCHEMA", "ORACLE_EVENTS_CTE", "cdc_events"]

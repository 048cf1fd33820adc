from redpanda_spark.registry.store import (
    CompatibilityError,
    SchemaRegistry,
    SchemaVersion,
)

__all__ = ["SchemaRegistry", "SchemaVersion", "CompatibilityError"]

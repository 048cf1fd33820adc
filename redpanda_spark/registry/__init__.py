from redpanda_spark.registry.store import (
    CompatibilityError,
    ModeError,
    SchemaRegistry,
    SchemaVersion,
)

__all__ = ["SchemaRegistry", "SchemaVersion", "CompatibilityError", "ModeError"]

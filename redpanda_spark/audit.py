"""Audit log — security/management events as records on an audit topic.

Reference: `src/v/security/audit/audit_log_manager.h` — API-activity,
authentication and authorization events (OCSF-schema,
`security/audit/schemas/types.h`) are enqueued with in-memory
DEDUPLICATION (identical events within the drain window collapse into
one record with a count — the boost::multi_index aggregation at
`audit_log_manager.h:88-145`), then batched onto an internal audit
topic (`audit_log_manager.cc create_internal_topic`). Exclusion filters
keep configured principals/APIs out of the log.

Spark-first: events buffer driver-side (they are per-ADMIN-CALL, not
per-record — tiny), drain as one produce of JSON values onto
``_redpanda_audit_log``, and the analysis surface is a typed DataFrame
(from_json over the topic — the part the reference can't give you
without an external pipeline). The audit trail inherits the engine's
crash story: events are durable exactly when their produce's manifest
commit lands.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AUDIT_TOPIC = "_redpanda_audit_log"

AUDIT_SCHEMA = (
    "class string, api string, principal string, resource string,"
    " outcome string, reason string, count long, first_ts double, last_ts double"
)


@dataclass
class AuditLogManager:
    engine: object
    topic: str = AUDIT_TOPIC
    partitions: int = 1
    excluded_principals: set[str] = field(default_factory=set)
    excluded_apis: set[str] = field(default_factory=set)
    # key -> event dict; insertion-ordered, deduped (the reference's
    # multi-index container with a count per identical event)
    _buffer: dict[tuple, dict] = field(default_factory=dict)

    def _enqueue(self, cls: str, api: str, principal: str, resource: str,
                 outcome: str, reason: str = "") -> bool:
        if principal in self.excluded_principals or api in self.excluded_apis:
            return False
        key = (cls, api, principal, resource, outcome, reason)
        now = time.time()
        ev = self._buffer.get(key)
        if ev is None:
            self._buffer[key] = {
                "class": cls, "api": api, "principal": principal,
                "resource": resource, "outcome": outcome, "reason": reason,
                "count": 1, "first_ts": now, "last_ts": now,
            }
        else:
            ev["count"] += 1
            ev["last_ts"] = now
        return True

    # -- the three event classes the reference emits ----------------------

    def enqueue_api_event(self, api: str, principal: str, resource: str,
                          outcome: str = "success", reason: str = "") -> bool:
        """Management/API activity (class api_activity)."""
        return self._enqueue("api_activity", api, principal, resource, outcome, reason)

    def enqueue_authn_event(self, principal: str, outcome: str,
                            mechanism: str = "SASL-SCRAM") -> bool:
        """Authentication attempt (class authentication)."""
        return self._enqueue("authentication", mechanism, principal, "", outcome)

    def enqueue_authz_event(self, principal: str, operation: str,
                            resource: str, allowed: bool) -> bool:
        """Authorization decision (the enqueue_authz_audit_event path)."""
        return self._enqueue(
            "authorization", operation, principal, resource,
            "allowed" if allowed else "denied",
        )

    # -- drain / query -----------------------------------------------------

    def pending(self) -> int:
        return len(self._buffer)

    def drain(self) -> int:
        """Flush buffered events to the audit topic as one produce (the
        reference's audit_sink batch). Creates the topic lazily. Returns
        the number of (deduplicated) event records written."""
        if not self._buffer:
            return 0
        if self.topic not in self.engine.list_topics():
            from redpanda_spark.engine import TopicConfig

            self.engine.create_topic(
                self.topic, TopicConfig(partitions=self.partitions)
            )
        events = list(self._buffer.values())
        self._buffer = {}
        rows = [
            (ev["api"].encode(), json.dumps(ev, sort_keys=True).encode())
            for ev in events
        ]
        batch = self.engine.spark.createDataFrame(rows, "key binary, value binary")
        self.engine.produce(self.topic, batch)
        return len(events)

    def events(self) -> DataFrame:
        """The audit trail, typed — json-decoded off the topic."""
        log = self.engine.log(self.topic)
        return log.select(
            "partition",
            "offset",
            F.from_json(F.col("value").cast("string"), AUDIT_SCHEMA).alias("ev"),
        ).select("partition", "offset", "ev.*")


def audited_authorize(acls, audit: AuditLogManager):
    """Wrap an AclStore's authorize() so every decision lands in the
    audit buffer (the authz enqueue hook at `audit_log_manager.h:88`)."""

    def authorize(principal, operation, resource_type, resource_name, host=None):
        allowed = acls.authorize(
            principal, operation, resource_type, resource_name, host
        )
        audit.enqueue_authz_event(
            principal, operation, f"{resource_type}:{resource_name}", allowed
        )
        return allowed

    return authorize

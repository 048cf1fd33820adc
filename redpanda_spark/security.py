"""ACL store + authorizer — API-parity shim for the security surface.

Reference: `src/v/security/acl_store.h` (bindings of pattern → entry),
`src/v/security/acl.h` (resource types, operations, permission types,
pattern types), evaluated per request in the Kafka handlers
(DescribeAcls/CreateAcls/DeleteAcls, keys 29/30/31). The reference's 19k
LoC also covers SASL/SCRAM/GSSAPI authentication, which is out of
analytics scope (SURVEY.md §2.1 rows 32-35): here principals are trusted
strings and the value is the *authorization algebra*, which matches
Kafka's documented semantics:

  - DENY bindings take precedence over ALLOW,
  - resource-pattern matching is LITERAL (exact or the '*' wildcard name)
    or PREFIXED,
  - the ALL operation implies every operation; absent any matching ALLOW
    binding the result is deny-by-default.

State is a tiny metadata table (like `_topics`): kept driver-side, JSON
snapshot persistence, exposed as a DataFrame for introspection queries.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass

RESOURCE_TYPES = ("topic", "group", "cluster", "transactional_id")
OPERATIONS = (
    "read",
    "write",
    "create",
    "delete",
    "alter",
    "describe",
    "describe_configs",
    "alter_configs",
    "idempotent_write",
    "all",
)
PATTERN_TYPES = ("literal", "prefixed")
PERMISSIONS = ("allow", "deny")

# Kafka's documented operation implications, applied on the ALLOW side
# only (reference `security/acl.h` acl_implied_ops; upstream
# AclAuthorizer): holding READ/WRITE/DELETE/ALTER implies DESCRIBE, and
# ALTER_CONFIGS implies DESCRIBE_CONFIGS. DENY bindings never imply —
# a deny must name the operation (or ALL) to block it.
_IMPLIED_BY = {
    "describe": ("describe", "read", "write", "delete", "alter"),
    "describe_configs": ("describe_configs", "alter_configs"),
}


@dataclass(frozen=True)
class AclBinding:
    principal: str          # e.g. "User:alice" or "*"
    resource_type: str      # topic|group|cluster|transactional_id
    resource_name: str      # name, or "*" (literal wildcard)
    pattern_type: str       # literal|prefixed
    operation: str          # read|write|...|all
    permission: str         # allow|deny
    host: str = "*"

    def __post_init__(self):
        if self.resource_type not in RESOURCE_TYPES:
            raise ValueError(f"bad resource_type {self.resource_type}")
        if self.operation not in OPERATIONS:
            raise ValueError(f"bad operation {self.operation}")
        if self.pattern_type not in PATTERN_TYPES:
            raise ValueError(f"bad pattern_type {self.pattern_type}")
        if self.permission not in PERMISSIONS:
            raise ValueError(f"bad permission {self.permission}")

    def matches(
        self,
        principal: str,
        resource_type: str,
        resource_name: str,
        host: str | None = None,
    ) -> bool:
        if self.resource_type != resource_type:
            return False
        if self.principal not in ("*", principal):
            return False
        # host scoping: a "*" binding matches any client host; a named
        # binding matches only that host. A request without a host (the
        # embedded/API callers) matches only "*" bindings.
        if self.host != "*" and (host is None or self.host != host):
            return False
        if self.pattern_type == "literal":
            return self.resource_name in ("*", resource_name)
        return resource_name.startswith(self.resource_name)

    def matches_resource(self, resource_type: str, resource_name: str) -> bool:
        """Pattern-only match (any principal/host/op) — the
        allow.everyone.if.no.acl.found existence probe."""
        if self.resource_type != resource_type:
            return False
        if self.pattern_type == "literal":
            return self.resource_name in ("*", resource_name)
        return resource_name.startswith(self.resource_name)

    def covers_op(self, operation: str) -> bool:
        return self.operation == "all" or self.operation == operation

    def covers_op_implied(self, operation: str) -> bool:
        """ALLOW-side coverage including Kafka's implied operations."""
        return self.operation == "all" or self.operation in _IMPLIED_BY.get(
            operation, (operation,)
        )


class AclStore:
    """CreateAcls/DeleteAcls/DescribeAcls + authorize().

    ``superusers`` (super.users): principals that bypass authorization
    entirely. ``allow_everyone_if_no_acl`` (allow.everyone.if.no.acl.found):
    when NO binding of any kind exists for a resource, requests pass —
    matching Kafka's documented opt-in open-by-default mode."""

    def __init__(
        self,
        path: str | None = None,
        superusers: set[str] | None = None,
        allow_everyone_if_no_acl: bool = False,
        fsio=None,
    ):
        self._bindings: list[AclBinding] = []
        self._path = path
        # optional filesystem abstraction (pass engine._fsio to persist
        # under a URI / object-store root); default = plain local paths
        if fsio is None:
            from redpanda_spark.fsio import LocalFS

            fsio = LocalFS()
        self._fsio = fsio
        self.superusers = set(superusers or ())
        self.allow_everyone_if_no_acl = allow_everyone_if_no_acl
        if path and self._fsio.exists(path):
            self._bindings = [
                AclBinding(**b) for b in json.loads(self._fsio.read_text(path))
            ]

    def _save(self):
        if self._path:
            self._fsio.write_text_atomic(
                self._path, json.dumps([asdict(b) for b in self._bindings])
            )

    def create(self, binding: AclBinding) -> None:
        if binding not in self._bindings:
            self._bindings.append(binding)
            self._save()

    def delete(self, **filters) -> list[AclBinding]:
        """Delete bindings matching all given attribute filters; returns
        the removed bindings (DeleteAcls response shape)."""
        removed = [
            b
            for b in self._bindings
            if all(getattr(b, k) == v for k, v in filters.items())
        ]
        self._bindings = [b for b in self._bindings if b not in removed]
        if removed:
            self._save()
        return removed

    def describe(self, **filters) -> list[AclBinding]:
        return [
            b
            for b in self._bindings
            if all(getattr(b, k) == v for k, v in filters.items())
        ]

    def authorize(
        self,
        principal: str,
        operation: str,
        resource_type: str,
        resource_name: str,
        host: str | None = None,
    ) -> bool:
        """Kafka authorizer semantics end-to-end: super-user bypass →
        DENY (literal op or ALL) → ALLOW (with implied operations:
        READ/WRITE/DELETE/ALTER grant DESCRIBE, ALTER_CONFIGS grants
        DESCRIBE_CONFIGS) → allow.everyone fallback when the resource has
        no bindings at all → default deny."""
        if principal in self.superusers:
            return True
        matched = [
            b
            for b in self._bindings
            if b.matches(principal, resource_type, resource_name, host)
        ]
        if any(b.permission == "deny" and b.covers_op(operation) for b in matched):
            return False
        if any(
            b.permission == "allow" and b.covers_op_implied(operation)
            for b in matched
        ):
            return True
        if self.allow_everyone_if_no_acl and not any(
            b.matches_resource(resource_type, resource_name)
            for b in self._bindings
        ):
            return True
        return False

    def to_df(self, spark):
        """The `_acls` table for introspection queries."""
        schema = (
            "principal string, resource_type string, resource_name string, "
            "pattern_type string, operation string, permission string, host string"
        )
        rows = [
            (
                b.principal,
                b.resource_type,
                b.resource_name,
                b.pattern_type,
                b.operation,
                b.permission,
                b.host,
            )
            for b in self._bindings
        ]
        return spark.createDataFrame(rows, schema)


class SaslSession:
    """SASL handshake/authenticate allow-all shim (API parity with
    `handlers/sasl_handshake.h` / `handlers/sasl_authenticate.h`).

    Real authN (SCRAM exchange, GSSAPI, OAUTHBEARER token validation) is
    out of the analytics engine's scope per SURVEY §2 rows 32-35 — the
    reference's 19k-LoC security tree dissolves into: negotiate a
    mechanism, accept the identity, and hand the resulting principal to
    the REAL authorizer (`AclStore.authorize`), which implements the full
    Kafka ACL algebra. The session enforces the protocol ORDER the
    reference enforces: authenticate before handshake is an
    ILLEGAL_SASL_STATE error, and the mechanism must be one offered in
    the handshake."""

    MECHANISMS = ("PLAIN", "SCRAM-SHA-256", "SCRAM-SHA-512")

    def __init__(self, acl_store: AclStore | None = None):
        self.acls = acl_store
        self.mechanism: str | None = None
        self.principal: str | None = None

    def handshake(self, mechanism: str) -> dict:
        if self.principal is not None:
            # re-handshake on an authenticated session is out-of-order:
            # the reference's connection FSM accepts exactly one
            # handshake→authenticate sequence (sasl_server.h state
            # machine) — never a mechanism switch with the old identity
            return {
                "error": "ILLEGAL_SASL_STATE",
                "mechanisms": list(self.MECHANISMS),
            }
        if mechanism not in self.MECHANISMS:
            # reference returns the supported list on mismatch
            return {
                "error": "UNSUPPORTED_SASL_MECHANISM",
                "mechanisms": list(self.MECHANISMS),
            }
        self.mechanism = mechanism
        return {"error": None, "mechanisms": list(self.MECHANISMS)}

    def authenticate(self, username: str, password: str = "") -> dict:
        if self.mechanism is None:
            return {"error": "ILLEGAL_SASL_STATE", "principal": None}
        if self.principal is not None:
            # re-authenticate on a live session is out-of-order like
            # re-handshake: the FSM accepts exactly one
            # handshake→authenticate sequence — an identity SWITCH on an
            # established session would bypass every per-principal audit
            # line written so far (KIP-368 re-authentication negotiates a
            # fresh session; it never changes the principal in place)
            return {"error": "ILLEGAL_SASL_STATE", "principal": self.principal}
        # allow-all: any credential is accepted; identity becomes the
        # Kafka-convention principal consumed by the authorizer
        self.principal = f"User:{username}"
        return {"error": None, "principal": self.principal}

    def authorize(
        self,
        operation: str,
        resource_type: str,
        resource_name: str,
        host: str | None = None,
    ) -> bool:
        """Post-authN authorization through the real ACL algebra; an
        unauthenticated session is denied everything (no anonymous
        fallthrough past the shim)."""
        if self.principal is None:
            return False
        if self.acls is None:
            return True
        return self.acls.authorize(
            self.principal, operation, resource_type, resource_name, host
        )


# --------------------------------------------------------------------------
# Authorization audit — the ACL algebra as a data-plane operator
# --------------------------------------------------------------------------


def authorize_audit(
    requests,
    bindings,
    superusers: tuple[str, ...] = (),
    allow_everyone_if_no_acl: bool = False,
):
    """Evaluate Kafka's authorization algebra (`AclStore.authorize`
    above — super-user bypass, DENY precedence, ALLOW with implied
    operations, allow-everyone fallback, default deny) over a REQUEST
    LOG as one Spark plan: per request row, the decision the authorizer
    would have made. The fleet-audit re-expression of the per-RPC
    driver check — "which principals would lose access if this binding
    landed" over a day of traffic is one query, not a loop.

    ``requests``: DataFrame with principal, operation, resource_type,
    resource_name (+ optional host, + any carried columns).
    ``bindings``: DataFrame with AclBinding's columns. Returns the
    request columns + an ``allowed`` boolean.

    Scale shape: the bindings table is tiny and BROADCASTS; pattern
    matching happens map-side in the join; one shuffle aggregates the
    per-binding match flags back to per-request. Parity with
    `AclStore.authorize` is pinned by a property test."""
    from pyspark.sql import functions as F

    b = bindings.select(
        *[F.col(c).alias("b_" + c) for c in bindings.columns]
    )
    req = requests.withColumn("_rid", F.monotonically_increasing_id())
    host_expr = (
        F.col("host") if "host" in requests.columns else F.lit(None).cast("string")
    )
    # join on the PATTERN match only (resource_type + name/prefix);
    # principal/host/operation coverage become projected flags, so the
    # same join also feeds the allow-everyone "any binding matches this
    # resource at all" probe (`matches_resource`)
    pattern = (F.col("b_resource_type") == F.col("resource_type")) & (
        (
            (F.col("b_pattern_type") == "literal")
            & (
                (F.col("b_resource_name") == "*")
                | (F.col("b_resource_name") == F.col("resource_name"))
            )
        )
        | (
            (F.col("b_pattern_type") == "prefixed")
            & F.col("resource_name").startswith(F.col("b_resource_name"))
        )
    )
    j = req.join(F.broadcast(b), pattern, "left")
    ph = (
        (F.col("b_principal") == "*") | (F.col("b_principal") == F.col("principal"))
    ) & (
        (F.col("b_host") == "*")
        | (host_expr.isNotNull() & (F.col("b_host") == host_expr))
    )
    covers = (F.col("b_operation") == "all") | (
        F.col("b_operation") == F.col("operation")
    )
    implied = covers
    for op, srcs in _IMPLIED_BY.items():
        implied = implied | (
            (F.col("operation") == op) & F.col("b_operation").isin(*srcs)
        )
    deny = ph & (F.col("b_permission") == "deny") & covers
    allow = ph & (F.col("b_permission") == "allow") & implied
    carried = list(requests.columns)
    agg = j.groupBy("_rid").agg(
        *[F.first(c).alias(c) for c in carried],
        F.max(F.coalesce(deny, F.lit(False)).cast("int")).alias("_deny"),
        F.max(F.coalesce(allow, F.lit(False)).cast("int")).alias("_allow"),
        F.max(F.col("b_permission").isNotNull().cast("int")).alias("_hit"),
    )
    allowed = (
        F.col("principal").isin(*superusers) if superusers else F.lit(False)
    ) | (
        (F.col("_deny") == 0)
        & (
            (F.col("_allow") == 1)
            | (F.lit(allow_everyone_if_no_acl) & (F.col("_hit") == 0))
        )
    )
    return agg.withColumn("allowed", allowed).select(*carried, "allowed")

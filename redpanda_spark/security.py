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
import os
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
    ):
        self._bindings: list[AclBinding] = []
        self._path = path
        self.superusers = set(superusers or ())
        self.allow_everyone_if_no_acl = allow_everyone_if_no_acl
        if path and os.path.exists(path):
            with open(path) as f:
                self._bindings = [AclBinding(**b) for b in json.load(f)]

    def _save(self):
        if self._path:
            tmp = self._path + ".tmp"
            with open(tmp, "w") as f:
                json.dump([asdict(b) for b in self._bindings], f)
            os.replace(tmp, self._path)

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

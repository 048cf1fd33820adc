"""REST facade — pandaproxy analog (SURVEY.md §2.8), stdlib-only WSGI app.

Reference endpoints (`src/v/pandaproxy/api/api-doc/rest.json:19-470`,
`schema_registry.json:394-1068`):

  GET  /topics                                  list topics
  GET  /topics/{t}                              topic metadata
  POST /topics/{t}                              produce records
  GET  /topics/{t}/partitions/{p}/records?offset=&count=   fetch
  GET  /subjects                                registry subjects
  POST /subjects/{s}/versions                   register schema
  GET  /subjects/{s}/versions                   list versions
  GET  /subjects/{s}/versions/{v}               get schema (or 'latest')
  GET  /schemas/ids/{id}                        schema by global id
  PUT  /config                                  set global compatibility
  GET  /config                                  get global compatibility

Serve with ``wsgiref.simple_server.make_server('', port, app)`` or test by
calling ``app.handle(method, path, body)`` directly. Records travel as
JSON with base64 key/value (the proxy's binary embedding).
"""

from __future__ import annotations

import base64
import json
import re

from pyspark.sql import Row

from redpanda_spark.admin import AdminClient
from redpanda_spark.engine import TopicConfig, TopicEngine
from redpanda_spark.registry import CompatibilityError, SchemaRegistry


def _b64e(b):
    return base64.b64encode(bytes(b)).decode() if b is not None else None


def _b64d(s):
    return base64.b64decode(s) if s is not None else None


class RestApp:
    def __init__(self, engine: TopicEngine, registry: SchemaRegistry | None = None):
        self.engine = engine
        self.admin = AdminClient(engine)
        self.registry = registry or SchemaRegistry()
        self.routes = [
            ("GET", r"^/topics$", self._list_topics),
            ("GET", r"^/topics/([^/]+)$", self._topic_meta),
            ("POST", r"^/topics/([^/]+)$", self._produce),
            ("GET", r"^/topics/([^/]+)/partitions/(\d+)/records$", self._fetch),
            ("GET", r"^/subjects$", self._subjects),
            ("POST", r"^/subjects/([^/]+)/versions$", self._register),
            ("GET", r"^/subjects/([^/]+)/versions$", self._versions),
            ("GET", r"^/subjects/([^/]+)/versions/([^/]+)$", self._get_version),
            (
                "GET",
                r"^/subjects/([^/]+)/versions/(\d+)/referencedby$",
                self._referenced_by,
            ),
            ("GET", r"^/schemas/ids/(\d+)$", self._schema_by_id),
            ("GET", r"^/config$", self._get_config),
            ("PUT", r"^/config$", self._put_config),
        ]

    # -- dispatch ---------------------------------------------------------

    def handle(self, method: str, path: str, body: dict | None = None, query: dict | None = None):
        """(status, payload) — the testable core."""
        for m, pat, fn in self.routes:
            if m != method:
                continue
            match = re.match(pat, path)
            if match:
                try:
                    return fn(*match.groups(), body=body or {}, query=query or {})
                except KeyError as e:
                    return 404, {"error_code": 404, "message": str(e)}
                except CompatibilityError as e:
                    return 409, {"error_code": 409, "message": str(e)}
                except ValueError as e:
                    return 422, {"error_code": 422, "message": str(e)}
        return 404, {"error_code": 404, "message": f"no route {method} {path}"}

    def __call__(self, environ, start_response):
        """WSGI entry point."""
        from urllib.parse import parse_qsl

        method = environ["REQUEST_METHOD"]
        path = environ["PATH_INFO"]
        query = dict(parse_qsl(environ.get("QUERY_STRING", "")))
        body = None
        try:
            length = int(environ.get("CONTENT_LENGTH") or 0)
            if length:
                body = json.loads(environ["wsgi.input"].read(length))
        except (ValueError, json.JSONDecodeError):
            body = None
        status, payload = self.handle(method, path, body, query)
        data = json.dumps(payload).encode()
        start_response(
            f"{status} {'OK' if status < 400 else 'ERR'}",
            [("Content-Type", "application/vnd.kafka.v2+json"),
             ("Content-Length", str(len(data)))],
        )
        return [data]

    # -- topic handlers ---------------------------------------------------

    def _list_topics(self, body, query):
        return 200, sorted(self.engine.list_topics())

    def _topic_meta(self, topic, body, query):
        meta = self.admin.metadata([topic])["topics"][topic]
        if "error" in meta:
            return 404, {"error_code": 40401, "message": meta["error"]}
        cfg = self.engine.list_topics()[topic]
        return 200, {
            "name": topic,
            "partitions": cfg.partitions,
            "configs": self.admin.describe_configs(topic),
            "offsets": meta["partitions"],
        }

    def _produce(self, topic, body, query):
        recs = body.get("records", [])
        if not recs:
            return 422, {"error_code": 42201, "message": "no records"}
        rows = [
            Row(key=_b64d(r.get("key")), value=_b64d(r.get("value")))
            for r in recs
        ]
        df = self.engine.spark.createDataFrame(rows, "key binary, value binary")
        if any("partition" in r for r in recs):
            parts = [int(r.get("partition", 0)) for r in recs]
            rows = [
                Row(key=_b64d(r.get("key")), value=_b64d(r.get("value")), partition=p)
                for r, p in zip(recs, parts)
            ]
            df = self.engine.spark.createDataFrame(
                rows, "key binary, value binary, partition int"
            )
        bases = self.engine.produce(topic, df)
        return 200, {
            "offsets": [
                {"partition": p, "base_offset": b} for p, b in sorted(bases.items())
            ]
        }

    def _fetch(self, topic, partition, body, query):
        offset = int(query.get("offset", 0))
        count = int(query.get("count", 100))
        out = self.engine.fetch(
            topic, int(partition), offset=offset, max_records=count
        ).collect()
        return 200, [
            {
                "topic": topic,
                "partition": r["partition"],
                "offset": r["offset"],
                "key": _b64e(r["key"]),
                "value": _b64e(r["value"]),
            }
            for r in out
        ]

    # -- registry handlers ------------------------------------------------

    def _subjects(self, body, query):
        return 200, self.registry.subjects()

    def _register(self, subject, body, query):
        sid = self.registry.register(
            subject,
            body["schema"],
            body.get("schemaType", "AVRO"),
            references=body.get("references"),
        )
        return 200, {"id": sid}

    def _versions(self, subject, body, query):
        vs = self.registry.versions(subject)
        if not vs:
            return 404, {"error_code": 40401, "message": f"subject {subject}"}
        return 200, vs

    def _get_version(self, subject, version, body, query):
        v = (
            self.registry.get_latest(subject)
            if version == "latest"
            else self.registry.get_version(subject, int(version))
        )
        out = {
            "subject": v.subject,
            "version": v.version,
            "id": v.id,
            "schemaType": v.type,
            "schema": v.schema,
        }
        if v.references:
            out["references"] = v.references
        return 200, out

    def _referenced_by(self, subject, version, body, query):
        return 200, self.registry.referenced_by(subject, int(version))

    def _schema_by_id(self, sid, body, query):
        v = self.registry.get_by_id(int(sid))
        out = {"schema": v.schema, "schemaType": v.type}
        if v.references:
            out["references"] = v.references
        return 200, out

    def _get_config(self, body, query):
        return 200, {"compatibilityLevel": self.registry.get_compatibility()}

    def _put_config(self, body, query):
        self.registry.set_compatibility(body["compatibility"])
        return 200, {"compatibility": body["compatibility"]}

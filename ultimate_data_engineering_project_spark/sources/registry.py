"""Confluent Schema Registry client — the lookup half of the CDC
decode path (S13).

The reference runs a Schema Registry service next to Kafka (reference
docker-compose.yaml:74-97) and every Confluent frame embeds the 4-byte
schema id `strip_confluent_envelope` extracts; this module turns those
ids into the writer-schema JSON the pure-Python codec needs
(`decode_avro_records` for a single version,
`decode_confluent_evolving` for a topic's whole history).

Design:
  * DRIVER-side config fetch, never per-row: resolve the id set once,
    ship the resulting ``{id: json}`` dict into the plan (the codec's
    "writer schema is CONFIG" contract).  At 100 TB the registry sees
    a handful of requests per stream start, not per record.
  * zero dependencies: stdlib ``urllib`` with an injectable ``opener``
    so the HTTP contract (paths, auth header, error mapping, response
    parsing) is fully testable without a live registry — the same
    live-vs-contract boundary the Kafka/JDBC builders use (README
    "What is live-exercised vs contract-tested here").
  * fail loudly: HTTP errors carry the registry's error body; a
    response without a ``schema`` field is a protocol error, not an
    empty schema.
"""

from __future__ import annotations

import base64
import json
from typing import Callable


def _default_opener(url: str, headers: dict[str, str], timeout: float):
    from urllib.request import Request, urlopen

    return urlopen(Request(url, headers=headers), timeout=timeout)  # noqa: S310


def registry_headers(
    *, auth: tuple[str, str] | None = None
) -> dict[str, str]:
    """Standard request headers; ``auth=(key, secret)`` adds the HTTP
    basic header Confluent Cloud registries require (credentials never
    land in the URL, mirroring `readers.jdbc_url`)."""
    headers = {"Accept": "application/vnd.schemaregistry.v1+json"}
    if auth is not None:
        token = base64.b64encode(f"{auth[0]}:{auth[1]}".encode()).decode()
        headers["Authorization"] = f"Basic {token}"
    return headers


def fetch_schema(
    base_url: str,
    schema_id: int,
    *,
    auth: tuple[str, str] | None = None,
    timeout: float = 10.0,
    opener: Callable | None = None,
) -> str:
    """GET /schemas/ids/{id} -> the writer schema JSON string.

    ``opener`` injects the transport (tests pass a fake returning
    canned bytes); default is stdlib urllib.  Raises ``ValueError`` on
    a malformed response and ``ConnectionError`` on any transport/HTTP
    failure, carrying the URL, the status code, and the registry's
    error body.
    """
    url = f"{base_url.rstrip('/')}/schemas/ids/{int(schema_id)}"
    opener = opener or _default_opener
    try:
        with opener(url, registry_headers(auth=auth), timeout) as resp:
            body = resp.read()
    except Exception as ex:  # noqa: BLE001 - annotate, then re-raise
        # NOT `raise type(ex)(...)`: urllib's HTTPError (the default
        # opener's primary failure mode — any non-2xx) needs 5
        # constructor args, so re-raising its type with one string
        # would itself TypeError and mask the real failure.  Raise one
        # stable type carrying the status and the registry error body.
        code = getattr(ex, "code", None)
        detail = f" (HTTP {code})" if code is not None else ""
        if hasattr(ex, "read"):  # HTTPError response body
            try:
                err_body = ex.read()[:200]
            except Exception:  # noqa: BLE001
                err_body = b""
            if err_body:
                detail += f" body={err_body!r}"
        raise ConnectionError(
            f"schema registry fetch failed for {url}{detail}: {ex}"
        ) from ex
    try:
        doc = json.loads(body)
    except json.JSONDecodeError as ex:
        raise ValueError(
            f"schema registry returned non-JSON for {url}: {body[:200]!r}"
        ) from ex
    if not isinstance(doc, dict) or "schema" not in doc:
        raise ValueError(
            f"schema registry response for {url} lacks a 'schema' field: "
            f"{doc!r}"
        )
    return doc["schema"]


def writer_schemas_for(
    base_url: str,
    schema_ids: list[int] | set[int],
    *,
    auth: tuple[str, str] | None = None,
    timeout: float = 10.0,
    opener: Callable | None = None,
) -> dict[int, str]:
    """Resolve a topic's observed schema-id set to the ``{id: json}``
    dict `decode_confluent_evolving` / `run_cdc_stream(avro_schema=...)`
    consume.  The id set comes from the stream itself (e.g.
    ``stripped.select('schema_id').distinct()`` over a bounded probe
    batch) or from the subject's version list — either way a
    config-sized driver-side collect, never per-row state."""
    return {
        int(sid): fetch_schema(
            base_url, sid, auth=auth, timeout=timeout, opener=opener
        )
        for sid in sorted({int(s) for s in schema_ids})
    }

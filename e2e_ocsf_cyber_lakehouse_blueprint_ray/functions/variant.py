"""Silver typed variant extraction (operator M2, ×3 sources).

One compiled ``VariantExtractor`` per source carrying the exact field lists
of the reference silver tables — github 17 fields
(/root/reference/transformations/pipelines/github/audit_logs/
silver_github_audit_logs.py:40-66), slack 18 fields
(silver_slack_audit_logs.py:40-67), atlassian 25 fields incl. array indexing
(silver_atlassian_audit_logs.py:40-78). Output layout matches the reference:
bronze metadata columns FIRST, typed fields, raw ``data`` column LAST
(silver_github_audit_logs.py:29-70).
"""

from __future__ import annotations

import pyarrow as pa

from .. import expr
from ..schema import BRONZE_META_COLS

SILVER_FIELDS: dict[str, list[tuple[str, str, str]]] = {
    # silver_github_audit_logs.py:40-66
    "github": [
        ("event_id", "$.id", "STRING"),
        ("action", "$.action", "STRING"),
        ("created_at_ms", "$.created_at", "BIGINT"),
        ("actor", "$.actor", "STRING"),
        ("user", "$.user", "STRING"),
        ("organization", "$.org", "STRING"),
        ("repository", "$.repo", "STRING"),
        ("actor_country_code", "$.actor_location.country_code", "STRING"),
        ("actor_country", "$.actor_location.country", "STRING"),
        ("actor_region", "$.actor_location.region", "STRING"),
        ("actor_city", "$.actor_location.city", "STRING"),
        ("actor_ip", "$.actor_location.ip", "STRING"),
        ("email", "$.data.email", "STRING"),
        ("ref", "$.data.ref", "STRING"),
        ("head", "$.data.head", "STRING"),
        ("base", "$.data.base", "STRING"),
        ("target_login", "$.data.target_login", "STRING"),
        ("permission", "$.data.permission", "STRING"),
        ("team", "$.data.team", "STRING"),
        ("visibility", "$.data.visibility", "STRING"),
        ("hook_id", "$.data.hook_id", "INT"),
    ],
    # silver_slack_audit_logs.py:39-69 — column names match the reference
    # exactly (actor_id/actor_name/actor_email/date_create_ts) so the gold
    # transforms can cite field-for-field
    "slack": [
        ("event_id", "$.id", "STRING"),
        ("action", "$.action", "STRING"),
        ("date_create_ts", "$.date_create", "BIGINT"),
        ("actor_id", "$.actor.user.id", "STRING"),
        ("actor_name", "$.actor.user.name", "STRING"),
        ("actor_email", "$.actor.user.email", "STRING"),
        ("actor_type", "$.actor.type", "STRING"),
        ("entity_type", "$.entity.type", "STRING"),
        ("entity_id", "$.entity.id", "STRING"),
        ("entity_name", "$.entity.name", "STRING"),
        ("entity_privacy", "$.entity.privacy", "STRING"),
        ("entity_is_shared", "$.entity.is_shared", "BOOLEAN"),
        ("location_type", "$.context.location.type", "STRING"),
        ("location_id", "$.context.location.id", "STRING"),
        ("location_name", "$.context.location.name", "STRING"),
        ("location_domain", "$.context.location.domain", "STRING"),
        ("ip_address", "$.context.ip_address", "STRING"),
        ("user_agent", "$.context.ua", "STRING"),
        ("session_id", "$.context.session_id", "STRING"),
        ("details", "$.details", "STRING"),
    ],
    # silver_atlassian_audit_logs.py:39-81 — reference names verbatim
    # (actor_link, city/region_name/country_name, timezone, tags, context,
    # changes; container_id = whole container[0] as STRING, container_type =
    # CAST(NULL AS STRING) → path None below)
    "atlassian": [
        ("event_id", "$.id", "STRING"),
        ("action", "$.attributes.action", "STRING"),
        ("event_time_iso", "$.attributes.time", "STRING"),
        ("actor_id", "$.attributes.actor.id", "STRING"),
        ("actor_name", "$.attributes.actor.name", "STRING"),
        ("actor_email", "$.attributes.actor.email", "STRING"),
        ("actor_link", "$.attributes.actor.links.self", "STRING"),
        ("auth_type", "$.attributes.actor.auth.authType", "STRING"),
        ("session_id", "$.attributes.actor.auth.sessionId", "STRING"),
        ("token_id", "$.attributes.actor.auth.tokenId", "STRING"),
        ("location_ip", "$.attributes.location.ip", "STRING"),
        ("city", "$.attributes.location.city", "STRING"),
        ("region_name", "$.attributes.location.regionName", "STRING"),
        ("country_name", "$.attributes.location.countryName", "STRING"),
        ("location_geo", "$.attributes.location.geo", "STRING"),
        ("user_agent", "$.attributes.userAgent", "STRING"),
        ("timezone", "$.attributes.location.timezone", "STRING"),
        ("message_content", "$.message.content", "STRING"),
        ("message_locale", "$.message.i18n.locale", "STRING"),
        ("message_format", "$.message.format", "STRING"),
        ("risk_score", "$.risk.score", "INT"),
        ("risk_level", "$.risk.level", "STRING"),
        ("container_id", "$.attributes.container[0]", "STRING"),
        ("container_type", None, "STRING"),  # CAST(NULL AS STRING)
        ("tags", "$.tags", "STRING"),
        ("context", "$.attributes.context[0]", "STRING"),
        ("changes", "$.attributes.changes[0]", "STRING"),
    ],
}


def silver_schema(source: str) -> "pa.Schema":
    """Static silver schema (meta cols + typed fields + raw data) — lets the
    medallion pass writer schemas explicitly instead of probing the plan."""
    from .. import expr
    from ..schema import BRONZE

    fields = [BRONZE.field(m) for m in BRONZE_META_COLS]
    for name, _path, typ in SILVER_FIELDS[source]:
        fields.append(pa.field(name, expr._TYPE_MAP[typ]))
    fields.append(pa.field("data", pa.string()))
    return pa.schema(fields)


class SilverExtract:
    """map_batches callable: bronze rows → silver rows (meta + typed + data).

    Stateful (compiled path extractor) → actor pool; the JSON document is
    parsed ONCE per row and all 17-26 typed fields project from that parse
    (try_variant_get null-on-mismatch semantics, expr._coerce).
    """

    def __init__(self, source: str):
        self.source = source
        self.extract = expr.VariantExtractor(SILVER_FIELDS[source])

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch["data"]
        got = self.extract(data.combine_chunks() if isinstance(data, pa.ChunkedArray) else data)
        cols: dict[str, pa.Array] = {}
        for m in BRONZE_META_COLS:
            cols[m] = batch[m]
        cols.update(got)
        cols["data"] = data  # raw column LAST (silver_github_audit_logs.py:69)
        return pa.table(cols)

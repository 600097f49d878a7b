"""Gold OCSF transforms (operators M3+M4): 15 flows = 3 sources × 5 classes.

Spec-driven re-expression of the reference's 15 ``transform_<source>_to_
<class>`` functions (/root/reference/transformations/mappings/ocsf/iam/
gold_github_audit_logs.py, gold_slack_audit_logs.py,
gold_atlassian_audit_logs.py). Each transform is ONE fused map_batches
callable: the action-regex row filter (M3 — regexes copied verbatim from the
reference ``.where("action RLIKE ...")`` lines, cited per spec below) and the
wide nested OCSF projection (M4 — metadata/actor/user structs,
observables/enrichments list<struct>, unmapped raw_data) built with the
vectorized builders in expr.py: ``pc.case_when`` chains for
severity/activity/status (gold_github_audit_logs.py:55-69),
``pa.StructArray``/``pa.ListArray``/``pa.MapArray`` for
``named_struct``/``array``/``map`` literals (ibid:38-96,215).

Constants (uids 3001-3006, category 3, OCSF 1.7.0) from
/root/reference/utilities/utils.py:70-81.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .. import expr

OCSF_VERSION = "1.7.0"
OCSF_CATEGORY_UID = 3
OCSF_CATEGORY_NAME = "Identity & Access Management"

OCSF_CLASS_UIDS = {
    "account_change": 3001,
    "authentication": 3002,
    "authorize_session": 3003,
    "entity_management": 3004,
    "user_access": 3005,
    "group_management": 3006,
}
CLASS_NAMES = {
    "account_change": "Account Change",
    "authentication": "Authentication",
    "authorize_session": "Authorize Session",
    "entity_management": "Entity Management",
    "user_access": "User Access",
    "group_management": "Group Management",
}

PRODUCTS = {
    # gold_github_audit_logs.py:39; slack/atlassian analogs
    "github": ("GitHub", "GitHub Inc."),
    "slack": ("Slack", "Salesforce Inc."),
    "atlassian": ("Atlassian", "Atlassian Corporation"),
}

#: silver column names per source feeding the shared envelope
FIELD_MAP = {
    "github": dict(
        actor="actor", target="target_login", email="email", domain="organization",
        ip="actor_ip", city="actor_city", region="actor_region",
        country="actor_country", original_time="created_at_ms",
    ),
    "slack": dict(
        actor="actor_user_name", target="entity_name", email="actor_user_email",
        domain="location_domain", ip="ip_address", city=None, region=None,
        country=None, original_time="date_create_s",
    ),
    "atlassian": dict(
        actor="actor_name", target="container_id", email="actor_email",
        domain=None, ip="location_ip", city="location_city",
        region="location_region", country="location_country",
        original_time="event_time_iso",
    ),
}

#: action RLIKE regex per (source, class) — copied VERBATIM from the
#: reference .where() lines (file:line in comments).
CLASS_REGEX = {
    # gold_github_audit_logs.py:30,110,177,240,297
    ("github", "account_change"): r"org\.(add_member|remove_member|update_member)",
    ("github", "authentication"): r"user\.(login|logout)|oauth_authorization\.(create|destroy)",
    ("github", "authorize_session"): r"repo\.(add_member|remove_member|update_member)|protected_branch\.(create|destroy)",
    ("github", "user_access"): r"org\.(update_member|add_billing_manager)",
    ("github", "group_management"): r"team\.(add_member|remove_member|create|destroy)",
    # gold_slack_audit_logs.py:30,115,187,258,330
    ("slack", "account_change"): r"user_(created|deactivated|reactivated|role_changed|email_changed|permissions_assigned)",
    ("slack", "authentication"): r"user_(login|logout|login_failed)",
    ("slack", "authorize_session"): r"workspace_(setting_changed|sso_enabled|sso_disabled|created|name_changed|domain_changed)",
    ("slack", "user_access"): r"app_(installed|uninstalled|scopes_expanded)|guest_(invited|removed)",
    ("slack", "group_management"): r"channel_(created|deleted|archive|unarchive|rename|converted_to_private|posting_permissions_updated|member_joined)|usergroup_(created|member_added|member_removed)",
    # gold_atlassian_audit_logs.py:32,114,208,286,373
    ("atlassian", "account_change"): r"user\.(created|deleted|updated|deactivated|reactivated|2fa_enabled|2fa_disabled|password_reset)|api_key\.|token\.created",
    ("atlassian", "authentication"): r"user\.(login|login_failed|logout|session_ended)",
    ("atlassian", "authorize_session"): r"permission\.(granted|revoked)|role\.(assigned|removed)|organization\.(sso_enabled|sso_disabled|scim_enabled)",
    ("atlassian", "entity_management"): r"workspace\.(created|deleted)|project\.(created|deleted)|webhook\.",
    ("atlassian", "group_management"): r"group\.(member_added|member_removed|created|deleted)",
}


def flows() -> list[tuple[str, str]]:
    """The 15 (source, class) append flows
    (gold_ocsf_iam_event_classes_delta_sinks.py:184-305)."""
    return sorted(CLASS_REGEX)


def _col_or_null(batch: pa.Table, name: str | None, n: int) -> pa.Array:
    if name is not None and name in batch.schema.names:
        c = batch[name]
        return pc.cast(c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c, pa.string())
    return expr.nulls(n, pa.string())


class GoldTransform:
    """Fused M3 filter + M4 nested projection for one (source, class) flow."""

    def __init__(self, source: str, ocsf_class: str):
        import re

        self.source = source
        self.ocsf_class = ocsf_class
        self.regex = CLASS_REGEX[(source, ocsf_class)]
        re.compile(self.regex)  # fail fast
        self.fm = FIELD_MAP[source]

    def __call__(self, batch: pa.Table) -> pa.Table:
        # M3: regex row filter, fused with projection (one batch pass)
        action_all = batch["action"].combine_chunks() if isinstance(batch["action"], pa.ChunkedArray) else batch["action"]
        mask = pc.fill_null(expr.rlike(action_all, self.regex), False)
        batch = batch.filter(mask)
        n = batch.num_rows
        fm = self.fm
        action = batch["action"].combine_chunks() if n else pa.array([], pa.string())
        actor = _col_or_null(batch, fm["actor"], n)
        target = pc.coalesce(_col_or_null(batch, fm["target"], n), actor)
        email = _col_or_null(batch, fm["email"], n)
        domain = _col_or_null(batch, fm["domain"], n)
        ip = _col_or_null(batch, fm["ip"], n)
        event_id = _col_or_null(batch, "event_id", n)
        event_time = batch["_event_time"].combine_chunks() if n else pa.array([], pa.timestamp("us"))
        original_time = _col_or_null(batch, fm["original_time"], n)

        prod_name, prod_vendor = PRODUCTS[self.source]
        # metadata struct (gold_github_audit_logs.py:38-50)
        metadata = expr.named_struct(
            {
                "version": expr.lit(OCSF_VERSION, n, pa.string()),
                "product": expr.named_struct(
                    {
                        "name": expr.lit(prod_name, n, pa.string()),
                        "vendor_name": expr.lit(prod_vendor, n, pa.string()),
                    }
                ),
                "profiles": expr.string_array_literal(["cloud", "datetime"], n),
                "uid": event_id,
                "event_code": action,
                "log_format": expr.lit("JSON", n, pa.string()),
                "log_name": expr.lit("audit_logs", n, pa.string()),
                "log_provider": batch["_source"].combine_chunks() if n else pa.array([], pa.string()),
                # log_version = '<source>@<type>__1.0' (selective-deletion hook,
                # gold_github_audit_logs.py:36-37,47)
                "log_version": expr.concat(
                    batch["_source"].combine_chunks() if n else pa.array([], pa.string()),
                    "@",
                    batch["_source_type"].combine_chunks() if n else pa.array([], pa.string()),
                    "__1.0",
                )
                if n
                else pa.array([], pa.string()),
                "logged_time": batch["_ingest_time"].combine_chunks() if n else pa.array([], pa.timestamp("us")),
                "original_time": original_time,
            }
        )

        # severity / activity / status CASE chains (gold_github_audit_logs.py:55-69)
        if self.ocsf_class == "authentication":
            sev_id = expr.case_when([(expr.sql_like(action, "%failed%"), 4)], 1, pa.int32())
            sev = expr.case_when([(pc.equal(sev_id, 4), "High")], "Informational", pa.string())
            act_id = expr.case_when(
                [
                    (pc.or_(expr.sql_like(action, "%login%"), expr.sql_like(action, "%create%")), 1),
                    (pc.or_(expr.sql_like(action, "%logout%"), expr.sql_like(action, "%destroy%")), 2),
                ],
                99,
                pa.int32(),
            )
            act_name = expr.case_when(
                [(pc.equal(act_id, 1), "Logon"), (pc.equal(act_id, 2), "Logoff")],
                "Other",
                pa.string(),
            )
        else:
            sev_id = expr.case_when(
                [
                    (pc.or_(expr.sql_like(action, "%delete%"), expr.sql_like(action, "%suspend%")), 4),
                    (pc.or_(expr.sql_like(action, "%create%"), expr.sql_like(action, "%update%")), 2),
                ],
                1,
                pa.int32(),
            )
            sev = expr.case_when(
                [(pc.equal(sev_id, 4), "High"), (pc.equal(sev_id, 2), "Low")],
                "Informational",
                pa.string(),
            )
            act_id = expr.case_when(
                [
                    (expr.sql_like(action, "%created%"), 1),
                    (pc.or_(expr.sql_like(action, "%updated%"), expr.sql_like(action, "%renamed%")), 3),
                    (expr.sql_like(action, "%deleted%"), 4),
                ],
                99,
                pa.int32(),
            )
            act_name = expr.case_when(
                [(pc.equal(act_id, 1), "Create"), (pc.equal(act_id, 3), "Update"), (pc.equal(act_id, 4), "Delete")],
                "Other",
                pa.string(),
            )
        status_failed = expr.sql_like(action, "%failed%")
        status_id = expr.case_when([(status_failed, 2)], 1, pa.int32())
        status = expr.case_when([(status_failed, "Failure")], "Success", pa.string())

        message = expr.concat_ws(
            " ", expr.lit(prod_name, n, pa.string()), action, expr.lit("by", n, pa.string()), actor
        )

        user_struct_fields = lambda uid: {  # noqa: E731
            "uid": uid,
            "name": uid,
            "type": expr.lit("User", n, pa.string()),
            "type_id": expr.lit(1, n, pa.int32()),
            "email_addr": email,
            "domain": domain,
            "uid_alt": expr.nulls(n, pa.string()),
        }
        actor_struct = expr.named_struct({"user": expr.named_struct(user_struct_fields(actor))})
        user_struct = expr.named_struct(user_struct_fields(target))

        # observables / enrichments (gold_github_audit_logs.py:89-96)
        def obs(name, typ, type_id, value):
            return expr.named_struct(
                {
                    "name": expr.lit(name, n, pa.string()),
                    "type": expr.lit(typ, n, pa.string()),
                    "type_id": expr.lit(type_id, n, pa.int32()),
                    "value": value,
                }
            )

        observables = expr.struct_array_literal(
            [obs("actor", "User Name", 4, actor), obs("src_ip", "IP Address", 2, ip)]
        )

        def enr(name, value, typ):
            return expr.named_struct(
                {
                    "name": expr.lit(name, n, pa.string()),
                    "value": value,
                    "type": expr.lit(typ, n, pa.string()),
                    "data": expr.map_literal({"source": self.source}, n),
                }
            )

        enrichments = expr.struct_array_literal(
            [enr("domain", domain, "context"), enr("source", expr.lit(self.source, n, pa.string()), "source_system")]
        )

        unmapped = expr.named_struct({"raw_data": batch["data"].combine_chunks() if n else pa.array([], pa.string())})

        cols: dict[str, pa.Array] = {
            "_event_date": batch["_event_date"].combine_chunks() if n else pa.array([], pa.date32()),
            "_event_time": event_time,
            "_source": batch["_source"].combine_chunks() if n else pa.array([], pa.string()),
            "_source_type": batch["_source_type"].combine_chunks() if n else pa.array([], pa.string()),
            "metadata": metadata,
            "category_uid": expr.lit(OCSF_CATEGORY_UID, n, pa.int32()),
            "category_name": expr.lit(OCSF_CATEGORY_NAME, n, pa.string()),
            "class_uid": expr.lit(OCSF_CLASS_UIDS[self.ocsf_class], n, pa.int32()),
            "class_name": expr.lit(CLASS_NAMES[self.ocsf_class], n, pa.string()),
            "severity_id": sev_id,
            "severity": sev,
            "activity_id": act_id,
            "activity_name": act_name,
            "status_id": status_id,
            "status": status,
            "time": event_time,
            "message": message,
            "actor": actor_struct,
            "user": user_struct,
            "observables": observables,
            "enrichments": enrichments,
            "unmapped": unmapped,
        }
        # per-class extra: authentication carries src_endpoint + auth protocol
        # (gold_github_audit_logs.py:134-151)
        if self.ocsf_class == "authentication":
            cols["src_endpoint"] = expr.named_struct(
                {
                    "ip": ip,
                    "location": expr.named_struct(
                        {
                            "city": _col_or_null(batch, fm["city"], n),
                            "region": _col_or_null(batch, fm["region"], n),
                            "country": _col_or_null(batch, fm["country"], n),
                            "coordinates": pa.ListArray.from_arrays(
                                pa.array([0] * (n + 1), pa.int32()), pa.array([], pa.float64())
                            ),
                        }
                    ),
                }
            )
            is_oauth = expr.sql_like(action, "%oauth%")
            cols["auth_protocol"] = expr.case_when([(is_oauth, "OAuth")], "Password", pa.string())
            cols["auth_protocol_id"] = expr.case_when([(is_oauth, 2)], 1, pa.int32())
        return pa.table(cols)

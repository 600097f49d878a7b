"""Deterministic synthetic inputs (FIXTURES.md).

Everything is a pure function of (seed, conv_id, turn_idx) — no wall clock,
no RNG state — so regeneration is reproducible and per-turn text equality is
a meaningful oracle (BASELINE.json north_rule). Mirrors the role the
reference's ``_raw_logs/*.json`` fixtures play (125 events/source,
/root/reference/README.md:45) but at parameterized scale and with required
skew: a fixed hot set of conv_ids with ``50_000 × sf`` turns each.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa

from .hashing import hash64_str
from .schema import MERGE_SOURCE, TRANSCRIPT

SEED = 42
BASE_TS_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds
_DAY_US = 86_400_000_000
ROLES = ["user", "assistant", "tool", "system"]
TOOLS = ["search", "python", "browser", "sql", "editor"]
HOT_CONVS = 8


def n_convs(sf: float) -> int:
    return max(16, int(800_000 * sf))


def hot_turns(sf: float) -> int:
    return max(8, int(50_000 * sf))


def _text(conv_id: str, turn_idx: int, pad: bool) -> str:
    h = hashlib.sha256(f"{SEED}:{conv_id}:{turn_idx}".encode()).hexdigest()
    body = h * (1 + turn_idx % 3)
    s = f"{conv_id}/{turn_idx}:{body}"
    if pad:
        s = s + "x" * (8192 - len(s) % 8192)
    return s


def transcripts(sf: float) -> pa.Table:
    """Synthesize the transcript table at scale factor ``sf``.

    sf=0.001 → ~10k turns; sf=0.01 → ~100k; sf=0.1 → ~1M. 99% of convs have
    3 + hash%20 turns; conv-00000000..07 are hot (50_000×sf turns each).
    """
    nc = n_convs(sf)
    conv_ids = [f"conv-{i:08d}" for i in range(nc)]
    hashes = np.fromiter((hash64_str(c) for c in conv_ids), dtype=np.uint64, count=nc)
    lens = (3 + (hashes % np.uint64(20))).astype(np.int64)
    lens[:HOT_CONVS] = hot_turns(sf)

    total = int(lens.sum())
    conv_idx = np.repeat(np.arange(nc), lens)
    turn_idx = (np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)).astype(np.int32)
    h = hashes[conv_idx]

    role_code = ((h + turn_idx.astype(np.uint64)) % np.uint64(4)).astype(np.int64)
    # "system" only at turn 0 of every 7th conv; other would-be-system rows → user
    is_sys_slot = role_code == 3
    allowed_sys = (turn_idx == 0) & (conv_idx % 7 == 0)
    role_code = np.where(is_sys_slot & ~allowed_sys, 0, role_code)

    tool_code = (h % np.uint64(5)).astype(np.int64)
    is_tool = role_code == 2

    pad_sel = ((h + np.uint64(7919) * turn_idx.astype(np.uint64)) % np.uint64(100)) == 0

    conv_col = np.array(conv_ids, dtype=object)[conv_idx]
    texts = [
        _text(c, int(t), bool(p))
        for c, t, p in zip(conv_col, turn_idx, pad_sel)
    ]
    tools = np.where(is_tool, np.array(TOOLS, dtype=object)[tool_code], "")
    roles = np.array(ROLES, dtype=object)[role_code]

    ts = BASE_TS_US + (h % np.uint64(30 * _DAY_US)).astype(np.int64) + turn_idx.astype(np.int64) * 37_000_000

    return pa.table(
        {
            "conv_id": pa.array(conv_col, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        },
        schema=TRANSCRIPT,
    )


def merge_source(base: pa.Table) -> pa.Table:
    """Deterministic MERGE fixture from an existing transcript table.

    updates = every 97th key (text → "edited:" + old[:32]); inserts = one new
    turn (max+1) for every 113th conv; deletes = every 211th key
    (FIXTURES.md §2).
    """
    conv = base["conv_id"].to_numpy(zero_copy_only=False)
    turn = base["turn_idx"].to_numpy(zero_copy_only=False)
    text = base["text"].to_numpy(zero_copy_only=False)
    role = base["role"].to_numpy(zero_copy_only=False)
    tool = base["tool"].to_numpy(zero_copy_only=False)
    ts = base["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)

    rowno = np.arange(len(conv))
    upd = rowno % 97 == 13
    dele = (rowno % 211 == 29) & ~upd

    def rows_for(mask, op, edit_text=False):
        idx = np.flatnonzero(mask)
        texts = (
            np.array(["edited:" + text[i][:32] for i in idx], dtype=object)
            if edit_text
            else text[idx]
        )
        return pa.table(
            {
                "conv_id": pa.array(conv[idx], pa.string()),
                "turn_idx": pa.array(turn[idx].astype(np.int32)),
                "role": pa.array(role[idx], pa.string()),
                "text": pa.array(texts, pa.string()),
                "tool": pa.array(tool[idx], pa.string()),
                "ts": pa.array(ts[idx]).cast(pa.timestamp("us")),
                "op": pa.array([op] * len(idx), pa.string()),
            },
            schema=MERGE_SOURCE,
        )

    # inserts: every 113th distinct conv gets turn max+1 (vectorized group-max)
    agg = base.group_by("conv_id").aggregate([("turn_idx", "max"), ("ts", "max")])
    agg = agg.sort_by("conv_id")
    sel = pa.array(np.arange(agg.num_rows) % 113 == 7)
    ins_src = agg.filter(sel)
    ins_conv = ins_src["conv_id"].to_pylist()
    ins_turn = np.asarray(ins_src["turn_idx_max"].to_pylist(), dtype=np.int64) + 1
    ins = pa.table(
        {
            "conv_id": pa.array(ins_conv, pa.string()),
            "turn_idx": pa.array(ins_turn.astype(np.int32)),
            "role": pa.array(["user"] * len(ins_conv), pa.string()),
            "text": pa.array(
                [f"inserted:{c}:{t}" for c, t in zip(ins_conv, ins_turn)], pa.string()
            ),
            "tool": pa.array([""] * len(ins_conv), pa.string()),
            "ts": pa.array(
                np.asarray(ins_src["ts_max"].cast(pa.int64()).to_pylist(), dtype=np.int64)
                + 37_000_000
            ).cast(pa.timestamp("us")),
            "op": pa.array(["insert"] * len(ins_conv), pa.string()),
        },
        schema=MERGE_SOURCE,
    )
    return pa.concat_tables(
        [rows_for(upd, "update", edit_text=True), rows_for(dele, "delete"), ins]
    ).combine_chunks()


def apply_merge_expected(base: pa.Table, source: pa.Table) -> pa.Table:
    """Oracle: expected table after MERGE (upsert update/insert, delete)."""
    def keys(t):
        return {
            (c, int(i))
            for c, i in zip(
                t["conv_id"].to_pylist(),
                t["turn_idx"].to_pylist(),
            )
        }

    src_keys = keys(source)
    mask = [
        (c, int(i)) not in src_keys
        for c, i in zip(base["conv_id"].to_pylist(), base["turn_idx"].to_pylist())
    ]
    survivors = base.filter(pa.array(mask))
    add = source.filter(pa.compute.not_equal(source["op"], "delete")).drop_columns(["op"])
    out = pa.concat_tables([survivors, add]).combine_chunks()
    idx = pa.compute.sort_indices(
        out, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    return out.take(idx)


# --------------------------------------------------------------------------
# Audit-log JSONL fixtures (medallion-analog inputs, FIXTURES.md §3)
# --------------------------------------------------------------------------

GITHUB_ACTIONS = [
    "org.add_member", "org.remove_member", "org.update_member",
    "user.login", "user.logout", "user.failed_login",
    "oauth_authorization.create", "oauth_authorization.destroy",
    "team.create", "team.destroy", "team.add_member",
    "repo.create", "repo.destroy", "repo.access",
    "protected_branch.create", "protected_branch.destroy",
    "hook.create", "hook.destroy", "org.update_default_repository_permission",
]
SLACK_ACTIONS = [
    "user_login", "user_logout", "user_created", "user_deactivated",
    "channel_created", "channel_deleted", "channel_archived",
    "guest_created", "guest_deactivated", "role_change_to_admin",
    "workspace_sso_enabled", "permissions_changed", "file_downloaded",
    "app_installed", "app_uninstalled",
]
ATLASSIAN_ACTIONS = [
    "user.created", "user.deleted", "user.login.succeeded", "user.login.failed",
    "permission.granted", "permission.revoked", "group.created", "group.deleted",
    "group.member.added", "group.member.removed", "workspace.created",
    "api_token.created", "api_token.revoked", "policy.updated",
]

_AUDIT_BASE_S = 1_735_689_600  # 2025-01-01T00:00:00Z


def _pick(vocab: list[str], i: int, src: str) -> str:
    return vocab[hash64_str(f"{SEED}:{src}:{i}") % len(vocab)]


def audit_events(source: str, n: int = 125, start: int = 0) -> list[str]:
    """JSONL lines for one source, mirroring the reference field sets
    (silver_github_audit_logs.py:40-66 / silver_slack_audit_logs.py:40-67 /
    silver_atlassian_audit_logs.py:40-78). ``start`` offsets event ids so a
    second wave produces distinct events."""
    out = []
    for i in range(start, start + n):
        h = hash64_str(f"{SEED}:{source}:ev:{i}")
        t = _AUDIT_BASE_S + (h % (30 * 86_400))
        user = f"user{h % 40}"
        ip = f"10.{h % 256}.{(h >> 8) % 256}.{(h >> 16) % 256}"
        if source == "github":
            doc = {
                "id": f"gh-{i:06d}",
                "action": _pick(GITHUB_ACTIONS, i, source),
                "created_at": t * 1000,  # epoch-ms (bronze_github_audit_logs.py:20)
                "actor": user,
                "user": f"target{h % 23}",
                "org": f"org{h % 5}",
                "repo": f"org{h % 5}/repo{h % 11}",
                "actor_location": {
                    "country_code": ["US", "DE", "FR", "JP", "BR"][h % 5],
                    "country": ["USA", "Germany", "France", "Japan", "Brazil"][h % 5],
                    "region": f"region{h % 7}",
                    "city": f"city{h % 13}",
                    "ip": ip,
                },
                "data": {
                    "email": f"{user}@example.com" if h % 3 == 0 else None,
                    "ref": f"refs/heads/b{h % 4}" if h % 4 == 0 else None,
                    "team": f"team{h % 6}" if h % 5 == 0 else None,
                    "target_login": f"target{h % 23}",
                    "permission": ["read", "write", "admin"][h % 3],
                    "visibility": ["public", "private"][h % 2],
                    "hook_id": int(h % 10_000) if h % 6 == 0 else None,
                },
            }
        elif source == "slack":
            doc = {
                "id": f"sl-{i:06d}",
                "action": _pick(SLACK_ACTIONS, i, source),
                "date_create": t,  # epoch-s (bronze_slack_audit_logs.py:20)
                "actor": {
                    "type": "user",
                    "user": {"id": f"U{h % 999:05d}", "name": user, "email": f"{user}@corp.com"},
                },
                "entity": {
                    "type": ["channel", "user", "workspace", "file"][h % 4],
                    "id": f"E{h % 777:05d}",
                    "name": f"entity{h % 17}",
                    "privacy": ["public", "private"][h % 2],
                    "is_shared": bool(h % 3 == 0),
                },
                "context": {
                    "location": {
                        "type": "workspace",
                        "id": f"W{h % 3}",
                        "name": f"ws{h % 3}",
                        "domain": f"ws{h % 3}.slack.com",
                    },
                    "ip_address": ip,
                    "ua": "Mozilla/5.0",
                    "session_id": f"s-{h % 10_000}",
                },
                "details": {"reason": f"r{h % 9}"} if h % 4 == 0 else None,
            }
        elif source == "atlassian":
            iso = f"2025-01-{1 + (h % 28):02d}T{h % 24:02d}:{h % 60:02d}:{(h >> 5) % 60:02d}.000Z"
            doc = {
                "id": f"at-{i:06d}",
                "attributes": {
                    "time": iso,  # ISO string (bronze_atlassian_audit_logs.py:20)
                    "action": _pick(ATLASSIAN_ACTIONS, i, source),
                    "actor": {
                        "id": f"A{h % 555:05d}",
                        "name": user,
                        "email": f"{user}@corp.com",
                        "links": {"self": f"https://admin.atlassian.com/u/{h % 555}"},
                        "auth": {
                            "authType": ["saml", "password", "api_token"][h % 3],
                            "sessionId": f"sess-{h % 9999}",
                            "tokenId": f"tok-{h % 99}" if h % 5 == 0 else None,
                        },
                    },
                    "location": {
                        "ip": ip,
                        "city": f"city{h % 13}",
                        "regionName": f"region{h % 7}",
                        "countryName": ["USA", "Germany", "France", "Japan", "Brazil"][h % 5],
                        "geo": f"{h % 90}.0,{h % 180}.0",
                        "timezone": "UTC",
                    },
                    "userAgent": "Mozilla/5.0",
                    "container": [
                        {"id": f"ws-{h % 4}", "type": "workspace"},
                    ],
                    "context": [{"id": f"ctx-{h % 5}", "type": "site"}],
                    "changes": [],
                },
                "message": {
                    "content": f"{user} performed action",
                    "format": "simple",
                    "i18n": {"locale": "en-US"},
                },
                "risk": {"score": int(h % 100), "level": ["low", "medium", "high"][h % 3]},
                "tags": ["audit"],
            }
        else:
            raise ValueError(source)
        out.append(json.dumps(doc, separators=(",", ":"), sort_keys=True))
    return out


#: fixed, deterministic location for the DuckDB medallion oracle: the SQL in
#: oracle_sql() is a static string, so it reads the fixture from a constant
#: path; both queries() and oracle_sql() call ensure_oracle_fixture() so
#: either side can run first.
ORACLE_FIXTURE_DIR = "/tmp/lakeray-medallion-oracle"


def ensure_oracle_fixture(n_per_source: int = 125) -> dict[str, str]:
    """One JSONL file per source at a CONSTANT path with the same
    deterministic 125 events write_audit_fixture produces — registered via
    ``read_json_objects`` in the q_medallion_gold oracle SQL."""
    import os

    os.makedirs(ORACLE_FIXTURE_DIR, exist_ok=True)
    out = {}
    for src in ("github", "slack", "atlassian"):
        p = os.path.join(ORACLE_FIXTURE_DIR, f"{src}.jsonl")
        body = "\n".join(audit_events(src, n_per_source)) + "\n"
        if not (os.path.exists(p) and open(p).read() == body):
            tmp = p + f".tmp.{os.getpid()}"
            with open(tmp, "w") as f:
                f.write(body)
            os.replace(tmp, p)
        out[src] = p
    return out


def write_audit_fixture(
    root: str,
    n_per_source: int = 125,
    files_per_source: int = 5,
    *,
    wave: str = "audit",
    start: int = 0,
) -> dict[str, list[str]]:
    """Write JSONL fixture files under root/<source>/<wave>-*.jsonl.

    ``wave`` names a batch of files — writing a second wave into the same
    root simulates new files arriving for the incremental (Auto Loader
    analog) ingest path.
    """
    import os

    paths: dict[str, list[str]] = {}
    for src in ("github", "slack", "atlassian"):
        d = os.path.join(root, src)
        os.makedirs(d, exist_ok=True)
        lines = audit_events(src, n_per_source, start)
        per = max(1, len(lines) // files_per_source)
        paths[src] = []
        for k in range(0, len(lines), per):
            p = os.path.join(d, f"{wave}-{k // per:04d}.jsonl")
            with open(p, "w") as f:
                f.write("\n".join(lines[k : k + per]) + "\n")
            paths[src].append(p)
    return paths

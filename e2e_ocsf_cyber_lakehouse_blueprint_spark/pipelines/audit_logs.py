"""Bronze -> silver -> gold audit-log pipeline — the reference's medallion
surface re-expressed on this engine's tables.

Parity map (reference file:line -> here):
- bronze META_COLS + 8-col projection w/ single variant column
  (`bronze_github_audit_logs.py:19-27,43-63`; epoch-ms `:20-21`;
   slack epoch-s `bronze_slack_audit_logs.py:20-21`;
   atlassian ISO-8601 `bronze_atlassian_audit_logs.py:20-21`;
   `_metadata.file_path` `:26`)                  -> ``bronze_transform``
- silver try_variant_get typed extraction
  (`silver_github_audit_logs.py:39-66` 17 cols;
   `silver_slack_audit_logs.py:39-67` 19 cols incl. BOOLEAN;
   `silver_atlassian_audit_logs.py:39-78` 24 cols incl. INT + array index
   path `$.attributes.container[0]` at `:74`)    -> ``silver_github/slack/atlassian``
- gold OCSF construction: RLIKE routing (`gold_github_audit_logs.py:30`),
  severity/activity CASE ladders (`:55-69`), named_struct actor (`:87`),
  array/map/typed-NULL casts (`:89-96,215-217`), to_json(variant) unmapped
  (`:97`), lateral column aliases (`:55-67`)     -> ``gold_iam_transform``
- 15-flows->6-sinks multi-writer fan-in with mergeSchema
  (`gold_ocsf_iam_event_classes_delta_sinks.py:117-179,184-305`)
                                                 -> sequential append snapshots
                                                    + union-by-name evolution

All logic is Catalyst expressions over a real VARIANT column (parse_json /
try_variant_get / to_json) — zero Python in the row path, matching the
reference's expression-only discipline (SURVEY.md §2.10).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# ------------------------------------------------------------------ bronze

BRONZE_COLS = [
    "_event_time", "_event_date", "_file_path", "_source", "_source_type",
    "_ingest_time", "_hostname", "data",
]


def bronze_transform(raw: DataFrame, *, source: str, source_type: str,
                     time_expr: str) -> DataFrame:
    """Raw JSON-lines text -> bronze: variant payload + metadata columns.

    ``time_expr`` is a SQL expression over ``data`` producing the event
    timestamp — the per-source epoch-ms / epoch-s / ISO-8601 variants from the
    reference bronzes.
    """
    return (
        raw.select(
            F.parse_json(F.col("value")).alias("data"),
            F.col("_metadata.file_path").alias("_file_path"),
        )
        .withColumns({
            "_event_time": F.expr(time_expr),
            "_source": F.lit(source),
            "_source_type": F.lit(source_type),
            "_ingest_time": F.current_timestamp(),
            "_hostname": F.lit("engine"),
        })
        .withColumn("_event_date", F.to_date("_event_time"))
        .select(*BRONZE_COLS)
    )


# from_unixtime returns STRING (the reference casts at gold,
# gold_github_audit_logs.py:33); we normalize to TIMESTAMP at bronze so all
# three sources fan into one table without type drift
GITHUB_TIME = "CAST(from_unixtime(try_variant_get(data, '$.created_at', 'bigint') / 1000) AS TIMESTAMP)"
SLACK_TIME = "CAST(from_unixtime(try_variant_get(data, '$.date_create', 'bigint')) AS TIMESTAMP)"
ATLASSIAN_TIME = "to_timestamp(try_variant_get(data, '$.attributes.time', 'string'))"


def bronze_github(raw: DataFrame) -> DataFrame:
    return bronze_transform(raw, source="github", source_type="audit_logs",
                            time_expr=GITHUB_TIME)


def bronze_slack(raw: DataFrame) -> DataFrame:
    return bronze_transform(raw, source="slack", source_type="audit_logs",
                            time_expr=SLACK_TIME)


def bronze_atlassian(raw: DataFrame) -> DataFrame:
    return bronze_transform(raw, source="atlassian", source_type="audit_logs",
                            time_expr=ATLASSIAN_TIME)


# ------------------------------------------------------------------ silver

_META_PASSTHROUGH = [
    "_event_time", "_event_date", "_file_path", "_source", "_source_type",
    "_ingest_time", "_hostname",
]


def _silver(bronze: DataFrame, extractions: dict[str, str]) -> DataFrame:
    exprs = (
        _META_PASSTHROUGH
        + [f"{e} AS {name}" for name, e in extractions.items()]
        + ["data"]
    )
    return bronze.selectExpr(*exprs)


def silver_github(bronze: DataFrame) -> DataFrame:
    """17 typed extractions (silver_github_audit_logs.py:40-66)."""
    v = lambda p, t: f"try_variant_get(data, '$.{p}', '{t}')"
    return _silver(bronze, {
        "id": v("id", "string"),
        "action": v("action", "string"),
        "actor": v("actor", "string"),
        "user": v("user", "string"),
        "org": v("org", "string"),
        "repo": v("repo", "string"),
        "created_at_ms": v("created_at", "bigint"),
        "actor_country": v("actor_location.country", "string"),
        "actor_country_code": v("actor_location.country_code", "string"),
        "actor_region": v("actor_location.region", "string"),
        "actor_city": v("actor_location.city", "string"),
        "actor_ip": v("actor_location.ip", "string"),
        "email": v("data.email", "string"),
        "ref": v("data.ref", "string"),
        "team": v("data.team", "string"),
        "permission": v("data.permission", "string"),
        "visibility": v("data.visibility", "string"),
    })


def silver_slack(bronze: DataFrame) -> DataFrame:
    """19 extractions incl. BOOLEAN (silver_slack_audit_logs.py:40-67)."""
    v = lambda p, t: f"try_variant_get(data, '$.{p}', '{t}')"
    return _silver(bronze, {
        "id": v("id", "string"),
        "date_create": v("date_create", "bigint"),
        "action": v("action", "string"),
        "actor_type": v("actor.type", "string"),
        "actor_user_id": v("actor.user.id", "string"),
        "actor_user_name": v("actor.user.name", "string"),
        "actor_user_email": v("actor.user.email", "string"),
        "actor_user_team": v("actor.user.team", "string"),
        "entity_type": v("entity.type", "string"),
        "entity_id": v("entity.id", "string"),
        "entity_name": v("entity.name", "string"),
        "entity_privacy": v("entity.privacy", "string"),
        "entity_is_shared": v("entity.is_shared", "boolean"),
        "ctx_location_type": v("context.location.type", "string"),
        "ctx_location_id": v("context.location.id", "string"),
        "ctx_location_name": v("context.location.name", "string"),
        "ctx_ua": v("context.ua", "string"),
        "ctx_ip": v("context.ip_address", "string"),
        "ctx_session_id": v("context.session_id", "string"),
    })


def silver_atlassian(bronze: DataFrame) -> DataFrame:
    """Extractions incl. INT + array-index path (silver_atlassian_audit_logs.py:40-78)."""
    v = lambda p, t: f"try_variant_get(data, '$.{p}', '{t}')"
    return _silver(bronze, {
        "id": v("id", "string"),
        "time_str": v("attributes.time", "string"),
        "action": v("attributes.action", "string"),
        "actor_id": v("attributes.actor.id", "string"),
        "actor_name": v("attributes.actor.name", "string"),
        "actor_email": v("attributes.actor.email", "string"),
        "auth_type": v("attributes.actor.auth.authType", "string"),
        "session_id": v("attributes.actor.auth.sessionId", "string"),
        "location_ip": v("attributes.location.ip", "string"),
        "location_geo": v("attributes.location.geo", "string"),
        "location_country": v("attributes.location.countryName", "string"),
        "location_city": v("attributes.location.city", "string"),
        "user_agent": v("attributes.userAgent", "string"),
        "container_first": v("attributes.container[0]", "string"),
        "message_content": v("message.content", "string"),
        "risk_score": v("risk.score", "int"),
        "risk_level": v("risk.level", "string"),
    })


# -------------------------------------------------------------------- gold

OCSF_IAM_CATEGORY_UID = 3
OCSF_VERSION = "1.7.0"
# the reference's full 6-class surface (utilities/utils.py:70-77)
CLASS_UIDS = {"account_change": 3001, "authentication": 3002,
              "authorize_session": 3003, "entity_management": 3004,
              "user_access": 3005, "group_management": 3006}


def _user_struct(uid: str, name: str) -> str:
    """7-field OCSF user struct with typed-NULL string fields
    (gold_github_audit_logs.py:88)."""
    return (f"named_struct('uid', {uid}, 'name', {name}, 'type', 'User',"
            f" 'type_id', 1, 'email_addr', CAST(NULL AS STRING),"
            f" 'domain', CAST(NULL AS STRING), 'uid_alt', CAST(NULL AS STRING))")


def class_extras(class_name: str, *, source: str, action_col: str,
                 actor_id_col: str, actor_name_col: str,
                 org_col: str = "CAST(NULL AS STRING)",
                 target_col: str | None = None,
                 permission_col: str | None = None,
                 auth_type_col: str | None = None) -> list[str]:
    """Class-specific OCSF columns, mirroring the reference transforms:

    - ``user``        account_change/authorize_session/user_access/group_mgmt
                      (gold_github_audit_logs.py:88,218,273,337)
    - ``group``       group_management (OCSF 3006 required entity)
    - ``resource``    entity/group management with a
                      ``CAST(NULL AS MAP<STRING,STRING>)`` data field
                      (gold_github_audit_logs.py:274)
    - ``privileges``  CASE-built ARRAY<STRING> (gold_github_audit_logs.py:217,275)
    - ``auth_protocol[_id]`` + ``dst_endpoint``
                      authentication (gold_github_audit_logs.py:146-155)
    """
    target = target_col or actor_name_col
    user = f"{_user_struct(target, target)} AS user"
    priv_cond = permission_col or "CAST(NULL AS STRING)"
    if class_name == "account_change":
        return [user]
    if class_name == "authentication":
        auth_src = auth_type_col or action_col
        return [
            f"CASE WHEN {auth_src} LIKE '%saml%' OR {auth_src} LIKE '%sso%' THEN 'SAML'"
            f"     WHEN {auth_src} LIKE '%oauth%' THEN 'OAuth'"
            f"     ELSE 'Password' END AS auth_protocol",
            # lateral alias: the id ladder reads auth_protocol
            "CASE auth_protocol WHEN 'SAML' THEN 6 WHEN 'OAuth' THEN 2 ELSE 1 END"
            " AS auth_protocol_id",
            f"named_struct('hostname', '{source}.example.com', 'name', '{source}')"
            " AS dst_endpoint",
        ]
    if class_name == "authorize_session":
        return [
            user,
            f"CASE WHEN {priv_cond} IS NOT NULL THEN array({priv_cond})"
            f" ELSE CAST(NULL AS ARRAY<STRING>) END AS privileges",
        ]
    if class_name == "entity_management":
        return [
            f"named_struct('uid', {org_col}, 'name', {org_col}, 'type', 'Entity',"
            f" 'owner', named_struct('name', {actor_name_col}),"
            f" 'data', CAST(NULL AS MAP<STRING, STRING>)) AS resource",
        ]
    if class_name == "user_access":
        return [
            user,
            f"CASE WHEN {priv_cond} IS NOT NULL THEN array({priv_cond})"
            f" ELSE CAST(NULL AS ARRAY<STRING>) END AS privileges",
        ]
    if class_name == "group_management":
        return [
            user,
            f"named_struct('uid', {org_col}, 'name', {org_col},"
            f" 'type', 'Group') AS group",
            f"named_struct('uid', {org_col}, 'name', {org_col}, 'type', 'Organization',"
            f" 'owner', named_struct('name', {org_col}),"
            f" 'data', CAST(NULL AS MAP<STRING, STRING>)) AS resource",
            f"CASE WHEN {priv_cond} IS NOT NULL THEN array({priv_cond})"
            f" ELSE array('member') END AS privileges",
        ]
    raise ValueError(class_name)


def geo_src_endpoint(ip_col: str, geo_col: str | None, agent_col: str | None) -> str:
    """src_endpoint with ARRAY<DOUBLE> coordinates built by split(geo, ',')
    (gold_atlassian_audit_logs.py:161-171) or a typed-NULL fallback."""
    if geo_col:
        coords = (f"CASE WHEN {geo_col} IS NOT NULL THEN"
                  f" array(CAST(split({geo_col}, ',')[0] AS DOUBLE),"
                  f" CAST(split({geo_col}, ',')[1] AS DOUBLE))"
                  f" ELSE CAST(NULL AS ARRAY<DOUBLE>) END")
    else:
        coords = "CAST(NULL AS ARRAY<DOUBLE>)"
    agent = agent_col or "CAST(NULL AS STRING)"
    return (f"named_struct('ip', {ip_col},"
            f" 'location', named_struct('coordinates', {coords}),"
            f" 'agent', {agent})")


def gold_iam_transform(silver: DataFrame, *, source: str, action_col: str,
                       route_regex: str, class_name: str,
                       actor_name_col: str, actor_id_col: str,
                       ip_col: str | None = None,
                       severity_case: str | None = None,
                       extras: list[str] | None = None,
                       src_endpoint: str | None = None) -> DataFrame:
    """One OCSF IAM class flow: RLIKE route -> ~20-col OCSF construction.

    Exercises the reference's full expression census (SURVEY.md §2.8):
    CASE ladders with lateral aliases, named_struct (nested), array of structs,
    map, typed NULL casts (STRUCT/ARRAY/MAP), split->ARRAY<DOUBLE>,
    to_json(variant), CONCAT.
    """
    class_uid = CLASS_UIDS[class_name]
    sev = severity_case or f"""
        CASE WHEN {action_col} LIKE '%delete%' THEN 4
             WHEN {action_col} LIKE '%create%' THEN 2
             ELSE 1 END
    """
    ip_expr = ip_col or "CAST(NULL AS STRING)"
    endpoint = src_endpoint or geo_src_endpoint(ip_expr, None, None)
    return silver.where(f"{action_col} RLIKE '{route_regex}'").selectExpr(
        "_event_date",
        "_event_time",
        "_source",
        "_source_type",
        f"named_struct('product', named_struct('name', '{source}', 'vendor_name', '{source}'),"
        f" 'version', '{OCSF_VERSION}', 'log_version', CONCAT('ocsf-', '{OCSF_VERSION}')) AS metadata",
        f"{OCSF_IAM_CATEGORY_UID} AS category_uid",
        "'Identity & Access Management' AS category_name",
        f"{class_uid} AS class_uid",
        f"'{class_name}' AS class_name",
        f"{sev} AS severity_id",
        # lateral column alias: severity reads severity_id (gold_github :55-60)
        "CASE severity_id WHEN 5 THEN 'Critical' WHEN 4 THEN 'High' WHEN 2 THEN 'Low'"
        " ELSE 'Informational' END AS severity",
        f"CASE WHEN {action_col} LIKE '%create%' THEN 1"
        f"     WHEN {action_col} LIKE '%delete%' THEN 4 ELSE 99 END AS activity_id",
        "CASE activity_id WHEN 1 THEN 'Create' WHEN 4 THEN 'Delete' ELSE 'Other' END AS activity_name",
        f"CASE WHEN {action_col} LIKE '%failed%' THEN 2 ELSE 1 END AS status_id",
        "CASE status_id WHEN 2 THEN 'Failure' ELSE 'Success' END AS status",
        "CAST(_event_time AS TIMESTAMP) AS time",
        f"named_struct('user', named_struct("
        f"  'uid', {actor_id_col}, 'name', {actor_name_col},"
        f"  'type', 'User', 'type_id', 1)) AS actor",
        f"array(named_struct('name', 'actor.user.name', 'type', 'User Name',"
        f" 'type_id', 4, 'value', {actor_name_col})) AS observables",
        f"{endpoint} AS src_endpoint",
        f"map('source', '{source}', 'action', {action_col}) AS unmapped_kv",
        "named_struct('raw_data', to_json(data)) AS unmapped",
        f"CONCAT('{source}: ', {action_col}, ' by ', COALESCE({actor_name_col}, 'unknown')) AS message",
        *(extras or []),
    )


# the 15-flow matrix (3 sources x 5 classes each), mirroring
# gold_ocsf_iam_event_classes_delta_sinks.py:184-305: github/slack carry no
# entity_management flow, atlassian no user_access flow
_FLOW_MATRIX = {
    "github": {
        "account_change": "^org\\.update_member",
        "authentication": "^user_login|oauth",
        "authorize_session": "^org\\.",
        "group_management": "^team\\.",
        "user_access": "^(repo|org)\\.",
    },
    "slack": {
        "account_change": "^user_created",
        "authentication": "^user_log(in|out)",
        "authorize_session": "^user_",
        "group_management": "^channel_",
        "user_access": "_(created|deleted)$",
    },
    "atlassian": {
        "account_change": "^user_password",
        "authentication": "^user_",
        "authorize_session": "^user_login",
        "group_management": "^jira_project",
        "entity_management": "^jira_",
    },
}

_SOURCE_COLS = {
    "github": dict(actor_name_col="actor", actor_id_col="actor",
                   ip_col="actor_ip", org_col="org", target_col="user",
                   permission_col="permission", geo_col=None, agent_col=None,
                   auth_type_col=None, severity_case=None),
    "slack": dict(actor_name_col="actor_user_name", actor_id_col="actor_user_id",
                  ip_col="ctx_ip", org_col="entity_name", target_col=None,
                  permission_col="entity_privacy", geo_col=None,
                  agent_col="ctx_ua", auth_type_col=None, severity_case=None),
    "atlassian": dict(actor_name_col="actor_name", actor_id_col="actor_id",
                      ip_col="location_ip", org_col="container_first",
                      target_col=None, permission_col=None,
                      geo_col="location_geo", agent_col="user_agent",
                      auth_type_col="auth_type",
                      severity_case="CASE WHEN risk_score >= 70 OR risk_level = 'high' THEN 5 "
                                    "WHEN action LIKE '%delete%' THEN 4 ELSE 1 END"),
}


def gold_flow(silver: DataFrame, source: str, class_name: str) -> DataFrame:
    cols = _SOURCE_COLS[source]
    return gold_iam_transform(
        silver, source=source, action_col="action",
        route_regex=_FLOW_MATRIX[source][class_name], class_name=class_name,
        actor_name_col=cols["actor_name_col"], actor_id_col=cols["actor_id_col"],
        ip_col=cols["ip_col"], severity_case=cols["severity_case"],
        src_endpoint=geo_src_endpoint(cols["ip_col"], cols["geo_col"],
                                      cols["agent_col"]),
        extras=class_extras(
            class_name, source=source, action_col="action",
            actor_id_col=cols["actor_id_col"], actor_name_col=cols["actor_name_col"],
            org_col=cols["org_col"], target_col=cols["target_col"],
            permission_col=cols["permission_col"],
            auth_type_col=cols["auth_type_col"],
        ),
    )


def gold_flows(sg: DataFrame, ss: DataFrame, sa: DataFrame) -> dict[str, list[DataFrame]]:
    """The reference's full fan-in: 15 flows -> 6 class sinks
    (gold_ocsf_iam_event_classes_delta_sinks.py:117-179,184-305). Returns
    class_name -> list of flow DataFrames; writers append each flow to its
    class table (multi-writer optimistic commits + unionByName evolution)."""
    silvers = {"github": sg, "slack": ss, "atlassian": sa}
    out: dict[str, list[DataFrame]] = {c: [] for c in CLASS_UIDS}
    for source, classes in _FLOW_MATRIX.items():
        for class_name in classes:
            out[class_name].append(gold_flow(silvers[source], source, class_name))
    return {c: flows for c, flows in out.items() if flows}


# -------------------------------------------------- synthetic raw fixtures

def synthetic_raw_logs(kind: str, n: int = 125, seed: int = 3) -> list[str]:
    """Deterministic JSON lines in the reference's _raw_logs shapes
    (FIXTURES.md §2; AI-generated samples per reference README.md:45)."""
    import hashlib

    def h(i, k):
        return int.from_bytes(hashlib.md5(f"{seed}:{kind}:{i}:{k}".encode()).digest()[:4], "big")

    out = []
    base_ms = 1735689600000
    gh_actions = ["repo.create", "repo.destroy", "org.update_member", "team.add_member",
                  "team.remove_member"]
    slack_actions = ["user_login", "user_logout", "channel_created", "file_deleted",
                     "user_created"]
    atl_actions = ["jira_issue_created", "jira_project_deleted", "user_login_failed",
                   "user_password_changed"]
    for i in range(n):
        if kind == "github":
            rec = {
                "id": f"gh-{i:05d}",
                "action": gh_actions[h(i, "a") % len(gh_actions)],
                "actor": f"user{h(i, 'u') % 40}",
                "user": f"target{h(i, 't') % 60}" if h(i, "un") % 3 else None,
                "org": f"org{h(i, 'o') % 5}",
                "repo": f"org{h(i, 'o') % 5}/repo{h(i, 'r') % 20}",
                "created_at": base_ms + i * 61_000 + h(i, "ms") % 1000,
                "actor_location": {
                    "country_code": "US", "country": "United States",
                    "region": "CA", "city": "SF", "ip": f"10.0.{h(i, 'ip') % 256}.{i % 256}",
                },
                "data": {"email": f"user{h(i, 'u') % 40}@example.com",
                         "ref": f"refs/heads/b{h(i, 'b') % 9}",
                         "team": f"team{h(i, 'tm') % 7}",
                         "permission": ["read", "write", "admin"][h(i, 'p') % 3],
                         "visibility": ["public", "private"][h(i, 'v') % 2]},
            }
        elif kind == "slack":
            rec = {
                "id": f"sl-{i:05d}",
                "date_create": base_ms // 1000 + i * 59,
                "action": slack_actions[h(i, "a") % len(slack_actions)],
                "actor": {"type": "user",
                          "user": {"id": f"U{h(i, 'u') % 50:04d}",
                                   "name": f"slackuser{h(i, 'u') % 50}",
                                   "email": f"s{h(i, 'u') % 50}@example.com",
                                   "team": f"T{h(i, 'tm') % 4:03d}"}},
                "entity": {"type": ["channel", "file", "user"][h(i, 'e') % 3],
                           "id": f"E{h(i, 'ei') % 500:05d}",
                           "name": f"entity-{h(i, 'ei') % 500}",
                           "privacy": ["public", "private"][h(i, 'pr') % 2],
                           "is_shared": bool(h(i, "sh") % 2)},
                "context": {"location": {"type": "workspace", "id": f"W{h(i, 'w') % 3}",
                                         "name": f"ws-{h(i, 'w') % 3}", "domain": "example"},
                            "ua": "Mozilla/5.0", "ip_address": f"10.1.{h(i, 'ip') % 256}.{i % 256}",
                            "session_id": f"sess-{h(i, 'se') % 1000}"},
            }
        elif kind == "atlassian":
            ts = base_ms + i * 67_000
            iso = __import__("datetime").datetime.fromtimestamp(
                ts / 1000, __import__("datetime").timezone.utc
            ).strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3] + "Z"
            rec = {
                "id": f"at-{i:05d}",
                "attributes": {
                    "time": iso,
                    "action": atl_actions[h(i, "a") % len(atl_actions)],
                    "actor": {"id": f"A{h(i, 'u') % 30:04d}", "name": f"atluser{h(i, 'u') % 30}",
                              "email": f"a{h(i, 'u') % 30}@example.com",
                              "auth": {"authType": ["saml", "basic"][h(i, 'au') % 2],
                                       "sessionId": f"as-{h(i, 'se') % 999}",
                                       "tokenId": f"tk-{h(i, 'tk') % 999}"}},
                    "location": {"ip": f"10.2.{h(i, 'ip') % 256}.{i % 256}",
                                 "geo": f"{37 + (h(i, 'g') % 10) / 10},{-122 + (h(i, 'g2') % 10) / 10}",
                                 "countryName": "United States", "regionName": "CA",
                                 "city": "SF", "timezone": "America/Los_Angeles"},
                    "userAgent": "atlassian-client/1.0",
                    "container": [json.dumps({"id": f"proj-{h(i, 'c') % 12}", "type": "project"})],
                    "context": [json.dumps({"issue": f"ISS-{h(i, 'is') % 400}"})],
                    "changes": [json.dumps({"field": "status", "to": "done"})],
                },
                "message": {"content": f"action {i}", "format": "simple",
                            "i18n": {"key": "audit.msg", "locale": "en-US"}},
                "risk": {"score": h(i, "rs") % 100, "level": ["low", "medium", "high"][h(i, 'rl') % 3]},
                "tags": ["audit", "iam"],
            }
        else:
            raise ValueError(kind)
        out.append(json.dumps(rec, separators=(",", ":")))
    return out

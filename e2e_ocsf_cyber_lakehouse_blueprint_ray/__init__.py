"""Ray-Data-native lakehouse / table-maintenance engine.

A from-scratch re-expression of the capabilities of the reference repo
``grp-db/e2e-ocsf-cyber-lakehouse-blueprint`` (Databricks SDP + Auto Loader +
Delta medallion, see /root/reference) as idiomatic Ray Data pipelines over
plain Parquet tables with an Arrow-backed snapshot/manifest log:

- ``table.Table``          — Parquet table + snapshot log (Delta-table analog)
- ``stages.compact``       — bin-packing small-file compaction
- ``stages.cluster``       — Z-order / Hilbert clustering (liquid-clustering analog)
- ``stages.merge``         — copy-on-write MERGE INTO (anti-join + rewrite)
- ``stages.expire``        — snapshot expiry with atomic pointer retention
- ``pipelines.medallion``  — bronze → silver → gold flow (Auto Loader / OCSF analog)
- ``stages.dedup/similarity/text/multimodal`` — training-data-pipeline operators

Nothing here calls ``ray.init()``; the hosting process owns the Ray session.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy convenience exports: `from e2e_ocsf_cyber_lakehouse_blueprint_ray import Table`
    if name == "Table":
        from .table import Table

        return Table
    if name == "EngineConfig":
        from .config import EngineConfig

        return EngineConfig
    raise AttributeError(name)

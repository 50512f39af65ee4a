"""Tenant extraction and propagation.

The reference derives the tenant from HTTP auth at the ingest edge --
BasicAuth username first, else the X-Scope-OrgID header, else "" --
and then carries it through every stage on a context.Context
(pkg/context/handlers.go:29-40, pkg/context/context.go:15-25).

Spark has no ambient context; the idiom is a plain column. ``tenant_id``
rides every DataFrame from ingest to sink, which also makes it a natural
partitioning/bucketing key for per-tenant operations at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tenant_from_auth(
    basic_auth_user: Column | str = "basic_auth_user",
    x_scope_orgid: Column | str = "x_scope_orgid",
) -> Column:
    """B4: coalesce(basic-auth user, X-Scope-OrgID, '')."""
    user = F.col(basic_auth_user) if isinstance(basic_auth_user, str) else basic_auth_user
    org = F.col(x_scope_orgid) if isinstance(x_scope_orgid, str) else x_scope_orgid
    return F.coalesce(
        F.when(F.length(user) > 0, user),
        F.when(F.length(org) > 0, org),
        F.lit(""),
    )


def with_tenant(df: DataFrame, drop_auth_cols: bool = True) -> DataFrame:
    """Attach tenant_id from the HTTP auth columns and optionally drop them."""
    out = df.withColumn("tenant_id", tenant_from_auth())
    if drop_auth_cols:
        out = out.drop("basic_auth_user", "x_scope_orgid")
    return out

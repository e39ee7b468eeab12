"""SQL-standard authorization emulation (operators/authz.py, SURVEY §3.3).

The registry query ``authz_show_grants`` oracle-pins the ledger output;
these tests pin ENFORCEMENT — the part SHOW GRANTS can't show.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def test_grant_check_revoke_cycle():
    from hive_apache_ci_spark.operators.authz import AuthzStore

    s = AuthzStore()
    assert not s.check("alice", "SELECT", "customer")
    s.grant("SELECT", "customer", "alice")
    assert s.check("alice", "SELECT", "customer")
    assert not s.check("alice", "INSERT", "customer")
    assert not s.check("alice", "SELECT", "orders")
    s.revoke("SELECT", "customer", "alice")
    assert not s.check("alice", "SELECT", "customer")


def test_all_expands_and_revokes_as_four():
    from hive_apache_ci_spark.operators.authz import PRIVS, AuthzStore

    s = AuthzStore()
    s.grant("ALL", "lineitem", "bob")
    assert all(s.check("bob", p, "lineitem") for p in PRIVS)
    s.revoke("ALL", "lineitem", "bob")
    assert not any(s.check("bob", p, "lineitem") for p in PRIVS)


def test_role_membership_is_transitive_and_cycle_safe():
    from hive_apache_ci_spark.operators.authz import AuthzStore

    s = AuthzStore()
    s.grant("SELECT", "orders", "etl", principal_type="ROLE")
    s.grant_role("etl", "pipelines")      # nested role
    s.grant_role("pipelines", "carol")    # user in nested role
    s.grant_role("pipelines", "etl")      # cycle: must not hang
    assert s.check("carol", "SELECT", "orders")
    s.revoke_role("pipelines", "carol")
    assert not s.check("carol", "SELECT", "orders")


def test_regrant_is_idempotent_and_seq_has_holes_after_revoke():
    from hive_apache_ci_spark.operators.authz import AuthzStore

    s = AuthzStore()
    s.grant("SELECT", "part", "dave")
    s.grant("SELECT", "part", "dave")  # re-grant keeps the original row
    assert len(s.to_rows()) == 1 and s.to_rows()[0][6] == 1
    s.grant("SELECT", "nation", "dave")
    s.revoke("SELECT", "part", "dave")
    # survivor keeps seq 2 — revocation deletes, never renumbers
    assert [r[6] for r in s.to_rows()] == [2]


def test_enforcement_gate(spark):
    """authorized_table: denied -> AccessControlException BEFORE any scan;
    granted -> the ordinary DataFrame; revoked -> denied again."""
    from hive_apache_ci_spark.operators.authz import (
        AccessControlException,
        AuthzStore,
        authorized_table,
    )

    s = AuthzStore()
    with pytest.raises(AccessControlException, match="SELECT.*customer"):
        authorized_table(spark, SF, "customer", "eve", s)
    s.grant("SELECT", "customer", "eve")
    assert authorized_table(spark, SF, "customer", "eve", s).count() > 0
    s.revoke("SELECT", "customer", "eve")
    with pytest.raises(AccessControlException):
        authorized_table(spark, SF, "customer", "eve", s)


def test_show_grants_filter_by_table(spark):
    from hive_apache_ci_spark.operators.authz import _demo_store

    df = _demo_store().to_df(spark, table="lineitem")
    rows = df.collect()
    assert {r.privilege for r in rows} == {
        "SELECT", "INSERT", "UPDATE", "DELETE"
    }
    assert all(r.principal == "etl" and r.principal_type == "ROLE"
               for r in rows)

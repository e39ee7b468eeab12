"""SQL-standard authorization emulation — GRANT / REVOKE / SHOW GRANTS.

SURVEY §3.3 (DDL/metadata-only entry point; the reference ships
SQL-standard-based authorization: ``GRANT <priv> ON TABLE t TO USER|ROLE p
[WITH GRANT OPTION]``, ``REVOKE``, ``SHOW GRANTS``, role membership — the
`ql/security/authorization` package in SURVEY's jar inventory). This was
the last unimplemented row of the r11 VERDICT "What's missing" list
(item 5): row/column policy already exists as ``secured_view_policy``
(functions/hive_compat_queries.py); this module adds the grant ledger +
enforcement half.

Spark-first mapping: authorization is METADATA — no job ever launches for
it in the reference either, so the grant ledger is a plain in-session
store surfaced as a DataFrame (``show_grants``), and ENFORCEMENT is a
gate in front of table resolution (``authorized_table``): a denied
principal fails BEFORE any scan is planned, an allowed one pays zero
runtime cost because the gate returns the ordinary DataFrame untouched.
That matches Hive's HiveAuthorizer contract (checkPrivileges runs at
analysis time, not per row). At 100 TB the cost story is therefore
identical to the reference's: O(|grants|) dictionary lookups per query
compile, nothing in the data path.

Semantics mirrored from the public Hive SQL-std auth spec:
- privileges: SELECT, INSERT, UPDATE, DELETE; ``ALL`` expands to the four;
- principals: USER and ROLE; users acquire role privileges via
  ``grant_role`` membership (transitive through nested roles);
- WITH GRANT OPTION recorded per grant;
- REVOKE removes the exact (priv, table, principal) edge (ALL revokes all
  four); revoking a role does not disturb sibling grants;
- SHOW GRANTS lists (principal_type, principal, table, privilege,
  grant_option, grantor, grant_seq) — ``grant_seq`` is a deterministic
  logical sequence number standing in for Hive's wall-clock grant_time
  (the differential oracle needs run-independent values).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import query

PRIVS = ("SELECT", "INSERT", "UPDATE", "DELETE")


class AccessControlException(PermissionError):
    """Raised by enforcement when a principal lacks a required privilege
    (the HiveAccessControlException role)."""


class AuthzStore:
    """In-session grant ledger + role graph.

    Pure-Python metadata (like Hive's DB-backed grant tables — never a
    Spark job); ``to_df`` materializes it for SHOW GRANTS queries."""

    def __init__(self):
        #: set of (principal_type, principal, table, priv, grant_option,
        #: grantor, seq)
        self._grants: list[tuple] = []
        #: role -> set of member principals (users or roles)
        self._roles: dict[str, set[str]] = {}
        self._seq = 0

    # -- DDL surface -----------------------------------------------------

    def grant(self, priv: str, table: str, principal: str,
              principal_type: str = "USER", grant_option: bool = False,
              grantor: str = "admin") -> None:
        privs = PRIVS if priv.upper() == "ALL" else (priv.upper(),)
        for p in privs:
            if p not in PRIVS:
                raise ValueError(f"unknown privilege {p!r}")
            key = (principal_type.upper(), principal, table, p)
            if any(g[:4] == key for g in self._grants):
                continue  # idempotent re-grant (Hive keeps the original)
            self._seq += 1
            self._grants.append(
                (*key, bool(grant_option), grantor, self._seq)
            )

    def revoke(self, priv: str, table: str, principal: str,
               principal_type: str = "USER") -> None:
        privs = PRIVS if priv.upper() == "ALL" else (priv.upper(),)
        keys = {
            (principal_type.upper(), principal, table, p) for p in privs
        }
        self._grants = [g for g in self._grants if g[:4] not in keys]

    def grant_role(self, role: str, member: str) -> None:
        self._roles.setdefault(role, set()).add(member)

    def revoke_role(self, role: str, member: str) -> None:
        self._roles.get(role, set()).discard(member)

    # -- checks ------------------------------------------------------------

    def _principals_of(self, user: str) -> set[tuple[str, str]]:
        """(type, name) identities a user acts as: self + every role
        reachable through membership (transitive, cycle-safe)."""
        out = {("USER", user)}
        frontier = [user]
        seen = set()
        while frontier:
            m = frontier.pop()
            if m in seen:
                continue
            seen.add(m)
            for role, members in self._roles.items():
                if m in members and ("ROLE", role) not in out:
                    out.add(("ROLE", role))
                    frontier.append(role)
        return out

    def check(self, user: str, priv: str, table: str) -> bool:
        idents = self._principals_of(user)
        want = priv.upper()
        return any(
            (g[0], g[1]) in idents and g[2] == table and g[3] == want
            for g in self._grants
        )

    def require(self, user: str, priv: str, table: str) -> None:
        if not self.check(user, priv, table):
            raise AccessControlException(
                f"Principal [name={user}, type=USER] does not have "
                f"[{priv.upper()}] privilege on [default/{table}]"
            )

    # -- SHOW GRANTS -------------------------------------------------------

    def to_rows(self, table: str | None = None) -> list[tuple]:
        rows = [g for g in self._grants if table is None or g[2] == table]
        return sorted(rows, key=lambda g: g[6])

    def to_df(self, spark, table: str | None = None):
        schema = (
            "principal_type string, principal string, tbl string, "
            "privilege string, grant_option boolean, grantor string, "
            "grant_seq int"
        )
        return spark.createDataFrame(self.to_rows(table), schema)


def authorized_table(spark, sf_dir: str, table: str, user: str,
                     store: AuthzStore, priv: str = "SELECT"):
    """Enforcement gate in front of table resolution: raises
    AccessControlException at compile time when `user` lacks `priv`;
    otherwise returns the plain DataFrame — zero data-path overhead."""
    from ..helpers import T

    store.require(user, priv, table)
    return T(spark, sf_dir, table)


def _demo_store() -> AuthzStore:
    """The deterministic grant scenario behind the oracled query: user
    grants, a role with ALL, membership, a revoke, and a grant-option
    edge — every ledger feature leaves a visible row (or a visible
    absence: intern's revoked SELECT)."""
    s = AuthzStore()
    s.grant("SELECT", "customer", "analyst")
    s.grant("ALL", "lineitem", "etl", principal_type="ROLE")
    s.grant("SELECT", "customer", "intern")
    s.grant("UPDATE", "orders", "etl", principal_type="ROLE",
            grant_option=True)
    s.grant("SELECT", "documents", "analyst")
    s.revoke("SELECT", "customer", "intern")
    s.grant_role("etl", "dataeng")
    return s


@query(
    "authz_show_grants",
    oracle="""
    SELECT * FROM (VALUES
      ('USER', 'analyst', 'customer',  'SELECT', FALSE, 'admin', 1),
      ('ROLE', 'etl',     'lineitem',  'SELECT', FALSE, 'admin', 2),
      ('ROLE', 'etl',     'lineitem',  'INSERT', FALSE, 'admin', 3),
      ('ROLE', 'etl',     'lineitem',  'UPDATE', FALSE, 'admin', 4),
      ('ROLE', 'etl',     'lineitem',  'DELETE', FALSE, 'admin', 5),
      ('ROLE', 'etl',     'orders',    'UPDATE', TRUE,  'admin', 7),
      ('USER', 'analyst', 'documents', 'SELECT', FALSE, 'admin', 8)
    ) AS t(principal_type, principal, tbl, privilege, grant_option,
           grantor, grant_seq)
    """,
)
def authz_show_grants(spark, sf_dir):
    """SHOW GRANTS over the demo ledger (SURVEY §3.3 authorization row):
    GRANT x5 (incl. a ROLE-ALL expansion to four privileges and a WITH
    GRANT OPTION edge) + one REVOKE whose row must be ABSENT. Seq 6
    (intern's revoked SELECT) is a hole in grant_seq — the oracle pins
    that revocation removes the edge without renumbering survivors,
    exactly Hive's behavior of deleting the grant record. Metadata-only:
    no table is scanned; the ledger materializes via createDataFrame."""
    return _demo_store().to_df(spark)

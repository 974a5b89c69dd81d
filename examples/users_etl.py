"""The reference's shipped scenario, end to end — ``etl.js`` +
``mappings/users.js`` + ``mappings/user_roles.js`` transposed onto the
PySpark engine.

Faithful correspondences (reference file:line):

- mapping modules are callables ``(config, args) → MappingSpec``
  (``mappings/users.js:5``'s ``exports.Map``), registered in order via
  ``config.use_mapping`` (``tables.js:6-14``, ``etl.js:40-43``);
- ``BuildConfig({databases, options})`` + test modes
  (``etl.js:10-37``) — ``sqlTest`` becomes dry-run, ``passes: 2`` the
  idempotency probe;
- the password column branches on ``config.options['clearPasswords']``
  exactly like ``mappings/users.js:18-24``;
- combinators use the reference's options-object call shape
  (``user_guid`` FK, ``user_nm`` ConcatColumns —
  ``mappings/users.js:25-37``);
- ``user_roles.user_id`` ships as ``DirectCopy('Username')``
  (``mappings/user_roles.js:15``); the commented-out ForeignKey variant
  (``mappings/user_roles.js:17-24`` — FK into the *just-merged* ``users``
  table, the T16 in-run-state contract) is selectable with
  ``options['roleUserIdViaFk']``, and ``main()`` runs it both ways.

Run: ``python examples/users_etl.py``
"""

from __future__ import annotations

import datetime
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dirty_js_etl_spark.catalog import Catalog  # noqa: E402
from dirty_js_etl_spark.functions.combinators import (  # noqa: E402
    ConcatColumns,
    DirectCopy,
    ForeignKey,
    InvertBit,
    MergeOn,
    RawValue,
)
from dirty_js_etl_spark.plans.config import BuildConfig, EtlConfig  # noqa: E402
from dirty_js_etl_spark.plans.mapping import MappingSpec  # noqa: E402


def users_map(config: EtlConfig, _args=None) -> MappingSpec:
    """``mappings/users.js`` — the users table mapping."""
    use_empty_password = config.options.get("clearPasswords")
    return MappingSpec(
        destination="users",
        source="etl_Users",
        use_merge=True,
        kill_where="orig_id IS NOT NULL",  # emitted commented-out: merge table
        message="migrating NON-DUPLICATE users",
        columns={
            "orig_id": MergeOn("UserID"),
            "orig_admin": DirectCopy("Admin"),
            "user_id": DirectCopy("Username"),
            # clear password under the testing option (users.js:18-24)
            "password": (
                RawValue(None) if use_empty_password else DirectCopy("Password")
            ),
            "user_nm": ConcatColumns(
                {"columns": ["FirstName", "LastName"], "spacer": " "}
            ),
            "attr_bits": InvertBit("IsActive"),
            "email_address": DirectCopy("EMailAddress"),
            "user_guid": ForeignKey(
                {  # this is the individual guid fk (users.js:31-38)
                    "sourceColumn": "AgentID",
                    "parentTable": "individual",
                    "parentColumn": "individual_id",
                    "parentType": "UNIQUEIDENTIFIER",
                    "importColumn": "orig_agent_id",
                    "importType": "INT",
                }
            ),
            "first_name": DirectCopy("FirstName"),
            "last_name": DirectCopy("LastName"),
            "date_created": DirectCopy("RegistrationDate"),
            "pin_code": DirectCopy("PinCode"),
        },
    )


def user_roles_map(config: EtlConfig, _args=None) -> MappingSpec:
    """``mappings/user_roles.js`` — default role for imported users."""
    if config.options.get("roleUserIdViaFk"):
        # the commented-out variant (user_roles.js:17-24): resolve the
        # destination user_id through the users table AS MERGED EARLIER
        # IN THIS RUN — the T16 ordering contract
        user_id = ForeignKey(
            {
                "sourceColumn": "UserID",
                "parentTable": "users",
                "parentColumn": "user_id",
                "parentType": "NVARCHAR(64)",
                "importColumn": "orig_id",
                "importType": "INT",
            }
        )
    else:
        user_id = DirectCopy("Username")
    return MappingSpec(
        destination="user_roles",
        source="etl_Users",
        use_merge=True,
        kill_where="orig_user_id IS NOT NULL",
        message="defaulted role for imported to Users",
        columns={
            "orig_user_id": MergeOn("UserID"),
            "user_id": user_id,
            "role_nm": RawValue("Users"),
        },
    )


def build_catalog(spark) -> Catalog:
    """Source view + parent dim + empty destinations (in the reference
    these all live in SQL Server; ``etl_Users`` is the prejoining source
    view the README-era convention expects, ``mappr.js:18``)."""
    cat = Catalog(spark)
    ts = datetime.datetime
    cat.register(
        "etl_Users",
        spark.createDataFrame(
            [
                (1, 1, "ada", "pw-a", "Ada", "Lovelace", 1, "ada@example.com",
                 101, ts(2024, 1, 1), "1111"),
                (2, 0, "alan", "pw-b", "Alan", "Turing", 0, "alan@example.com",
                 102, ts(2024, 2, 2), "2222"),
                (3, 0, "grace", None, "Grace", None, None, None,
                 999, ts(2024, 3, 3), None),
            ],
            "UserID int, Admin int, Username string, Password string, "
            "FirstName string, LastName string, IsActive int, "
            "EMailAddress string, AgentID int, RegistrationDate timestamp, "
            "PinCode string",
        ),
    )
    cat.register(
        "individual",
        spark.createDataFrame(
            [(101, "guid-101"), (102, "guid-102")],
            "orig_agent_id int, individual_id string",
        ),
    )
    cat.register(
        "users",
        spark.createDataFrame(
            [],
            "orig_id int, orig_admin int, user_id string, password string, "
            "user_nm string, attr_bits int, email_address string, "
            "user_guid string, first_name string, last_name string, "
            "date_created timestamp, pin_code string",
        ),
    )
    cat.register(
        "user_roles",
        spark.createDataFrame(
            [], "orig_user_id int, user_id string, role_nm string"
        ),
    )
    return cat


def run(spark, role_user_id_via_fk: bool = True):
    """etl.js:10-43 — build config, register tables in order, run."""
    config = BuildConfig(
        {
            "databases": {"source": "source_db", "destination": "destination_db"},
            "options": {
                "clearPasswords": True,
                "roleUserIdViaFk": role_user_id_via_fk,
            },
            "modes": {"sqlTest": True, "passes": 2},
        }
    )
    config.use_mapping(users_map).use_mapping(user_roles_map)
    return config.to_pipeline().run(build_catalog(spark))


def main() -> None:
    from dirty_js_etl_spark.session import get_spark

    spark = get_spark("users-etl-example")
    for via_fk in (False, True):
        results = run(spark, role_user_id_via_fk=via_fk)
        print(f"\n== user_roles.user_id via {'FK' if via_fk else 'DirectCopy'} ==")
        for name in ("users", "user_roles"):
            print(f"-- {name} --")
            for row in sorted(results[name].result.collect()):
                print(tuple(row))


if __name__ == "__main__":
    main()

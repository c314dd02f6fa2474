"""Reference-parity pipelines: the four HTTP entry points of
Dharineesh-MCW/Go-HTTP-Data-PipeLine re-expressed as distributed
dataflow (SURVEY.md §3).

The reference's tables (``employee``, ``users``) don't exist in the
fixtures, so each pipeline derives them deterministically from fixture
tables with pure arithmetic — identical formulas on the DuckDB side,
so every pipeline is oracle-checked end-to-end.

Parity map:
* salary ETL      — ``/processsalary`` (``Server/main.go:284-320``):
  projected scan → per-row remote enrichment → keyed write-back.
  Here: ``mapInPandas`` Arrow-batched enrichment (the idiomatic form
  of the reference's serial per-row HTTP loop) → relational MERGE.
* employee upsert — ``UPDATE ... WHERE id=?`` (:279-282) + insert
  (:217) as one ``merge_into``.
* login flow      — ``/login`` (:91-156): point lookup, auto-register
  on miss (left-anti append), credential check. The reference's
  "any unknown username silently creates an account" quirk (§3.2) is
  preserved and visible in the output's ``registered`` flag.
* JSON egress     — ``/getemployees`` (:229-259): scan → JSON array
  rows via ``to_json(struct(...))``.

bcrypt is salted/non-deterministic (``Server/main.go:114``), so the
oracle-checked login path uses ``sha2(pw, 256)``; the real bcrypt/JWT
chain lives in ``pipelines/auth.py`` (unit-tested, not oracle-able).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query
from .merge import apply_cdc, merge_into

# ---------------------------------------------------------------- employees
# Derived employee table (FIXTURES.md §B): id/name from customer,
# age/yearsofexp/salary by arithmetic. Same formulas in the oracle CTE.

_EMP_SQL = """
    employee AS (
        SELECT c_custkey AS id,
               c_name AS name,
               CAST(18 + c_custkey % 40 AS INT) AS age,
               CAST(c_custkey % 30 AS INT) AS yearsofexp,
               CAST(30000 + (c_custkey % 50) * 1000 AS BIGINT) AS salary
        FROM customer
    )
"""


def employees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ``employee`` table (``Server/main.go:31-37``),
    derived deterministically from ``customer``."""
    return table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        (18 + F.col("c_custkey") % 40).cast("int").alias("age"),
        (F.col("c_custkey") % 30).cast("int").alias("yearsofexp"),
        (30000 + (F.col("c_custkey") % 50) * 1000).cast("bigint").alias("salary"),
    )


# ------------------------------------------------------------- salary ETL


def _enrich_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Stand-in for the remote salary service
    (``Server/main.go:299-311``: ``{id, yearsofexp, salary} →
    {new_salary}``), applied per Arrow batch. In production the body
    of this function is an HTTP POST of the whole batch — one
    round-trip per ~10k rows instead of the reference's one per row,
    with connection reuse per partition."""
    for pdf in batches:
        pdf = pdf.copy()
        pdf["new_salary"] = (
            pdf["salary"] + 500 * pdf["yearsofexp"] + (pdf["age"] % 5) * 250
        )
        yield pdf


@query(
    "salary_etl_merge",
    oracle=f"""
    WITH {_EMP_SQL},
    enriched AS (
        SELECT id, CAST(salary + 500 * yearsofexp + (age % 5) * 250 AS BIGINT)
                   AS new_salary
        FROM employee
    )
    SELECT e.id, e.name, e.age, e.yearsofexp, n.new_salary AS salary
    FROM employee e JOIN enriched n ON n.id = e.id
    """,
)
def salary_etl_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship ``/processsalary`` ETL (SURVEY.md §3.1): projected
    scan → Arrow-batched enrichment (``mapInPandas``) → MERGE by id.

    The reference's serial N x (HTTP + UPDATE) loop collapses into one
    distributed job: extraction is a 3-column pruned scan, enrichment
    runs partition-parallel on Arrow batches, and the write-back is a
    single relational merge instead of N point updates."""
    emp = employees(spark, sf_dir)
    extracted = emp.select("id", "age", "yearsofexp", "salary")
    enriched = extracted.mapInPandas(
        _enrich_batches,
        schema="id long, age int, yearsofexp int, salary long, new_salary long",
    )
    updates = enriched.select("id", F.col("new_salary").alias("salary"))
    merged = merge_into(
        emp.select("id", "salary"), updates, key="id"
    ).withColumnRenamed("salary", "new_salary")
    return emp.select("id", "name", "age", "yearsofexp").join(
        merged, "id"
    ).select("id", "name", "age", "yearsofexp", F.col("new_salary").alias("salary"))


@query(
    "employee_upsert",
    oracle=f"""
    WITH {_EMP_SQL},
    updates AS (
        SELECT id, name, age, yearsofexp, CAST(salary + 10000 AS BIGINT) AS salary
        FROM employee WHERE id % 10 = 0
        UNION ALL
        SELECT (SELECT MAX(id) + 1 FROM employee) + n AS id,
               'User' || CAST((1103515245 * (n + 42) + 12345) % 2147483648 % 10000
                              AS VARCHAR) AS name,
               CAST(18 + (1103515245 * (n + 42) + 12345) % 2147483648 % 40 AS INT)
                   AS age,
               CAST(0 AS INT) AS yearsofexp,
               CAST(30000 AS BIGINT) AS salary
        FROM range(0, 10) t(n)
    )
    SELECT * FROM (
        SELECT e.* FROM employee e ANTI JOIN updates u ON u.id = e.id
        UNION ALL
        SELECT * FROM updates
    )
    """,
)
def employee_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S4/S5: one MERGE covering both reference write paths — the
    keyed UPDATE (ids divisible by 10 get a raise) and the append of
    10 generated hires (the ``Random`` client's records, seeded LCG as
    in ``generated_users``). Hire ids start at MAX(id) + 1 — carried
    in-plan as a 1-row broadcast, not a fixed 1,000,000 offset, which
    would collide with real employee ids at SF >= ~7 and put two
    conflicting rows per key through a MERGE documented as keyed
    upsert (both engines would agree, so the gate would stay green on
    the broken semantics)."""
    emp = employees(spark, sf_dir)
    raises = emp.filter(F.col("id") % 10 == 0).withColumn(
        "salary", (F.col("salary") + 10000).cast("bigint")
    )
    lcg = (F.lit(1103515245) * (F.col("id") + 42) + 12345) % 2147483648
    base = emp.agg((F.max("id") + 1).alias("_base"))
    hires = spark.range(0, 10).crossJoin(F.broadcast(base)).select(
        (F.col("_base") + F.col("id")).alias("id"),
        F.concat(F.lit("User"), (lcg % 10000).cast("string")).alias("name"),
        (18 + lcg % 40).cast("int").alias("age"),
        F.lit(0).cast("int").alias("yearsofexp"),
        F.lit(30000).cast("bigint").alias("salary"),
    )
    return merge_into(emp, raises.unionByName(hires), key="id")


@query(
    "cdc_merge_schema_evolution",
    oracle=f"""
    WITH {_EMP_SQL},
    cdc AS (
        SELECT id, name, age, yearsofexp,
               CAST(salary + 5000 AS BIGINT) AS salary,
               'emp' || CAST(id AS VARCHAR) || '@corp.example' AS email,
               CASE WHEN id % 13 = 0 THEN 'D' ELSE 'U' END AS op
        FROM employee WHERE id % 13 = 0 OR id % 7 = 0
    )
    SELECT e.id, e.name, e.age, e.yearsofexp, e.salary,
           CAST(NULL AS VARCHAR) AS email
    FROM employee e ANTI JOIN cdc c ON c.id = e.id
    UNION ALL
    SELECT id, name, age, yearsofexp, salary, email
    FROM cdc WHERE op != 'D'
    """,
)
def cdc_merge_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 extended: a CDC batch (ops ``U``/``D``) merged into the
    employee table **with schema evolution** — the feed carries an
    ``email`` column the target never had. Deletes (ids % 13) remove
    the key, updates (ids % 7) take the CDC image, and every untouched
    row survives with ``email`` NULL: the evolved schema is the old
    schema plus the feed's new columns, exactly what a table format's
    auto-merge does on MERGE INTO.

    The writeback shape is the reference's ``UPDATE employee``
    (``Server/main.go:279-282``) grown to the real CDC contract
    (insert/update/delete + schema drift) that an upstream Debezium/
    binlog feed delivers. One relational pass (:func:`apply_cdc`); at
    100 TB this runs per micro-batch inside ``foreachBatch`` against a
    key-partitioned table, rewriting only partitions holding touched
    keys."""
    emp = employees(spark, sf_dir)
    touched = emp.filter((F.col("id") % 13 == 0) | (F.col("id") % 7 == 0))
    cdc = touched.select(
        "id",
        "name",
        "age",
        "yearsofexp",
        (F.col("salary") + 5000).cast("bigint").alias("salary"),
        F.concat(
            F.lit("emp"), F.col("id").cast("string"), F.lit("@corp.example")
        ).alias("email"),
        F.when(F.col("id") % 13 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    return apply_cdc(emp, cdc, key="id")


# ------------------------------------------------------------- login flow

_USERS_SQL = """
    users AS (
        SELECT s_name AS username, sha256('pw_' || s_name) AS password
        FROM supplier
    ),
    attempts AS (
        SELECT s_name AS username, 'pw_' || s_name AS pw FROM supplier
        WHERE s_suppkey % 2 = 0
        UNION ALL
        SELECT s_name AS username, 'wrong' AS pw FROM supplier
        WHERE s_suppkey % 2 = 1
        UNION ALL
        SELECT 'newuser_' || CAST(n AS VARCHAR) AS username,
               'pw_new_' || CAST(n AS VARCHAR) AS pw
        FROM range(0, 5) t(n)
    )
"""


@query(
    "login_register_if_absent",
    oracle=f"""
    WITH {_USERS_SQL}
    SELECT a.username,
           u.username IS NULL AS registered,
           (u.username IS NULL OR u.password = sha256(a.pw)) AS auth_ok
    FROM attempts a LEFT JOIN users u ON u.username = a.username
    """,
)
def login_register_if_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``/login`` flow (§3.2): point lookup per attempt; unknown
    usernames auto-register (and thereby authenticate — the
    reference's quirk, preserved and surfaced as ``registered``);
    known usernames authenticate iff the hash matches
    (``Server/main.go:110-127``). sha2 stands in for bcrypt so the
    oracle can check the whole flow."""
    sup = table(spark, sf_dir, "supplier")
    users = sup.select(
        F.col("s_name").alias("username"),
        F.sha2(F.concat(F.lit("pw_"), F.col("s_name")), 256).alias("password"),
    )
    attempts = (
        sup.filter(F.col("s_suppkey") % 2 == 0)
        .select(
            F.col("s_name").alias("username"),
            F.concat(F.lit("pw_"), F.col("s_name")).alias("pw"),
        )
        .unionByName(
            sup.filter(F.col("s_suppkey") % 2 == 1).select(
                F.col("s_name").alias("username"), F.lit("wrong").alias("pw")
            )
        )
        .unionByName(
            spark.range(0, 5).select(
                F.concat(F.lit("newuser_"), F.col("id").cast("string")).alias(
                    "username"
                ),
                F.concat(F.lit("pw_new_"), F.col("id").cast("string")).alias("pw"),
            )
        )
    )
    joined = attempts.join(users, "username", "left")
    return joined.select(
        "username",
        F.col("password").isNull().alias("registered"),
        (
            F.col("password").isNull()
            | (F.col("password") == F.sha2(F.col("pw"), 256))
        ).alias("auth_ok"),
    )


# ------------------------------------------------------------ JSON egress


@query(
    "employees_json",
    oracle=f"""
    WITH {_EMP_SQL}
    SELECT id,
           printf('{{"id":%d,"name":"%s","age":%d,"yearsofexp":%d,"salary":%d}}',
                  id, name, age, yearsofexp, salary) AS json
    FROM employee
    """,
)
def employees_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``/getemployees`` egress (S2/F12): scan → one JSON object per
    row via ``to_json(struct(...))``. All-integer/string fields so the
    serialization is engine-independent; the driver's ``.collect()``
    is the JSON-array materialization (``Server/main.go:255-256``)."""
    emp = employees(spark, sf_dir)
    return emp.select(
        "id",
        F.to_json(
            F.struct("id", "name", "age", "yearsofexp", "salary")
        ).alias("json"),
    )


@query(
    "login_response_map",
    oracle="""
    SELECT c_name AS username,
           md5(c_name) AS token,
           'server_' || CAST(CAST(('0x' || substr(md5(c_name), 1, 8)) AS BIGINT) % 2 + 1 AS VARCHAR)
               AS server_id,
           'server_id,token' AS response_keys
    FROM customer
    """,
)
def login_response_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The login response as a MAP column (SURVEY §1.4: the
    reference's ``map[string]string`` response, ``Server/main.go:151``
    -> MapType). The map is built, read back via element_at, and its
    key set listed — exercising MapType construction and access in
    the plan; the oracle checks the extracted values (DuckDB's map
    extraction semantics differ, so verification happens on the
    scalars, which is the actual contract)."""
    c = table(spark, sf_dir, "customer")
    token = F.md5("c_name")
    sid = F.concat(
        F.lit("server_"),
        (
            F.conv(F.substring(F.md5("c_name"), 1, 8), 16, 10).cast("long") % 2 + 1
        ).cast("string"),
    )
    resp = c.select(
        F.col("c_name").alias("username"),
        F.create_map(
            F.lit("token"), token, F.lit("server_id"), sid
        ).alias("response"),
    )
    return resp.select(
        "username",
        F.element_at("response", "token").alias("token"),
        F.element_at("response", "server_id").alias("server_id"),
        # Joined to one scalar: the driver's canonicalizer cannot hash
        # list-valued cells, and the key-set contract is the same.
        F.array_join(F.array_sort(F.map_keys("response")), ",").alias(
            "response_keys"
        ),
    )


@query(
    "employee_salary_history_scd2",
    oracle=f"""
    WITH {_EMP_SQL},
    versions AS (
        SELECT id, 0 AS version, salary FROM employee
        UNION ALL
        SELECT id, 1 AS version, CAST(salary + 10000 AS BIGINT) AS salary
        FROM employee WHERE id % 10 = 0
        UNION ALL
        SELECT id, 2 AS version, CAST(salary + 25000 AS BIGINT) AS salary
        FROM employee WHERE id % 20 = 0
    )
    SELECT id, version AS valid_from, salary,
           LEAD(version) OVER (PARTITION BY id ORDER BY version) AS valid_to,
           CASE WHEN LEAD(version) OVER (PARTITION BY id ORDER BY version)
                IS NULL THEN 1 ELSE 0 END AS is_current
    FROM versions
    """,
)
def employee_salary_history_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history for the salary writeback: where the
    reference's ``UPDATE employee SET salary=?`` (``Server/main.go:
    279-282``, S5) destroys the old value, this keeps every version
    as a validity interval. Two deterministic update batches (ids
    divisible by 10, then by 20) stack onto the base version; one
    ``lead()`` window per id closes each interval and flags the
    current row — the standard warehouse pattern for history-keeping
    upserts. The union is narrow and the single window partitions by
    the merge key, so history assembly parallelizes per key at any
    table size."""
    emp = employees(spark, sf_dir)
    versions = (
        emp.select("id", F.lit(0).alias("version"), "salary")
        .unionByName(
            emp.filter(F.col("id") % 10 == 0).select(
                "id",
                F.lit(1).alias("version"),
                (F.col("salary") + 10000).cast("bigint").alias("salary"),
            )
        )
        .unionByName(
            emp.filter(F.col("id") % 20 == 0).select(
                "id",
                F.lit(2).alias("version"),
                (F.col("salary") + 25000).cast("bigint").alias("salary"),
            )
        )
    )
    w = Window.partitionBy("id").orderBy("version")
    nxt = F.lead("version").over(w)
    return versions.select(
        "id",
        F.col("version").alias("valid_from"),
        "salary",
        nxt.alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )


_BCRYPT_GOLDEN = (
    ("Customer#000000000", "$2b$04$e1ibSCBwQiHZUch352.SAOe3Ro/TrTvr145jGWLSyjohrqeM029pm"),
    ("Customer#000000001", "$2b$04$EmFF5gQbbXgbsOSlBfhRtOG42krNo32DlqKecZp7v9NKXU6v0tS9i"),
    ("Customer#000000002", "$2b$04$XIClqko4mkC1IqaTxNeOROMR5OprcjMO589JnImGWbJTqPxqmIMim"),
    ("Customer#000000003", "$2b$04$QzOM4NUhur/WZsGLPsBilOw1qPUmyJMHJKBKj2TGaOaZbwvEIyZZ."),
    ("Customer#000000004", "$2b$04$l/gQ2yD0uYdSlxcVsFsPG.HoMCP7KZZaYbgPom5BQyn56c6brdjv."),
    ("Customer#000000005", "$2b$04$a52eqqiUazL37Y/uJHkCR.zv91VPWbQdnOPslVSVqfkSChHk5oJJ6"),
    ("Customer#000000006", "$2b$04$djjws9.PJX9ymtnoI0VKmui3i/ImaRVvwqy.7xFzMp39cy2J0XVWS"),
    ("Customer#000000007", "$2b$04$ze9nFd2FJJ6hBuPktbFsL.6Ea7PHRR.9MEWbr1X0kad4WpJRpzaba"),
)


@query(
    "bcrypt_login_roundtrip",
    oracle="""
    WITH golden(username, hashed) AS (VALUES
        {values}
    )
    SELECT u.username, g.hashed,
           TRUE AS verified_ok, TRUE AS rejected_bad
    FROM (SELECT c_name AS username FROM customer ORDER BY 1 LIMIT 8) u
    JOIN golden g USING (username)
    """.format(
        values=",\n        ".join(
            f"('{u}', '{h}')" for u, h in _BCRYPT_GOLDEN
        )
    ),
)
def bcrypt_login_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2 executed for REAL inside the engine (``Server/main.go:
    114,127``): hash 8 users' passwords with bcrypt at cost 4 using
    deterministic salts (md5 of the username), then verify — correct
    and a wrong password — through the same Arrow-batched UDF path
    production uses. DuckDB has no EksBlowfish, so the oracle is a
    literal golden table: the full 60-char hashes, precomputed once
    from the OpenBSD-vector-pinned implementation, joined to the same
    8 customer usernames. The driver hash-checks every byte of every
    hash — if the EksBlowfish core drifts, this row goes red.

    Cost 4 (the bcrypt minimum) keeps the pure-Python fallback fast;
    the C package, when installed, runs the identical dataflow."""
    import hashlib

    from collections.abc import Iterator as _Iter

    from .auth import _require_bcrypt
    from .bcrypt_pure import _b64_encode

    def chain(batches: _Iter[pd.DataFrame]) -> _Iter[pd.DataFrame]:
        # Resolve the implementation ON THE EXECUTOR: resolving on the
        # driver would pickle the module by name, so a cluster whose
        # executors lack the C package (or vice versa) raises
        # ImportError at task time instead of using the pure-Python
        # fallback — the fallback decision must be made where the
        # hashing runs.
        bcrypt_mod = _require_bcrypt()
        for pdf in batches:
            rows = []
            for name in pdf["username"]:
                pw = f"pw-{name}".encode()
                salt16 = hashlib.md5(name.encode()).digest()
                salt = f"$2b$04${_b64_encode(salt16, 22)}".encode()
                h = bcrypt_mod.hashpw(pw, salt)
                rows.append(
                    (
                        name,
                        h.decode(),
                        bool(bcrypt_mod.checkpw(pw, h)),
                        not bcrypt_mod.checkpw(pw + b"!", h),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["username", "hashed", "verified_ok", "rejected_bad"],
            )

    users = (
        table(spark, sf_dir, "customer")
        .select(F.col("c_name").alias("username"))
        .orderBy("username")
        .limit(8)
    )
    return users.mapInPandas(
        chain,
        schema=(
            "username string, hashed string,"
            " verified_ok boolean, rejected_bad boolean"
        ),
    )


@query(
    "jwt_auth_chain",
    oracle="""
    SELECT username,
           'eyJhbGciOiJIUzI1NiIsInR5cCI6IkpXVCJ9.' ||
           rtrim(replace(replace(base64(CAST(
               '{"username":"' || username || '","exp":1700003600}'
               AS BLOB)), '+', '-'), '/', '_'), '=') AS signing_input,
           TRUE AS valid_now, TRUE AS valid_before_expiry,
           FALSE AS valid_at_expiry, FALSE AS valid_after_expiry,
           FALSE AS valid_tampered
    FROM (SELECT c_name AS username FROM customer ORDER BY 1 LIMIT 50)
    """,
)
def jwt_auth_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3/F4/F14 executed for REAL inside the engine: mint each user's
    HS256 JWT (claims ``{username, exp}``, 1-hour TTL — ``Server/
    main.go:134-147``), then verify it five ways through the same
    Arrow-batched UDFs production uses: valid at issue time, still
    valid 1 s before expiry, rejected AT the exp instant (RFC 7519
    §4.1.4: now must be BEFORE exp), rejected 1 s after (F14 TTL
    arithmetic), and rejected when tampered. The tamper flips the
    FIRST character of the signature segment, keeping the three-part
    shape intact, so its rejection can only come from the HMAC
    compare itself (a shape-breaking tamper would fail at token
    parsing before the signature is ever checked, certifying nothing
    about the HMAC). The HMAC isn't
    SQL-expressible, but everything else is: the oracle rebuilds the
    exact RFC 7515 signing input (b64url header '.' b64url payload)
    in DuckDB and pins the five verify booleans — the signature is
    certified transitively by ``valid_now``/``valid_tampered`` and by
    the exact-token pins in pytest."""
    from .auth import jwt_sign, jwt_verify

    secret = "engine-demo-secret"
    iat = 1_700_000_000  # fixed clock -> deterministic tokens
    users = (
        table(spark, sf_dir, "customer")
        .select(F.col("c_name").alias("username"))
        .orderBy("username")
        .limit(50)
        .withColumn("iat", F.lit(iat).cast("long"))
    )
    signed = users.withColumn(
        "token", jwt_sign(F.col("username"), F.col("iat"), 3600, secret)
    )
    parts = F.split("token", "[.]")
    # Flip the FIRST character of the signature segment (its 6 bits
    # are all meaningful; the LAST b64url char also carries the
    # discarded padding bits, where an x<->y flip decodes to the SAME
    # bytes and would not tamper anything). Shape stays 3-part, so
    # rejection can only come from the HMAC compare.
    sig = F.element_at(parts, 3)
    tampered_sig = F.concat(
        F.when(F.substring(sig, 1, 1) == "x", F.lit("y")).otherwise(
            F.lit("x")
        ),
        F.expr("substring(element_at(split(token, '[.]'), 3), 2)"),
    )
    tampered = F.concat(
        F.element_at(parts, 1),
        F.lit("."),
        F.element_at(parts, 2),
        F.lit("."),
        tampered_sig,
    )
    return signed.select(
        "username",
        F.concat(
            F.element_at(parts, 1), F.lit("."), F.element_at(parts, 2)
        ).alias("signing_input"),
        jwt_verify(F.col("token"), F.col("iat"), secret)["valid"].alias(
            "valid_now"
        ),
        jwt_verify(F.col("token"), F.col("iat") + 3599, secret)["valid"].alias(
            "valid_before_expiry"
        ),
        jwt_verify(F.col("token"), F.col("iat") + 3600, secret)["valid"].alias(
            "valid_at_expiry"
        ),
        jwt_verify(F.col("token"), F.col("iat") + 3601, secret)["valid"].alias(
            "valid_after_expiry"
        ),
        jwt_verify(tampered, F.col("iat"), secret)["valid"].alias(
            "valid_tampered"
        ),
    )

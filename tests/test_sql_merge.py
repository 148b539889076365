"""SQL-text MERGE INTO front: reference-statement parity tests."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from privacy_cdc_lakehouse_spark.sql_merge import MergeSqlError, parse_merge, sql_merge
from privacy_cdc_lakehouse_spark.tables import LakeTable

# The reference's CDC merge statement, verbatim shape
# (/root/reference/jobs/merge_orders_silver.py:135-147) with CATALOG=demo.
REFERENCE_MERGE = """
MERGE INTO demo.silver.orders_current t
USING staging_orders s
ON t.order_id = s.order_id
WHEN MATCHED AND s.op = 'd' THEN DELETE
WHEN MATCHED AND s.op <> 'd' THEN UPDATE SET
  user_id = s.user_id,
  amount_eur = s.amount_eur,
  status = s.status,
  last_change_ts = s.last_change_ts
WHEN NOT MATCHED AND s.op <> 'd' THEN INSERT (order_id, user_id, amount_eur, status, last_change_ts)
VALUES (s.order_id, s.user_id, s.amount_eur, s.status, s.last_change_ts)
"""


def test_parse_reference_statement():
    p = parse_merge(REFERENCE_MERGE)
    assert p["target"] == "demo.silver.orders_current"
    assert p["source_view"] == "staging_orders"
    assert p["keys"] == ["order_id"]
    assert p["delete_cond"] == "s.op = 'd'"
    assert p["update_cond"] == "s.op <> 'd'"
    assert p["update_sets"]["status"] == "s.status"
    assert p["insert_cols"][0] == "order_id"
    assert p["insert_cond"] == "s.op <> 'd'"


def test_reference_statement_executes_three_clauses(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "sqlm"))
    schema = (
        "order_id int, user_id int, amount_eur double, status string, "
        "last_change_ts timestamp"
    )
    t.overwrite(
        spark.createDataFrame(
            [
                (1, 10, 5.0, "keep", None),
                (2, 20, 6.0, "old", None),
                (3, 30, 7.0, "to_delete", None),
            ],
            schema,
        )
    )
    spark.createDataFrame(
        [
            (2, 21, 6.5, "updated", None, "u"),
            (3, None, None, None, None, "d"),
            (4, 40, 8.0, "inserted", None, "c"),
            (5, None, None, None, None, "d"),  # delete of absent key: no-op
        ],
        schema + ", op string",
    ).createOrReplaceTempView("staging_orders")

    sql_merge(spark, REFERENCE_MERGE, {"silver.orders_current": t})

    got = sorted(
        (r["order_id"], r["user_id"], r["status"]) for r in t.read().collect()
    )
    assert got == [(1, 10, "keep"), (2, 21, "updated"), (4, 40, "inserted")]


def test_checkpoint_subquery_merge(spark, tmp_path):
    """The reference's scalar checkpoint MERGE with an inline
    (SELECT ...) source (merge_orders_silver.py:156-165)."""
    t = LakeTable(spark, str(tmp_path / "sqlm_ckpt"))
    t.overwrite(
        spark.createDataFrame(
            [("orders", 10, None)],
            "pipeline string, last_offset long, updated_at timestamp",
        )
    )
    stmt = """
    MERGE INTO demo.monitoring.cdc_checkpoints t
    USING (SELECT 'orders' AS pipeline, 42 AS last_offset) s
    ON t.pipeline = s.pipeline
    WHEN MATCHED THEN UPDATE SET
      last_offset = s.last_offset,
      updated_at = current_timestamp
    WHEN NOT MATCHED THEN INSERT (pipeline, last_offset, updated_at)
    VALUES (s.pipeline, s.last_offset, current_timestamp)
    """
    sql_merge(spark, stmt, {"monitoring.cdc_checkpoints": t})
    row = t.read().collect()[0]
    assert row["last_offset"] == 42 and row["updated_at"] is not None


def test_matched_fallthrough_keeps_target_row(spark, tmp_path):
    """A matched row firing neither clause survives with ORIGINAL
    values (SQL MERGE fall-through)."""
    t = LakeTable(spark, str(tmp_path / "sqlm_fall"))
    t.overwrite(spark.createDataFrame([(1, "orig"), (2, "orig2")], "id int, s string"))
    spark.createDataFrame(
        [(1, "new", "skip"), (2, "new2", "u")], "id int, s string, op string"
    ).createOrReplaceTempView("fall_src")
    stmt = """
    MERGE INTO tbl t USING fall_src s ON t.id = s.id
    WHEN MATCHED AND s.op = 'd' THEN DELETE
    WHEN MATCHED AND s.op = 'u' THEN UPDATE SET s = s.s
    WHEN NOT MATCHED THEN INSERT (id, s) VALUES (s.id, s.s)
    """
    sql_merge(spark, stmt, {"tbl": t})
    assert sorted(tuple(r) for r in t.read().collect()) == [
        (1, "orig"),
        (2, "new2"),
    ]


def test_no_update_clause_means_no_overwrite(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "sqlm_noupd"))
    t.overwrite(spark.createDataFrame([(1, "orig")], "id int, s string"))
    spark.createDataFrame([(1, "new"), (9, "ins")], "id int, s string")\
        .createOrReplaceTempView("noupd_src")
    stmt = """
    MERGE INTO tbl t USING noupd_src s ON t.id = s.id
    WHEN NOT MATCHED THEN INSERT (id, s) VALUES (s.id, s.s)
    """
    sql_merge(spark, stmt, {"tbl": t})
    assert sorted(tuple(r) for r in t.read().collect()) == [(1, "orig"), (9, "ins")]


def test_unparseable_statements_raise():
    with pytest.raises(MergeSqlError):
        parse_merge("MERGE INTO t USING s ON x WHEN MATCHED THEN DELETE")
    with pytest.raises(MergeSqlError):
        parse_merge(
            "MERGE INTO a t USING b s ON t.k = s.other "
            "WHEN MATCHED THEN DELETE"
        )
    with pytest.raises(MergeSqlError):
        parse_merge("SELECT 1")


def test_matched_clause_statement_order(spark, tmp_path):
    """SQL MERGE fires the FIRST matching WHEN MATCHED clause in
    statement order: with overlapping conditions, UPDATE-before-DELETE
    must update the doubly-matching row, DELETE-before-UPDATE must
    delete it."""
    rows = [(1, "both"), (2, "del_only"), (3, "upd_only"), (4, "neither")]
    src = [
        (1, "X", "u", "d"),   # fires both conditions
        (2, "X", "-", "d"),   # delete cond only
        (3, "X", "u", "-"),   # update cond only
        (4, "X", "-", "-"),   # neither -> fall-through
    ]

    def run(stmt_clauses: str) -> list[tuple]:
        t = LakeTable(spark, str(tmp_path / stmt_clauses[:12].replace(" ", "_")))
        t.overwrite(spark.createDataFrame(rows, "id int, s string"))
        spark.createDataFrame(
            src, "id int, s string, u string, d string"
        ).createOrReplaceTempView("order_src")
        sql_merge(
            spark,
            f"MERGE INTO tbl t USING order_src s ON t.id = s.id\n{stmt_clauses}",
            {"tbl": t},
        )
        return sorted(tuple(r) for r in t.read().collect())

    upd_first = run(
        "WHEN MATCHED AND s.u = 'u' THEN UPDATE SET s = s.s\n"
        "WHEN MATCHED AND s.d = 'd' THEN DELETE"
    )
    # id=1 matches both -> UPDATE wins (first clause); id=2 deleted.
    assert upd_first == [(1, "X"), (3, "X"), (4, "neither")]

    del_first = run(
        "WHEN MATCHED AND s.d = 'd' THEN DELETE\n"
        "WHEN MATCHED AND s.u = 'u' THEN UPDATE SET s = s.s"
    )
    # id=1 matches both -> DELETE wins.
    assert del_first == [(3, "X"), (4, "neither")]


def test_unconditional_update_before_delete_shadows_delete(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "sqlm_shadow"))
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string"))
    spark.createDataFrame([(1, "X", "d"), (2, "Y", "-")], "id int, s string, op string")\
        .createOrReplaceTempView("shadow_src")
    stmt = """
    MERGE INTO tbl t USING shadow_src s ON t.id = s.id
    WHEN MATCHED THEN UPDATE SET s = s.s
    WHEN MATCHED AND s.op = 'd' THEN DELETE
    """
    sql_merge(spark, stmt, {"tbl": t})
    # unconditional UPDATE is first -> DELETE never fires
    assert sorted(tuple(r) for r in t.read().collect()) == [(1, "X"), (2, "Y")]


def test_insert_unlisted_columns_are_null(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "sqlm_nullins"))
    t.overwrite(
        spark.createDataFrame([(1, "a", 1.0)], "id int, s string, v double")
    )
    spark.createDataFrame([(2, "b", 9.9)], "id int, s string, v double")\
        .createOrReplaceTempView("nullins_src")
    stmt = """
    MERGE INTO tbl t USING nullins_src s ON t.id = s.id
    WHEN NOT MATCHED THEN INSERT (id, s) VALUES (s.id, s.s)
    """
    sql_merge(spark, stmt, {"tbl": t})
    rows = {r["id"]: (r["s"], r["v"]) for r in t.read().collect()}
    assert rows[2] == ("b", None)  # v unlisted -> NULL, not source 9.9


# ----------------------------- sql_dml ---------------------------------------


def _fresh(spark, tmp_path, name):
    t = LakeTable(spark, str(tmp_path / name))
    t.overwrite(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "id int, s string, v double",
        )
    )
    return t


def test_sql_dml_delete_where(spark, tmp_path):
    from privacy_cdc_lakehouse_spark.sql_merge import sql_dml

    t = _fresh(spark, tmp_path, "dml_del")
    sql_dml(spark, "DELETE FROM demo.silver.tt WHERE v >= 20.0", {"silver.tt": t})
    assert sorted(r["id"] for r in t.read().collect()) == [1]


def test_sql_dml_update_set_where(spark, tmp_path):
    from privacy_cdc_lakehouse_spark.sql_merge import sql_dml

    t = _fresh(spark, tmp_path, "dml_upd")
    sql_dml(
        spark,
        "UPDATE tt SET v = v * 2, s = upper(s) WHERE id <= 2",
        {"tt": t},
    )
    got = {r["id"]: (r["s"], r["v"]) for r in t.read().collect()}
    assert got == {1: ("A", 20.0), 2: ("B", 40.0), 3: ("c", 30.0)}


def test_sql_dml_truncate_and_time_travel(spark, tmp_path):
    from privacy_cdc_lakehouse_spark.sql_merge import sql_dml

    t = _fresh(spark, tmp_path, "dml_trunc")
    v = sql_dml(spark, "TRUNCATE TABLE tt", {"tt": t})
    # truncated table stays queryable (0 rows, schema intact) ...
    assert t.read(version=v).count() == 0
    assert t.read().columns == ["id", "s", "v"]
    assert sorted(r["id"] for r in t.read(version=v - 1).collect()) == [1, 2, 3]
    # ... and the truncate-then-reload lifecycle works end to end
    sql_dml(
        spark,
        "INSERT INTO tt SELECT 9 AS id, 'z' AS s, 90.0 AS v",
        {"tt": t},
    )
    assert [tuple(r) for r in t.read().collect()] == [(9, "z", 90.0)]


def test_sql_dml_delete_without_where_empties_table(spark, tmp_path):
    from privacy_cdc_lakehouse_spark.sql_merge import sql_dml

    t = _fresh(spark, tmp_path, "dml_delall")
    sql_dml(spark, "DELETE FROM tt", {"tt": t})
    assert t.read().count() == 0  # rewrite commits an empty data dir


def test_sql_dml_dispatches_merge_and_rejects_unknown(spark, tmp_path):
    from privacy_cdc_lakehouse_spark.sql_merge import sql_dml

    t = _fresh(spark, tmp_path, "dml_merge")
    spark.createDataFrame([(2, "B2", 99.0), (4, "d", 40.0)], "id int, s string, v double").createOrReplaceTempView("dml_src")
    sql_dml(
        spark,
        """MERGE INTO tt t USING dml_src s ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET s = s.s, v = s.v
           WHEN NOT MATCHED THEN INSERT (id, s, v) VALUES (s.id, s.s, s.v)""",
        {"tt": t},
    )
    got = {r["id"]: r["s"] for r in t.read().collect()}
    assert got == {1: "a", 2: "B2", 3: "c", 4: "d"}
    with pytest.raises(MergeSqlError):
        sql_dml(spark, "DROP TABLE tt", {"tt": t})
    with pytest.raises(MergeSqlError):
        sql_dml(spark, "DELETE FROM nope WHERE id = 1", {"tt": t})


def test_sql_dml_insert_select_and_values(spark, tmp_path):
    from privacy_cdc_lakehouse_spark.sql_merge import sql_dml

    t = _fresh(spark, tmp_path, "dml_ins")
    sql_dml(
        spark,
        "INSERT INTO tt SELECT 4 AS id, 'd' AS s, 40.0 AS v",
        {"tt": t},
    )
    sql_dml(
        spark,
        "INSERT INTO tt VALUES (5, 'e', CAST(50.0 AS DOUBLE)) AS x(id, s, v)",
        {"tt": t},
    )
    assert sorted(r["id"] for r in t.read().collect()) == [1, 2, 3, 4, 5]
    with pytest.raises(MergeSqlError):
        sql_dml(spark, "INSERT INTO tt SELECT 6 AS id", {"tt": t})


def test_sql_dml_update_where_inside_string_literal(spark, tmp_path):
    """The SET/WHERE split is quote-aware: a 'where' inside a string
    literal must not truncate the SET list (round-5 review finding)."""
    from privacy_cdc_lakehouse_spark.sql_merge import sql_dml

    t = _fresh(spark, tmp_path, "dml_strwhere")
    sql_dml(
        spark,
        "UPDATE tt SET s = 'explains where clauses' WHERE id = 1",
        {"tt": t},
    )
    got = {r["id"]: r["s"] for r in t.read().collect()}
    assert got[1] == "explains where clauses" and got[2] == "b"


def test_sql_dml_insert_positional_forms(spark, tmp_path):
    """Standard positional INSERT shapes: bare VALUES (no alias) and a
    column list with unlisted columns NULL-filled."""
    from privacy_cdc_lakehouse_spark.sql_merge import sql_dml

    t = _fresh(spark, tmp_path, "dml_positional")
    sql_dml(spark, "INSERT INTO tt VALUES (6, 'f', 60.0)", {"tt": t})
    sql_dml(spark, "INSERT INTO tt (id, s) VALUES (7, 'g')", {"tt": t})
    got = {r["id"]: (r["s"], r["v"]) for r in t.read().collect()}
    assert got[6] == ("f", 60.0)
    assert got[7] == ("g", None)


def test_lsh_index_param_mismatch_raises(spark, sf_dir):
    """An lsh_index artifact built with different planes must fail
    loudly instead of silently degrading recall."""
    from py4j.protocol import Py4JJavaError

    from privacy_cdc_lakehouse_spark.operators import similarity as sim
    from privacy_cdc_lakehouse_spark.sources.fixtures import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    idx = sim.lsh_index(emb, planes=3, tables=2)
    with pytest.raises(Exception) as ei:
        sim.lsh_topk(
            emb, queries, k=3, planes=4, tables=2, corpus_index=idx
        ).collect()
    assert "lsh_index artifact" in str(ei.value)


def test_merge_without_insert_clause_ignores_unmatched(spark, tmp_path):
    """SQL MERGE with no WHEN NOT MATCHED clause must IGNORE unmatched
    source rows (round-5 review: the executor's default insert-all was
    leaking through, inserting every unmatched row)."""
    t = LakeTable(spark, str(tmp_path / "no_ins"))
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string"))
    spark.createDataFrame(
        [(2, "B", "u"), (9, "ghost", "u")], "id int, s string, op string"
    ).createOrReplaceTempView("noins_src")
    sql_merge(
        spark,
        """MERGE INTO t t USING noins_src s ON t.id = s.id
           WHEN MATCHED AND s.op = 'd' THEN DELETE
           WHEN MATCHED AND s.op = 'u' THEN UPDATE SET s = s.s""",
        {"t": t},
    )
    assert sorted(tuple(r) for r in t.read().collect()) == [(1, "a"), (2, "B")]


def test_partially_unparseable_when_clause_raises():
    """One valid clause must not mask an unparseable one — partial
    execution of a MERGE statement is refused."""
    # (WHEN NOT MATCHED BY SOURCE became a supported clause in round 6 —
    # the unparseable specimen is now a malformed BY TARGET variant.)
    with pytest.raises(MergeSqlError, match="could not be parsed"):
        parse_merge(
            "MERGE INTO t t USING s s ON t.k = s.k "
            "WHEN MATCHED THEN DELETE "
            "WHEN NOT MATCHED BY TARGET THEN DELETE"
        )
    with pytest.raises(MergeSqlError, match="could not be parsed"):
        parse_merge(
            "MERGE INTO t t USING s s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE status = 1 "  # missing SET
            "WHEN NOT MATCHED THEN INSERT (k) VALUES (s.k)"
        )


def test_on_equals_does_not_match_null_keys(spark, tmp_path):
    """ON t.k = s.k (not <=>): a NULL-keyed target row must survive and
    a NULL-keyed source row must be INSERTED (SQL: NULL = NULL is not
    true); with <=> they match."""
    def run(op):
        t = LakeTable(spark, str(tmp_path / f"nullkey_{op == '='}"))
        t.overwrite(
            spark.createDataFrame([(None, "tnull"), (1, "one")], "id int, s string")
        )
        spark.createDataFrame(
            [(None, "snull")], "id int, s string"
        ).createOrReplaceTempView("nullkey_src")
        sql_merge(
            spark,
            f"""MERGE INTO t t USING nullkey_src s ON t.id {op} s.id
               WHEN MATCHED THEN UPDATE SET s = s.s
               WHEN NOT MATCHED THEN INSERT (id, s) VALUES (s.id, s.s)""",
            {"t": t},
        )
        return sorted([(r["id"], r["s"]) for r in t.read().collect()], key=str)

    assert run("=") == sorted(
        [(None, "tnull"), (None, "snull"), (1, "one")], key=str
    )
    assert run("<=>") == sorted([(None, "snull"), (1, "one")], key=str)


def test_alias_prefix_inside_string_literal_not_rewritten(spark, tmp_path):
    """An alias-shaped prefix inside a quoted value ('o.box 3') must
    reach the table verbatim — rewriting it would corrupt data."""
    t = LakeTable(spark, str(tmp_path / "lit_alias"))
    t.overwrite(spark.createDataFrame([(1, "x")], "id int, note string"))
    spark.createDataFrame([(1, "y")], "id int, note string")\
        .createOrReplaceTempView("lit_src")
    sql_merge(
        spark,
        """MERGE INTO t AS o USING lit_src AS n ON o.id = n.id
           WHEN MATCHED THEN UPDATE SET note = 'o.box 3, n. station'""",
        {"t": t},
    )
    assert t.read().collect()[0]["note"] == "o.box 3, n. station"


def test_aliasless_target_and_quoted_paren_subquery(spark, tmp_path):
    """An alias-less MERGE target resolves correctly, and a ')' inside
    a string literal in the USING subquery doesn't truncate it."""
    t = LakeTable(spark, str(tmp_path / "aliasless"))
    t.overwrite(spark.createDataFrame([(1, "a")], "id int, s string"))
    sql_merge(
        spark,
        """MERGE INTO demo.silver.tt USING
           (SELECT 2 AS id, ')' AS s) src ON tt.id = src.id
           WHEN NOT MATCHED THEN INSERT (id, s) VALUES (src.id, src.s)""",
        {"silver.tt": t},
    )
    assert sorted((r["id"], r["s"]) for r in t.read().collect()) == [
        (1, "a"),
        (2, ")"),
    ]


def test_sql_dml_update_backslash_escaped_quote(spark, tmp_path):
    """Spark SQL backslash-escaped quotes inside a SET literal must not
    break the top-level comma/WHERE split."""
    from privacy_cdc_lakehouse_spark.sql_merge import sql_dml

    t = _fresh(spark, tmp_path, "dml_escape")
    sql_dml(
        spark,
        "UPDATE tt SET s = 'it\\'s, fine where it is', v = v + 1 WHERE id = 1",
        {"tt": t},
    )
    got = {r["id"]: (r["s"], r["v"]) for r in t.read().collect()}
    assert got[1] == ("it's, fine where it is", 11.0)
    assert got[2] == ("b", 20.0)


def test_alias_collision_with_internal_names_single_pass():
    """A target aliased 's' (colliding with the internal source name)
    must not have its references re-rewritten into 't.' by a second
    substitution pass — each alias token is rewritten exactly once."""
    p = parse_merge(
        """
        MERGE INTO demo.silver.orders_current s
        USING staging_orders src
        ON s.order_id = src.order_id
        WHEN MATCHED AND src.op = 'd' THEN DELETE
        WHEN MATCHED THEN UPDATE SET status = src.status
        WHEN NOT MATCHED THEN INSERT (order_id, status)
        VALUES (src.order_id, src.status)
        """
    )
    # src.* must land as s.* (source), target alias 's' as t.* — and the
    # replacement output 's.' must never be re-rewritten to 't.'.
    assert p["keys"] == ["order_id"]
    assert p["delete_cond"] == "s.op = 'd'"
    assert p["update_sets"]["status"] == "s.status"
    assert p["insert_vals"][p["insert_cols"].index("order_id")] == "s.order_id"


def test_alias_collision_source_named_t():
    """Source aliased 't' (internal target name): rewritten to s.* in one
    pass, never bounced back by the target substitution."""
    p = parse_merge(
        """
        MERGE INTO tgt USING stage t
        ON tgt.k = t.k
        WHEN MATCHED AND t.op = 'd' THEN DELETE
        """
    )
    assert p["delete_cond"] == "s.op = 'd'"


def test_equal_aliases_rejected():
    """Identical (case-insensitive) target/source aliases are ambiguous
    and must error out, never silently commit — whether the ON parser or
    the alias normalizer catches it first."""
    with pytest.raises(MergeSqlError):
        parse_merge(
            "MERGE INTO tgt x USING stage X ON x.k = x.k "
            "WHEN MATCHED THEN DELETE"
        )


# ---------------- Delta-SQL maintenance verbs (round 6) -----------------


def _seed_sql_table(spark, tmp_path, name="mt"):
    from privacy_cdc_lakehouse_spark.tables import LakeTable

    t = LakeTable(spark, str(tmp_path / name))
    t.overwrite(
        spark.createDataFrame(
            [(i, float(i % 7), "x" * (i % 5)) for i in range(50)],
            "id int, v double, s string",
        )
    )
    return t


def test_sql_optimize_and_zorder(spark, tmp_path):
    from privacy_cdc_lakehouse_spark.sql_merge import sql_dml

    t = _seed_sql_table(spark, tmp_path)
    t.append(spark.createDataFrame([(99, 1.0, "y")], "id int, v double, s string"))
    before = sorted(tuple(r) for r in t.read().collect())
    v = sql_dml(spark, "OPTIMIZE demo.scratch.mt", {"scratch.mt": t})
    assert v == t.current_version()
    assert sorted(tuple(r) for r in t.read().collect()) == before
    # ZORDER form drives the multi-dim clustering path
    v2 = sql_dml(
        spark, "OPTIMIZE mt ZORDER BY (id, v)", {"mt": t, "scratch.mt": t}
    )
    assert v2 == v + 1
    assert sorted(tuple(r) for r in t.read().collect()) == before


def test_sql_vacuum_retain_versions(spark, tmp_path):
    from privacy_cdc_lakehouse_spark.sql_merge import sql_dml

    t = _seed_sql_table(spark, tmp_path)
    t.overwrite(spark.createDataFrame([(1, 1.0, "a")], "id int, v double, s string"))
    # retain everything: nothing reclaimed
    assert sql_dml(spark, "VACUUM mt RETAIN 10 VERSIONS", {"mt": t}) == 0
    # default retain=1 with age guard zeroed via the API path is
    # covered in test_tables; here assert the statement parses + routes
    assert sql_dml(spark, "VACUUM mt", {"mt": t}) == 0  # age guard holds


def test_sql_describe_history(spark, tmp_path):
    from privacy_cdc_lakehouse_spark.sql_merge import sql_dml

    t = _seed_sql_table(spark, tmp_path)
    t.truncate()
    df = sql_dml(spark, "DESCRIBE HISTORY mt", {"mt": t})
    rows = [(r["version"], r["op"]) for r in df.orderBy("version").collect()]
    assert rows == [(1, "overwrite"), (2, "truncate")]


def test_sql_describe_detail(spark, tmp_path):
    from privacy_cdc_lakehouse_spark.sql_merge import sql_dml

    t = _seed_sql_table(spark, tmp_path)
    t.delete_where("id = 1", mode="merge_on_read")
    row = sql_dml(spark, "DESCRIBE DETAIL mt", {"mt": t}).collect()[0]
    assert row["version"] == 2
    assert row["n_data_dirs"] == 1
    assert row["n_files"] >= 1 and row["size_bytes"] > 0
    assert row["n_dirs_with_excludes"] == 1  # the MoR tombstone
    assert row["has_change_data"] is False


def test_sql_merge_records_change_feed(spark, tmp_path):
    from privacy_cdc_lakehouse_spark.sql_merge import sql_merge
    from privacy_cdc_lakehouse_spark.tables import CHANGE_TYPE_COL

    t = LakeTable(spark, str(tmp_path / "sqlm_cdf"))
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string"))
    spark.createDataFrame(
        [(2, "b2", "u"), (3, "c", "c")], "id int, s string, op string"
    ).createOrReplaceTempView("cdf_src")
    v = sql_merge(
        spark,
        """MERGE INTO tbl t USING cdf_src s ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET s = s.s
           WHEN NOT MATCHED THEN INSERT (id, s) VALUES (s.id, s.s)""",
        {"tbl": t},
        write_change_data=True,
    )
    feed = sorted(
        tuple(r)
        for r in t.read_changes(v, v).select(CHANGE_TYPE_COL, "id", "s").collect()
    )
    assert feed == [
        ("insert", 3, "c"),
        ("update_postimage", 2, "b2"),
        ("update_preimage", 2, "b"),
    ]


def test_sql_script_runs_statements_in_order(spark, tmp_path):
    from privacy_cdc_lakehouse_spark.sql_merge import split_statements, sql_script

    t = _seed_sql_table(spark, tmp_path)
    results = sql_script(
        spark,
        """
        -- seed is 50 rows; double v for low ids, then delete the rest
        UPDATE mt SET v = v * 2 WHERE id < 10;
        DELETE FROM mt WHERE id >= 10;
        DESCRIBE HISTORY mt
        """,
        {"mt": t},
    )
    assert results[0] == 2 and results[1] == 3  # versions in order
    rows = sorted((r["id"], r["v"]) for r in t.read().collect())
    assert rows == [(i, float(i % 7) * 2) for i in range(10)]
    assert [r["op"] for r in results[2].orderBy("version").collect()] == [
        "overwrite", "update", "delete",
    ]
    # splitter: quoted/parenthesized semicolons don't split
    stmts = split_statements(
        "UPDATE t SET s = 'a;b' WHERE id IN (1, 2);\nDELETE FROM t"
    )
    assert len(stmts) == 2 and stmts[0].endswith("(1, 2)")


NMBS_MERGE = """
MERGE INTO tgt t
USING src s
ON t.id = s.id
WHEN MATCHED THEN UPDATE SET v = s.v
WHEN NOT MATCHED THEN INSERT (id, v, state) VALUES (s.id, s.v, 'new')
WHEN NOT MATCHED BY SOURCE AND t.state = 'old' THEN DELETE
WHEN NOT MATCHED BY SOURCE THEN UPDATE SET state = 'stale'
"""


def test_parse_not_matched_by_source_clauses():
    p = parse_merge(NMBS_MERGE)
    assert p["nmbs_delete_cond"] == "t.state = 'old'"
    assert p["nmbs_update_sets"] == {"state": "'stale'"}
    assert p["nmbs_update_cond"] is None
    assert p["nmbs_order"] == ["delete", "update"]
    # statement's matched/unmatched clauses unaffected
    assert p["update_sets"] == {"v": "s.v"}
    assert p["insert_cols"] == ["id", "v", "state"]


def test_parse_nmbs_rejects_source_references_and_bad_kinds():
    with pytest.raises(MergeSqlError):
        parse_merge(
            "MERGE INTO tgt t USING src s ON t.id = s.id "
            "WHEN NOT MATCHED BY SOURCE AND s.v > 0 THEN DELETE"
        )
    with pytest.raises(MergeSqlError):
        parse_merge(
            "MERGE INTO tgt t USING src s ON t.id = s.id "
            "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = s.v"
        )
    with pytest.raises(MergeSqlError):
        parse_merge(
            "MERGE INTO tgt t USING src s ON t.id = s.id "
            "WHEN MATCHED BY SOURCE THEN DELETE"
        )
    with pytest.raises(MergeSqlError):
        parse_merge(
            "MERGE INTO tgt t USING src s ON t.id = s.id "
            "WHEN NOT MATCHED BY SOURCE THEN INSERT (id) VALUES (1)"
        )
    # a quoted 's.' lookalike is NOT a source reference
    p = parse_merge(
        "MERGE INTO tgt t USING src s ON t.id = s.id "
        "WHEN NOT MATCHED BY SOURCE AND t.state = 's.fake' THEN DELETE"
    )
    assert p["nmbs_delete_cond"] == "t.state = 's.fake'"


def test_sql_merge_executes_nmbs_retention(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "nmbs_sql"))
    t.overwrite(
        spark.createDataFrame(
            [
                (1, 1.0, "live"),
                (2, 2.0, "old"),
                (3, 3.0, "live"),
            ],
            "id int, v double, state string",
        )
    )
    spark.createDataFrame(
        [(1, 1.5), (9, 9.0)], "id int, v double"
    ).createOrReplaceTempView("src")
    sql_merge(spark, NMBS_MERGE, {"tgt": t})
    rows = sorted(tuple(r) for r in t.read().collect())
    assert rows == [
        (1, 1.5, "live"),      # matched update
        (3, 3.0, "stale"),     # NMBS update (delete didn't fire)
        (9, 9.0, "new"),       # insert
    ]                           # id=2 NMBS-deleted


def test_sql_merge_nmbs_statement_order_masks_delete(spark, tmp_path):
    """UPDATE written before DELETE: a row satisfying both NMBS
    conditions must be UPDATED (SQL fires the first matching clause)."""
    t = LakeTable(spark, str(tmp_path / "nmbs_order"))
    t.overwrite(
        spark.createDataFrame(
            [(1, "both"), (2, "del_only")], "id int, state string"
        )
    )
    spark.createDataFrame([(99, "x")], "id int, state string").createOrReplaceTempView(
        "src2"
    )
    stmt = """
    MERGE INTO tgt t USING src2 s ON t.id = s.id
    WHEN NOT MATCHED BY SOURCE AND t.state = 'both' THEN UPDATE SET state = 'updated'
    WHEN NOT MATCHED BY SOURCE AND t.state IN ('both', 'del_only') THEN DELETE
    """
    sql_merge(spark, stmt, {"tgt": t})
    rows = sorted(tuple(r) for r in t.read().collect())
    # id=1 updated (clause order), id=2 deleted; the unmatched source
    # row is IGNORED — the statement has no WHEN NOT MATCHED clause.
    assert rows == [(1, "updated")]


def test_sql_alter_table_tblproperties_bloom_roundtrip(spark, tmp_path):
    from privacy_cdc_lakehouse_spark.sql_merge import sql_dml

    t = LakeTable(spark, str(tmp_path / "props_sql"))
    sql_dml(
        spark,
        "ALTER TABLE tgt SET TBLPROPERTIES ("
        "'bloom.columns' = 'id,name', 'bloom.bits' = '4096', 'owner' = 'dq')",
        {"tgt": t},
    )
    assert t.properties() == {
        "bloom.columns": ["id", "name"],
        "bloom.bits": 4096,
        "owner": "dq",
    }
    t.append(
        spark.createDataFrame(
            [(i, f"n{i}") for i in (0, 2, 4)], "id long, name string"
        ).coalesce(1)
    )
    # the committed file carries a bloom the reader prunes on
    assert t.scan_files(("id", "=", 3)) == (1, 0)
    assert t.scan_files(("id", "=", 2)) == (1, 1)
    sql_dml(spark, "ALTER TABLE tgt UNSET TBLPROPERTIES ('owner')", {"tgt": t})
    assert "owner" not in t.properties()
    assert t.properties()["bloom.columns"] == ["id", "name"]


def test_sql_restore_table_version_as_of(spark, tmp_path):
    from privacy_cdc_lakehouse_spark.sql_merge import sql_dml

    t = LakeTable(spark, str(tmp_path / "restore_sql"))
    t.overwrite(spark.createDataFrame([(1,)], "id int"))
    v1 = t.current_version()
    t.append(spark.createDataFrame([(2,)], "id int"))
    sql_dml(spark, f"RESTORE TABLE tgt TO VERSION AS OF {v1}", {"tgt": t})
    assert [r["id"] for r in t.read().collect()] == [1]
    assert t.history()[0]["op"] == "restore"


def test_sql_time_travel_select(spark, tmp_path):
    """Delta-SQL parity: SELECT * FROM t VERSION AS OF n and
    TIMESTAMP AS OF epoch read historical snapshots."""
    import time as _time

    from privacy_cdc_lakehouse_spark.sql_merge import sql_dml
    from privacy_cdc_lakehouse_spark.tables import LakeTable

    t = LakeTable(spark, str(tmp_path / "tt_sql"))
    t.overwrite(spark.createDataFrame([(1, "a")], "id int, s string"))
    ts_between = _time.time()
    _time.sleep(0.05)
    t.append(spark.createDataFrame([(2, "b")], "id int, s string"))

    v1 = sql_dml(spark, "SELECT * FROM tgt VERSION AS OF 1", {"tgt": t})
    assert [tuple(r) for r in v1.collect()] == [(1, "a")]
    cur = sql_dml(
        spark, f"SELECT * FROM tgt VERSION AS OF {t.current_version()}",
        {"tgt": t},
    )
    assert sorted(tuple(r) for r in cur.collect()) == [(1, "a"), (2, "b")]
    old = sql_dml(
        spark, f"SELECT * FROM tgt TIMESTAMP AS OF {ts_between}", {"tgt": t}
    )
    assert [tuple(r) for r in old.collect()] == [(1, "a")]

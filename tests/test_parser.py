"""Tests for the SQL analysis services (no Spark session needed)."""

import pytest

from bruin_spark.parser import (
    add_limit,
    extract_ctes,
    extract_select,
    freeze_time,
    is_single_select,
    missing_dependencies,
    prepend_ctes,
    rename_tables,
    select_from_cte,
    split_statements,
    used_tables,
)


def test_used_tables_basic():
    assert used_tables("SELECT * FROM a JOIN s.b ON a.id = b.id") == ["a", "s.b"]


def test_used_tables_excludes_ctes():
    sql = "WITH x AS (SELECT * FROM real1), y AS (SELECT * FROM x) SELECT * FROM y JOIN real2 USING (id)"
    assert used_tables(sql) == ["real1", "real2"]


def test_used_tables_subquery_and_commas():
    sql = "SELECT * FROM a, b WHERE a.id IN (SELECT id FROM c)"
    assert used_tables(sql) == ["a", "b", "c"]


def test_used_tables_ignores_strings_comments():
    sql = "SELECT 'from fake', x -- from c1\nFROM real /* from c2 */"
    assert used_tables(sql) == ["real"]


def test_rename_tables():
    sql = "SELECT * FROM a JOIN dev.b b2 ON a.id = b2.id"
    out = rename_tables(sql, {"a": "dev.a", "dev.b": "prod.b"})
    assert out == "SELECT * FROM dev.a JOIN prod.b b2 ON a.id = b2.id"


def test_rename_preserves_cte_refs():
    sql = "WITH a AS (SELECT 1) SELECT * FROM a"
    assert rename_tables(sql, {"a": "other"}) == sql


def test_add_limit_appends():
    assert add_limit("SELECT * FROM t", 10) == "SELECT * FROM t LIMIT 10"


def test_add_limit_overrides_existing():
    assert add_limit("SELECT * FROM t LIMIT 99", 10) == "SELECT * FROM t LIMIT 10"


def test_add_limit_ignores_nested_limit():
    sql = "SELECT * FROM (SELECT * FROM t LIMIT 5) s"
    assert add_limit(sql, 10).endswith("LIMIT 10")
    assert "LIMIT 5" in add_limit(sql, 10)


def test_freeze_time():
    out = freeze_time(
        "SELECT now(), CURRENT_TIMESTAMP, CURRENT_DATE FROM t", "2024-03-01 12:00:00"
    )
    assert out == (
        "SELECT CAST('2024-03-01 12:00:00' AS TIMESTAMP), "
        "CAST('2024-03-01 12:00:00' AS TIMESTAMP), "
        "CAST('2024-03-01' AS DATE) FROM t"
    )


def test_freeze_time_leaves_args_fn():
    sql = "SELECT date_trunc('day', x) FROM t"
    assert freeze_time(sql, "2024-01-01 00:00:00") == sql


def test_split_statements():
    assert split_statements("SELECT 1; SELECT ';'; -- x\nSELECT 2") == [
        "SELECT 1",
        "SELECT ';'",
        "-- x\nSELECT 2",
    ]


def test_is_single_select():
    assert is_single_select("SELECT 1")
    assert is_single_select("WITH x AS (SELECT 1) SELECT * FROM x")
    assert not is_single_select("SELECT 1; SELECT 2")
    assert not is_single_select("DROP TABLE t")


def test_extract_ctes():
    sql = "WITH a AS (SELECT 1 AS x), b AS (SELECT * FROM a) SELECT * FROM b"
    assert extract_ctes(sql) == {"a": "SELECT 1 AS x", "b": "SELECT * FROM a"}


def test_extract_ctes_nested_parens():
    sql = "WITH a AS (SELECT count(*) FROM (SELECT 1) s) SELECT * FROM a"
    assert extract_ctes(sql) == {"a": "SELECT count(*) FROM (SELECT 1) s"}


def test_select_from_cte():
    sql = "WITH a AS (SELECT 1 AS x), b AS (SELECT x + 1 AS y FROM a) SELECT max(y) FROM b"
    out = select_from_cte(sql, "a")
    assert out == "WITH a AS (SELECT 1 AS x) SELECT * FROM a"
    out_b = select_from_cte(sql, "b")
    assert out_b.endswith("SELECT * FROM b")


def test_prepend_ctes_no_with():
    out = prepend_ctes("SELECT * FROM ups", {"ups": "SELECT 1 AS id"})
    assert out == "WITH ups AS (SELECT 1 AS id) SELECT * FROM ups"


def test_prepend_ctes_merges_and_shadows():
    sql = "WITH mid AS (SELECT * FROM ups) SELECT * FROM mid"
    out = prepend_ctes(sql, {"ups": "SELECT 1 AS id"})
    assert out == (
        "WITH ups AS (SELECT 1 AS id), mid AS (SELECT * FROM ups) SELECT * FROM mid"
    )
    shadowed = prepend_ctes(sql, {"mid": "SELECT 2 AS id"})
    assert shadowed == "WITH mid AS (SELECT 2 AS id) SELECT * FROM mid"


def test_missing_dependencies():
    sql = "SELECT * FROM known1 JOIN unknown_ext JOIN known2"
    got = missing_dependencies(sql, declared=["known1"], known_assets=["known1", "known2"])
    assert got == ["known2"]


def test_column_lineage_simple():
    from bruin_spark.parser.sqlutil import column_lineage

    out = column_lineage("SELECT a.x, b.y AS why, SUM(z) AS total, 1 AS one FROM a JOIN b")
    by_name = {o["name"]: o["upstream"] for o in out}
    assert by_name["x"] == [{"table": "a", "column": "x"}]
    assert by_name["why"] == [{"table": "b", "column": "y"}]
    assert by_name["total"] == [{"table": "", "column": "z"}]
    assert by_name["one"] == []


def test_column_lineage_with_cte_and_expression():
    from bruin_spark.parser.sqlutil import column_lineage

    out = column_lineage("WITH c AS (SELECT 1) SELECT c.v + d.w AS s FROM c, d")
    assert out == [
        {"name": "s", "upstream": [{"table": "c", "column": "v"}, {"table": "d", "column": "w"}]}
    ]


def test_column_lineage_case_expression():
    from bruin_spark.parser.sqlutil import column_lineage

    out = column_lineage(
        "SELECT CASE WHEN t.status = 'x' THEN t.a ELSE t.b END AS picked FROM t"
    )
    assert out[0]["name"] == "picked"
    cols = {u["column"] for u in out[0]["upstream"]}
    assert cols == {"status", "a", "b"}


def test_split_statements_backslash_escaped_quote():
    from bruin_spark.parser.sqlutil import split_statements

    assert split_statements(r"SELECT 'a\'b;c' AS x") == [r"SELECT 'a\'b;c' AS x"]


def test_select_from_cte_preserves_recursive():
    from bruin_spark.parser.sqlutil import select_from_cte

    sql = "WITH RECURSIVE r AS (SELECT 1 AS n UNION ALL SELECT n+1 FROM r WHERE n < 3) SELECT max(n) FROM r"
    out = select_from_cte(sql, "r")
    assert out.upper().startswith("WITH RECURSIVE")


def test_used_tables_reference_go_table():
    """The reference's Go-side UsedTables cases
    (pkg/sqlparser/parser_test.go TestSqlParser_GetTables): DDL targets
    count, USING joins, repeated aliases, unions, case preserved."""
    assert used_tables(
        """
        select * from table1
        join (select * from (select * from table2) t2) t3 using(a)
        """
    ) == ["table1", "table2"]
    assert used_tables(
        """
        select * from table1
        join (select * from (select * from table2) t2) t2 using(a)
        join (select * from (select * from table3) t2) t3 using(b)
        """
    ) == ["table1", "table2", "table3"]
    assert used_tables(
        "select * from table1 union all select * from table2 "
        "union all select * from table3"
    ) == ["table1", "table2", "table3"]
    assert used_tables(
        """with t1 as (select * from table1 join table2 using(a)),
        t2 as (select * from table2 left join table1 using(a))
        select t1.*, t2.b as b2 from t1 join t2 using(a)"""
    ) == ["table1", "table2"]
    assert used_tables(
        """SELECT * from raw.Bookings as bookings
        inner join raw.Sessions as sessions on bookings.SessionId = sessions.Id
        inner join dashboard.users as coaches on Coaches.Id = bookings.CoachId
        inner join raw.Languages as languages on bookings.LanguageId = languages.Id
        inner join raw.Programmes as programmes on Bookings.ProgrammeId = Programmes.Id
        inner join dashboard.organizations as organizations on Programmes.OrganizationId = Organizations.Id
        left join dashboard.users as users on Users.Id = bookings.UserId
        left join raw.Teams teams on teams.Id = bookings.TeamId"""
    ) == [
        "dashboard.organizations",
        "dashboard.users",
        "raw.Bookings",
        "raw.Languages",
        "raw.Programmes",
        "raw.Sessions",
        "raw.Teams",
    ]
    # DDL/DML targets are used tables (the "transaction" case)
    assert used_tables(
        """BEGIN TRANSACTION;
        DROP TABLE IF EXISTS public.example;
        CREATE TABLE public.example AS SELECT 1 as id, 'Spain' as country
        union all SELECT 2 as id, 'Germany' as country;
        COMMIT;"""
    ) == ["public.example"]
    assert used_tables("INSERT INTO sink SELECT * FROM src") == ["sink", "src"]
    assert used_tables("CREATE TABLE IF NOT EXISTS t (a INT)") == ["t"]


def test_rename_tables_reference_go_table():
    """Reference rename semantics (pkg/sqlparser/parser_test.go
    TestSqlParser_RenameTables): an unaliased ref whose BASE name changes
    gets a back-alias to the original base so qualified column refs keep
    resolving; schema-only changes and already-aliased refs do not."""
    assert rename_tables("SELECT * FROM items", {"items": "new_items"}) == (
        "SELECT * FROM new_items AS items"
    )
    assert rename_tables("SELECT * FROM raw.items", {"raw.items": "raw_dev.items"}) == (
        "SELECT * FROM raw_dev.items"
    )
    got = rename_tables(
        "SELECT * FROM raw.items join raw.orders on items.item_id = orders.item_id",
        {"raw.items": "t1", "orders": "raw_dev.t2"},
    )
    # a 1-part mapping key matches the schema-qualified ref by base name
    # (reference rename.py:14-33 part semantics)
    assert got == (
        "SELECT * FROM t1 AS items join raw_dev.t2 AS orders "
        "on items.item_id = orders.item_id"
    )
    got = rename_tables(
        "DELETE FROM raw.items WHERE item_id = 1; SELECT * FROM raw.items "
        "join raw.orders as t2 on items.item_id = t2.item_id",
        {"raw.items": "t1"},
    )
    assert "DELETE FROM t1 AS items" in got
    assert "FROM t1 AS items \njoin" in got or "FROM t1 AS items join" in got
    # aliased refs keep their alias, no back-alias added
    assert rename_tables("SELECT * FROM raw.orders AS t2", {"raw.orders": "raw_dev.orders"}) == (
        "SELECT * FROM raw_dev.orders AS t2"
    )
    # DDL/DML targets never get a back-alias
    assert rename_tables("INSERT INTO sink SELECT 1", {"sink": "dev.sink2"}) == (
        "INSERT INTO dev.sink2 SELECT 1"
    )


def test_is_single_select_reference_behaviors():
    """pythonsrc/parser/main_test.py test_is_single_select_query."""
    assert is_single_select("SELECT * FROM users")
    assert is_single_select(
        "SELECT id FROM users WHERE active = true ORDER BY name LIMIT 100"
    )
    assert is_single_select(
        "WITH active AS (SELECT id FROM users) SELECT * FROM active"
    )
    assert is_single_select("SELECT 1 UNION ALL SELECT 2")
    assert not is_single_select("INSERT INTO users (n) VALUES ('x')")
    assert not is_single_select("UPDATE users SET active = false WHERE id = 1")
    assert not is_single_select("DELETE FROM users WHERE id = 1")
    assert not is_single_select("CREATE TABLE t (id INT)")
    assert not is_single_select("DROP TABLE users")
    assert not is_single_select("CREATE TABLE t AS SELECT * FROM users")
    assert not is_single_select("SELECT * FROM users; SELECT * FROM posts;")
    assert not is_single_select("")
    assert not is_single_select("PRAGMA table_info(users)")
    assert not is_single_select("SHOW TABLES")
    assert not is_single_select("DESCRIBE users")
    # WITH-prefixed DML is not a select
    assert not is_single_select(
        "WITH src AS (SELECT 1 AS x) INSERT INTO t SELECT * FROM src"
    )


def test_add_limit_reference_behaviors():
    """pythonsrc/parser/main_test.py add_limit cases: nested LIMITs stay,
    only the top level is added/replaced."""
    out = add_limit(
        "SELECT * FROM (SELECT product_id FROM test.products LIMIT 50) AS subquery",
        10,
    )
    assert out.endswith("LIMIT 10") and "LIMIT 50" in out
    out = add_limit(
        "SELECT * FROM (SELECT product_id FROM test.products) AS subquery", 10
    )
    assert out.endswith("LIMIT 10")
    out = add_limit("SELECT CONVERT_TIMEZONE('CET', '2025-05-20T00:00:00Z') LIMIT 100", 10)
    assert out.endswith("LIMIT 10") and "LIMIT 100" not in out
    out = add_limit("SELECT 1 LIMIT 5;", 7)
    assert out.endswith("LIMIT 7")


def test_used_tables_merge_statement():
    assert used_tables(
        "MERGE INTO tgt USING src ON tgt.id = src.id "
        "WHEN MATCHED THEN UPDATE SET v = src.v"
    ) == ["src", "tgt"]
    assert used_tables(
        "MERGE INTO tgt t USING (SELECT * FROM stage) s ON t.id = s.id "
        "WHEN NOT MATCHED THEN INSERT (id) VALUES (s.id)"
    ) == ["stage", "tgt"]


def test_rename_tables_part_matching_and_qualifier_drop():
    """rename.py semantics: a 1-part mapping key matches any schema's
    table of that base name; a 2-part key matches regardless of catalog;
    columns still qualified by the OLD schema drop to the leaf alias."""
    got = rename_tables(
        "SELECT * FROM raw.items join raw.orders on items.item_id = orders.item_id",
        {"raw.items": "t1", "orders": "raw_dev.t2"},
    )
    assert got == (
        "SELECT * FROM t1 AS items join raw_dev.t2 AS orders "
        "on items.item_id = orders.item_id"
    )
    got = rename_tables(
        "SELECT analytics.orders.amount FROM analytics.orders "
        "WHERE analytics.orders.id > 1",
        {"analytics.orders": "fixture_orders"},
    )
    assert got == "SELECT orders.amount FROM fixture_orders AS orders WHERE orders.id > 1"
    # base name unchanged -> no alias; 2-part dest keeps the ref's catalog
    assert rename_tables("SELECT * FROM cat.sch.t", {"sch.t": "dev.t"}) == (
        "SELECT * FROM cat.dev.t"
    )
    # struct access is untouched when the qualifier is not a source
    assert rename_tables("SELECT u.profile.email FROM users u", {"users": "u2"}) == (
        "SELECT u.profile.email FROM u2 u"
    )


def test_rename_tables_three_part_reference_cases():
    """rename_test.py TSQL three-part cases: schema rewrites on 3-part
    names, partial rewrites, mixed arities, catalog preserved under
    2-part mappings, 1-part destinations clearing catalog+schema."""
    assert rename_tables(
        "SELECT * FROM mydb.myschema.mytable",
        {"mydb.myschema.mytable": "mydb.dev_myschema.mytable"},
    ) == "SELECT * FROM mydb.dev_myschema.mytable"
    assert rename_tables(
        "SELECT * FROM db1.schema1.table1 t1 JOIN db1.schema2.table2 t2 ON t1.id = t2.id",
        {
            "db1.schema1.table1": "db1.dev_schema1.table1",
            "db1.schema2.table2": "db1.dev_schema2.table2",
        },
    ) == (
        "SELECT * FROM db1.dev_schema1.table1 t1 "
        "JOIN db1.dev_schema2.table2 t2 ON t1.id = t2.id"
    )
    assert rename_tables(
        "SELECT * FROM db1.schema1.table1 t1 JOIN db2.schema2.table2 t2 ON t1.id = t2.id",
        {"db1.schema1.table1": "db1.dev_schema1.table1"},
    ) == (
        "SELECT * FROM db1.dev_schema1.table1 t1 "
        "JOIN db2.schema2.table2 t2 ON t1.id = t2.id"
    )
    assert rename_tables(
        "SELECT * FROM mydb.myschema.mytable t1 JOIN otherschema.othertable t2 ON t1.id = t2.id",
        {
            "mydb.myschema.mytable": "mydb.dev_myschema.mytable",
            "otherschema.othertable": "dev_otherschema.othertable",
        },
    ) == (
        "SELECT * FROM mydb.dev_myschema.mytable t1 "
        "JOIN dev_otherschema.othertable t2 ON t1.id = t2.id"
    )
    # 2-part mapping does not strip the catalog from a 3-part reference
    assert rename_tables(
        "SELECT * FROM mydb.myschema.mytable", {"myschema.mytable": "dev_myschema.mytable"}
    ) == "SELECT * FROM mydb.dev_myschema.mytable"
    # 1-part destination clears stale catalog and schema entirely
    got = rename_tables(
        "SELECT amount FROM myproj.analytics.orders",
        {"myproj.analytics.orders": "cte_x"},
    )
    assert "cte_x" in got and "myproj" not in got and "analytics" not in got


def test_strip_sql_comments_reference_table():
    """pkg/query extract_test.go TestStripSQLComments: string literals,
    quoted/backtick identifiers, and doubled quotes protect `--` and
    `/*`; block comments keep their newlines."""
    from bruin_spark.parser import strip_sql_comments

    assert strip_sql_comments("SELECT 1 -- pick one\nFROM t") == "SELECT 1 \nFROM t"
    assert strip_sql_comments("SELECT /* pick\none */ 1") == "SELECT \n 1"
    assert (
        strip_sql_comments("INSERT INTO audit VALUES ('run -- 1')")
        == "INSERT INTO audit VALUES ('run -- 1')"
    )
    assert strip_sql_comments("SELECT 'a /* b' AS c") == "SELECT 'a /* b' AS c"
    assert strip_sql_comments("SELECT 'it''s -- fine' -- comment") == "SELECT 'it''s -- fine' "
    assert strip_sql_comments('SELECT "a -- b" FROM t') == 'SELECT "a -- b" FROM t'
    assert strip_sql_comments("SELECT `a -- b` FROM t") == "SELECT `a -- b` FROM t"
    assert strip_sql_comments("SELECT 1\n-- trailing") == "SELECT 1\n"


def test_used_tables_distribute_sort_cluster_end_from_list():
    # DISTRIBUTE/SORT/CLUSTER BY close the FROM list: their columns are
    # not tables (r8 ADVICE: comma-resume after ON must not swallow them)
    assert used_tables(
        "SELECT * FROM t1 JOIN t2 ON t1.x = t2.x DISTRIBUTE BY a, b"
    ) == ["t1", "t2"]
    assert used_tables("SELECT * FROM t1, t2 SORT BY a, b") == ["t1", "t2"]
    assert used_tables("SELECT * FROM t1 CLUSTER BY a, b") == ["t1"]
    # and a comma after ON at the same depth still resumes the list
    assert used_tables(
        "SELECT * FROM t1 JOIN t2 ON t1.x = t2.x, t3 SORT BY a, b"
    ) == ["t1", "t2", "t3"]


# -- extract_select (ref: pkg/sqlparser/parser_test.go
# TestSqlParser_ExtractSelect — same case table, same required behaviors) --


def test_extract_select_plain_select_unchanged():
    got = extract_select("SELECT id FROM orders")
    assert "FROM orders" in got
    assert "CREATE" not in got.upper()


def test_extract_select_create_or_replace_view():
    got = extract_select(
        "CREATE OR REPLACE VIEW analytics.v AS SELECT id FROM orders"
    )
    assert "CREATE" not in got.upper() and "VIEW" not in got.upper()
    assert "FROM orders" in got


def test_extract_select_ctas():
    got = extract_select("CREATE TABLE analytics.t AS SELECT id FROM orders")
    assert "CREATE" not in got.upper()
    assert "FROM orders" in got


def test_extract_select_insert_select():
    got = extract_select("INSERT INTO analytics.t SELECT id FROM orders")
    assert "INSERT" not in got.upper()
    assert "FROM orders" in got


def test_extract_select_preserves_with_clause():
    got = extract_select(
        "CREATE OR REPLACE VIEW analytics.v AS "
        "WITH e AS (SELECT id FROM orders) SELECT * FROM e"
    )
    assert "CREATE" not in got.upper()
    assert "WITH" in got.upper()


def test_extract_select_ddl_without_select_errors():
    with pytest.raises(ValueError):
        extract_select("CREATE TABLE analytics.t (id BIGINT, name VARCHAR)")


@pytest.mark.parametrize(
    "sql",
    [
        "DELETE FROM orders WHERE id IN (SELECT id FROM refunds)",
        "UPDATE orders SET status = 'void' WHERE id = 1",
        "MERGE INTO orders t USING staged s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET t.amount = s.amount",
        "TRUNCATE TABLE orders",
        "DROP TABLE orders",
    ],
)
def test_extract_select_rejects_write_statements(sql):
    with pytest.raises(ValueError):
        extract_select(sql)


def test_extract_select_rejects_data_modifying_cte():
    with pytest.raises(ValueError):
        extract_select(
            "WITH gone AS (DELETE FROM orders WHERE status = 'void' "
            "RETURNING id) SELECT * FROM gone"
        )


def test_extract_select_strips_select_into():
    got = extract_select("SELECT id, amount INTO archive FROM orders")
    assert "INTO" not in got.upper()
    assert "archive" not in got
    assert "FROM orders" in got


# behaviors beyond the reference table (this scanner's own contracts)


def test_extract_select_insert_with_column_list():
    got = extract_select(
        "INSERT INTO analytics.t (id, amount) SELECT id, amount FROM orders"
    )
    assert got.startswith("SELECT")


def test_extract_select_ctas_partitioned_clause_before_as():
    # mat strategies render CTAS with clauses between name and AS
    got = extract_select(
        "CREATE TABLE t USING parquet PARTITIONED BY (dt) AS SELECT * FROM o"
    )
    assert got == "SELECT * FROM o"


def test_extract_select_alias_as_is_not_the_unwrap_point():
    got = extract_select("SELECT a AS b FROM orders AS o")
    assert got == "SELECT a AS b FROM orders AS o"


def test_extract_select_for_update_lock_is_readonly():
    got = extract_select("SELECT * FROM orders FOR UPDATE")
    assert "FOR UPDATE" in got


def test_extract_select_empty_and_multi_statement_error():
    with pytest.raises(ValueError):
        extract_select("   ")
    with pytest.raises(ValueError):
        extract_select("SELECT 1; SELECT 2")


def test_extract_select_rejects_writing_subquery_in_create():
    with pytest.raises(ValueError):
        extract_select(
            "CREATE TABLE t AS WITH w AS (INSERT INTO log SELECT 1 "
            "RETURNING id) SELECT * FROM w"
        )


def test_extract_select_parenthesized_into_not_bypassed():
    # a fully-parenthesized SELECT INTO: the whole body sits at depth 1,
    # which used to slip past both the depth-0 strip and the write
    # rejection — the outer parens are normalized away and the INTO
    # stripped like the unparenthesized form
    got = extract_select("CREATE TABLE t AS (SELECT a INTO archive FROM o)")
    assert "INTO" not in got.upper() and "archive" not in got
    assert "FROM o" in got


def test_extract_select_nested_select_into_rejected():
    # SELECT INTO inside a subquery/CTE body is a write at any depth
    with pytest.raises(ValueError, match="write"):
        extract_select(
            "WITH x AS (SELECT a INTO t2 FROM o) SELECT * FROM x"
        )
    with pytest.raises(ValueError, match="write"):
        extract_select(
            "SELECT * FROM o WHERE id IN (SELECT id INTO t3 FROM p)"
        )

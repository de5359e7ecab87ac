"""Property-based tests (hypothesis): parser invariants and operator
equivalence against brute-force references."""

from hypothesis import given, settings
from hypothesis import strategies as st

from bruin_spark.parser import add_limit, rename_tables, used_tables
from bruin_spark.unittests.runner import compare_rows

# bare reserved words are not valid table names in the generated SQL
_SQL_KEYWORDS = {
    "on", "as", "by", "in", "is", "or", "and", "not", "join", "from",
    "where", "group", "order", "select", "left", "right", "full", "inner",
    "outer", "cross", "union", "all", "limit", "having", "with", "using",
}
ident = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True).filter(
    lambda s: s not in _SQL_KEYWORDS
)


@given(tables=st.lists(ident, min_size=1, max_size=4, unique=True))
def test_used_tables_finds_all_from_join_refs(tables):
    sql = "SELECT * FROM " + " JOIN ".join(tables)
    assert used_tables(sql) == sorted(set(tables))


@given(table=ident, new=ident, limit=st.integers(min_value=1, max_value=10**6))
def test_rename_then_limit_compose(table, new, limit):
    sql = f"SELECT a, b FROM {table} WHERE a > 0"
    out = add_limit(rename_tables(sql, {table: new}), limit)
    # an unaliased ref whose name changes gets a back-alias to the old
    # name (reference rename semantics) so column refs keep resolving
    back = f" AS {table}" if new != table else ""
    assert out == f"SELECT a, b FROM {new}{back} WHERE a > 0 LIMIT {limit}"
    # idempotence of add_limit override
    assert add_limit(out, limit) == out


rows = st.lists(
    st.lists(st.one_of(st.integers(-5, 5), st.none()), min_size=2, max_size=2),
    min_size=0,
    max_size=6,
)


@given(a=rows)
def test_compare_rows_reflexive(a):
    assert compare_rows(a, a, "exact", "any") == ""
    assert compare_rows(a, a, "exact", "strict") == ""


@given(a=rows, extra=rows)
def test_compare_rows_subset_of_superset(a, extra):
    assert compare_rows(a + extra, a, "subset", "strict") == ""


@settings(deadline=None, max_examples=20)
@given(
    events=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 10_000)),
        min_size=1,
        max_size=30,
    )
)
def test_sessionize_matches_bruteforce(spark, events):
    """Gap sessionization == a simple per-key python scan."""
    from datetime import datetime, timedelta

    from bruin_spark.operators.relational import sessionize

    base = datetime(2024, 1, 1)
    data = [
        (k, base + timedelta(seconds=s), i) for i, (k, s) in enumerate(events)
    ]
    df = spark.createDataFrame(data, "k bigint, ts timestamp, eid bigint")
    got = {
        (r["k"], r["eid"]): r["session_seq"]
        for r in sessionize(df, key="k", gap_seconds=600.0, order_tiebreak="eid").collect()
    }

    expected: dict = {}
    per_key: dict = {}
    for k, ts, eid in sorted(data, key=lambda x: (x[0], x[1], x[2])):
        last, seq = per_key.get(k, (None, 0))
        if last is None or (ts - last).total_seconds() > 600.0:
            seq += 1
        per_key[k] = (ts, seq)
        expected[(k, eid)] = seq
    assert got == expected

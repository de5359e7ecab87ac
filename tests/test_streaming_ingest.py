"""CDC URI rewriting, streaming-asset classification, batch-DAG
exclusion, and kafka source option construction.

Reference behaviors mirrored: pkg/ingestruri/uri.go:74-149,
pkg/ingestr/operator.go:229-320 (CDC parameters), :596-609
(IsStreamingAsset), cmd/run.go:3147-3170 (SkipStreamingAssets).
"""

import pytest

from bruin_spark.model.pipeline import (
    Asset,
    Materialization,
    MaterializationType,
    Pipeline,
    Strategy,
)
from bruin_spark.sources.uri import (
    apply_cdc_parameters,
    cdc_scheme,
    is_streaming_asset,
    normalize,
    parse_uri,
    to_cdc,
)
from bruin_spark.streaming import kafka_reader_options


# -- uri parsing ---------------------------------------------------------------


def test_normalize():
    assert normalize("bigquery:project.dataset") == "bigquery://project.dataset"
    assert normalize("postgres://u@h/db") == "postgres://u@h/db"
    assert normalize("no-scheme-path") == "no-scheme-path"


def test_parse_tolerates_nonstandard_schemes():
    p = parse_uri("ps_mysql://user:pw@host:3306/db?tls=true")
    assert p.scheme == "ps_mysql"
    assert p.netloc == "user:pw@host:3306"
    assert p.path == "/db"
    assert p.query_dict() == {"tls": "true"}
    assert p.render() == "ps_mysql://user:pw@host:3306/db?tls=true"


def test_cdc_scheme_map():
    # uri.go:118-132
    assert cdc_scheme("postgres+cdc") == ("postgres+cdc", True)
    assert cdc_scheme("postgresql") == ("postgres+cdc", True)
    assert cdc_scheme("postgresql+psycopg2") == ("postgres+cdc+psycopg2", True)
    for s in ("mysql", "mariadb", "vitess", "ps_mysql", "mongodb", "mssql", "sqlserver"):
        got, ok = cdc_scheme(s)
        assert ok and got == s + "+cdc"
    assert cdc_scheme("snowflake") == ("snowflake", False)


def test_to_cdc_rejects_unsupported():
    assert to_cdc("mysql://h/db") == "mysql+cdc://h/db"
    with pytest.raises(ValueError, match="change data capture"):
        to_cdc("duckdb://file.db")


# -- cdc parameter application -------------------------------------------------


def test_cdc_postgres_parameters():
    uri, params = apply_cdc_parameters(
        "postgresql://u@h:5432/db",
        {"cdc": "true", "cdc_publication": "pub1", "cdc_slot": "slot1"},
    )
    p = parse_uri(uri)
    assert p.scheme == "postgres+cdc"
    assert p.query_dict() == {"publication": "pub1", "slot": "slot1"}
    assert params["incremental_strategy"] == "merge"  # auto-set


def test_cdc_not_enabled_is_noop():
    uri, params = apply_cdc_parameters("postgres://h/db", {"x": "1"})
    assert uri == "postgres://h/db" and params == {"x": "1"}


def test_cdc_mssql_change_tracking():
    # +ct replaces +cdc and takes NO query parameters
    uri, _ = apply_cdc_parameters(
        "mssql://h/db",
        {
            "cdc": "true",
            "cdc_sql_capture": "change_tracking",
            "cdc_capture_instance": "dbo_t",  # must NOT be forwarded
        },
    )
    p = parse_uri(uri)
    assert p.scheme == "mssql+ct"
    assert "capture_instance" not in p.query_dict()


def test_cdc_mssql_log_based_forwards_capture_params():
    uri, _ = apply_cdc_parameters(
        "mssql://h/db",
        {"cdc": "true", "cdc_capture_instance": "dbo_t", "cdc_poll_interval": "5"},
    )
    p = parse_uri(uri)
    assert p.scheme == "mssql+cdc"
    assert p.query_dict() == {"capture_instance": "dbo_t", "poll_interval": "5"}


def test_cdc_mongodb_confined_params():
    uri, _ = apply_cdc_parameters(
        "mongodb://h/db",
        {"cdc": "true", "cdc_max_await_time": "10", "cdc_schema_sample_size": "100"},
    )
    assert parse_uri(uri).query_dict() == {
        "max_await_time": "10",
        "schema_sample_size": "100",
    }
    # the mongo params never leak into non-mongo URIs
    uri2, _ = apply_cdc_parameters(
        "mysql://h/db", {"cdc": "true", "cdc_max_await_time": "10"}
    )
    assert parse_uri(uri2).query_dict() == {}


def test_cdc_stream_mode_alias():
    _, params = apply_cdc_parameters(
        "mysql://h/db", {"cdc": "true", "cdc_mode": "stream"}
    )
    assert params["stream"] == "true"


def test_cdc_respects_existing_strategy():
    _, params = apply_cdc_parameters(
        "mysql://h/db", {"cdc": "true", "incremental_strategy": "append"}
    )
    assert params["incremental_strategy"] == "append"


# -- streaming classifier + batch-DAG exclusion -------------------------------


def _ingestr_asset(name, params):
    return Asset(name=name, type="ingestr", parameters=params)


def test_is_streaming_asset():
    assert is_streaming_asset(_ingestr_asset("a", {"stream": "true"}))
    assert is_streaming_asset(_ingestr_asset("a", {"cdc": "true", "cdc_mode": "stream"}))
    assert not is_streaming_asset(_ingestr_asset("a", {"cdc": "true"}))  # batch CDC
    assert not is_streaming_asset(_ingestr_asset("a", {}))
    # only ingestr assets classify as streaming
    assert not is_streaming_asset(Asset(name="a", type="spark.sql", parameters={"stream": "true"}))
    assert not is_streaming_asset(None)


def test_scheduler_excludes_streaming_assets(spark):
    from bruin_spark.scheduler import InstanceStatus, Scheduler

    batch = Asset(
        name="batch_out",
        type="spark.sql",
        query="SELECT 1 AS x",
        materialization=Materialization(
            type=MaterializationType.TABLE, strategy=Strategy.CREATE_REPLACE
        ),
    )
    streaming = _ingestr_asset("kafka_stream", {"stream": "true", "source_table": "t"})
    p = Pipeline(name="p", assets=[batch, streaming])

    res = Scheduler(spark, p).run()
    assert res.ok
    sch = Scheduler(spark, p)
    sch.run()
    assert sch.instances["kafka_stream"].status is InstanceStatus.SKIPPED
    assert sch.instances["batch_out"].status is InstanceStatus.SUCCEEDED

    # --stream mode targets the streaming asset itself: no exclusion
    sch2 = Scheduler(spark, p, stream_mode=True)
    assert sch2._skip_streaming_assets() == 0


# -- kafka options -------------------------------------------------------------


def test_kafka_reader_options_from_uri():
    opts = kafka_reader_options(
        uri="kafka://broker1:9092/clicks?group_id=bruin&starting_offsets=latest"
    )
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092",
        "subscribe": "clicks",
        "startingOffsets": "latest",
        "kafka.group.id": "bruin",
    }


def test_kafka_reader_options_ingestr_style():
    # ingestr grammar: kafka://?bootstrap_servers=..&group_id=.. with the
    # topic supplied as source_table
    opts = kafka_reader_options(
        uri="kafka://?bootstrap_servers=b1:9092,b2:9092&group_id=g1", topic="events"
    )
    assert opts["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert opts["subscribe"] == "events"
    assert opts["kafka.group.id"] == "g1"


def test_kafka_reader_options_requires_topic_and_servers():
    with pytest.raises(ValueError, match="topic"):
        kafka_reader_options(bootstrap_servers="h:9092")
    with pytest.raises(ValueError, match="bootstrap"):
        kafka_reader_options(topic="t")
    with pytest.raises(ValueError, match="not a kafka"):
        kafka_reader_options(uri="mysql://h/db")


def test_kafka_value_parse_roundtrip(spark):
    """parse_kafka_json_values decodes binary JSON values into typed
    columns — the same frame shape format('kafka') produces."""
    from pyspark.sql import functions as F

    from bruin_spark.streaming import parse_kafka_json_values

    df = spark.range(3).select(
        F.col("id").cast("string").cast("binary").alias("key"),
        F.to_json(F.struct(F.col("id"), (F.col("id") * 2).alias("v"))).cast("binary").alias("value"),
        F.current_timestamp().alias("timestamp"),
    )
    out = parse_kafka_json_values(df, "id bigint, v bigint")
    rows = sorted((r["id"], r["v"]) for r in out.collect())
    assert rows == [(0, 0), (1, 2), (2, 4)]
    assert set(out.columns) == {"_key", "_kafka_ts", "id", "v"}


# -- ingestr-type assets -------------------------------------------------------


def test_resolve_ingestr_plan_connection_and_cdc():
    from bruin_spark.sources.ingest import resolve_ingestr_plan

    pipe = Pipeline(
        name="p",
        assets=[],
        default_connections={"pg_prod": "postgresql://u@h:5432/db"},
    )
    a = _ingestr_asset(
        "dest.t",
        {
            "source_connection": "pg_prod",
            "source_table": "public.users",
            "cdc": "true",
            "cdc_publication": "pub1",
        },
    )
    uri, strategy, params = resolve_ingestr_plan(a, pipe)
    assert uri.startswith("postgres+cdc://u@h:5432/db")
    assert "publication=pub1" in uri
    assert strategy == "merge"  # CDC auto-sets merge
    assert params["source_table"] == "public.users"

    with pytest.raises(ValueError, match="source_uri"):
        resolve_ingestr_plan(_ingestr_asset("x", {}), pipe)


def test_scheduler_runs_batch_ingestr_asset(spark, tmp_path):
    from bruin_spark.scheduler import Scheduler

    f = tmp_path / "users.csv"
    f.write_text("id,name\n1,ada\n2,grace\n")
    asset = _ingestr_asset(
        "ing_users", {"source_uri": f"csv://{f}", "incremental_strategy": "replace"}
    )
    spark.sql("DROP TABLE IF EXISTS ing_users")
    p = Pipeline(name="p", assets=[asset])
    res = Scheduler(spark, p).run()
    assert res.ok, res.failed
    rows = sorted((r["id"], r["name"]) for r in spark.table("ing_users").collect())
    assert rows == [(1, "ada"), (2, "grace")]


def test_apply_cdc_stream_upserts_and_deletes(spark, tmp_path):
    import json

    from bruin_spark.streaming.streaming import apply_cdc_stream

    src = tmp_path / "cdc_src"
    src.mkdir()
    cp = str(tmp_path / "cdc_ckpt")
    schema = "op string, id bigint, val string, ts bigint"

    def write_batch(fn, events):
        (src / fn).write_text("\n".join(json.dumps(e) for e in events))

    def run():
        sdf = (
            spark.readStream.schema(schema).json(str(src))
        )
        apply_cdc_stream(
            spark, sdf, "cdc_target", pks=["id"], ts_col="ts", checkpoint=cp
        )

    spark.sql("DROP TABLE IF EXISTS cdc_target")
    write_batch(
        "b1.json",
        [
            {"op": "c", "id": 1, "val": "a", "ts": 1},
            {"op": "c", "id": 2, "val": "b", "ts": 2},
            {"op": "u", "id": 1, "val": "a2", "ts": 3},  # later ts wins in-batch
        ],
    )
    run()
    rows = {r["id"]: r["val"] for r in spark.table("cdc_target").collect()}
    assert rows == {1: "a2", 2: "b"}

    # second run: the checkpoint skips b1 and applies only the new file
    write_batch(
        "b2.json",
        [
            {"op": "d", "id": 2, "val": None, "ts": 4},   # delete
            {"op": "u", "id": 1, "val": "a3", "ts": 5},   # update
            {"op": "c", "id": 3, "val": "c", "ts": 6},    # insert
        ],
    )
    run()
    rows = {r["id"]: r["val"] for r in spark.table("cdc_target").collect()}
    assert rows == {1: "a3", 3: "c"}

    # crash simulation 1: a crash between rename-to-backup and
    # rename-stage-in leaves no target but a backup — the next batch's
    # recovery sweep must restore the backup, so no prior rows are lost
    spark.sql("ALTER TABLE cdc_target RENAME TO cdc_target__cdc_backup_deadbeef")
    # crash simulation 2: an orphaned stage table from a failed write
    spark.sql("CREATE TABLE cdc_target__cdc_stage_cafe0000 AS SELECT 1 AS junk")
    write_batch("b3.json", [{"op": "u", "id": 3, "val": "c2", "ts": 7}])
    run()
    rows = {r["id"]: r["val"] for r in spark.table("cdc_target").collect()}
    assert rows == {1: "a3", 3: "c2"}  # id=1 survived the simulated crash
    leftovers = [
        t.name
        for t in spark.catalog.listTables()
        if "__cdc_stage_" in t.name or "__cdc_backup_" in t.name
    ]
    assert leftovers == []
    spark.sql("DROP TABLE IF EXISTS cdc_target")


def test_apply_cdc_stream_no_ts_deterministic(spark, tmp_path):
    """Without ts_col the latest-per-PK pick must be a deterministic
    function of the batch content (full-row tiebreaker), not
    partition-order-dependent."""
    import json

    from bruin_spark.streaming.streaming import apply_cdc_stream

    src = tmp_path / "cdc_src2"
    src.mkdir()
    schema = "op string, id bigint, val string"
    (src / "b1.json").write_text(
        "\n".join(
            json.dumps(e)
            for e in [
                {"op": "c", "id": 1, "val": "aaa"},
                {"op": "u", "id": 1, "val": "zzz"},
                {"op": "u", "id": 1, "val": "mmm"},
            ]
        )
    )
    spark.sql("DROP TABLE IF EXISTS cdc_nt")
    for attempt in range(2):
        cp = str(tmp_path / f"ckpt{attempt}")
        spark.sql("DROP TABLE IF EXISTS cdc_nt")
        sdf = spark.readStream.schema(schema).json(str(src))
        apply_cdc_stream(spark, sdf, "cdc_nt", pks=["id"], checkpoint=cp)
        rows = {r["id"]: r["val"] for r in spark.table("cdc_nt").collect()}
        assert rows == {1: "zzz"}  # max val: content-derived, replay-stable
    spark.sql("DROP TABLE IF EXISTS cdc_nt")


def test_apply_cdc_stream_qualified_target(spark, tmp_path):
    """Schema-qualified CDC targets (db.tbl): swap, recovery sweep, and
    stage cleanup all stay inside the target's own database."""
    import json

    from bruin_spark.streaming.streaming import apply_cdc_stream

    spark.sql("CREATE DATABASE IF NOT EXISTS cdcdb")
    spark.sql("DROP TABLE IF EXISTS cdcdb.tgt")
    src = tmp_path / "qsrc"
    src.mkdir()
    schema = "op string, id bigint, val string, ts bigint"
    (src / "b1.json").write_text(
        json.dumps({"op": "c", "id": 1, "val": "a", "ts": 1})
    )
    try:
        sdf = spark.readStream.schema(schema).json(str(src))
        apply_cdc_stream(
            spark, sdf, "cdcdb.tgt", pks=["id"], ts_col="ts",
            checkpoint=str(tmp_path / "qck1"),
        )
        assert {r["id"] for r in spark.table("cdcdb.tgt").collect()} == {1}
        # simulate a crash that left only the backup, plus an orphan stage
        spark.sql("ALTER TABLE cdcdb.tgt RENAME TO cdcdb.tgt__cdc_backup_aa11")
        spark.sql("CREATE TABLE cdcdb.tgt__cdc_stage_bb22 AS SELECT 1 AS junk")
        (src / "b2.json").write_text(
            json.dumps({"op": "c", "id": 2, "val": "b", "ts": 2})
        )
        sdf = spark.readStream.schema(schema).json(str(src))
        apply_cdc_stream(
            spark, sdf, "cdcdb.tgt", pks=["id"], ts_col="ts",
            checkpoint=str(tmp_path / "qck2"),
        )
        assert {r["id"] for r in spark.table("cdcdb.tgt").collect()} == {1, 2}
        leftovers = [
            t.name for t in spark.catalog.listTables("cdcdb") if "__cdc_" in t.name
        ]
        assert leftovers == []
    finally:
        for t in spark.catalog.listTables("cdcdb"):
            spark.sql(f"DROP TABLE IF EXISTS cdcdb.{t.name}")
        spark.sql("DROP DATABASE IF EXISTS cdcdb")


def test_apply_cdc_stream_partitioned_target(spark, tmp_path):
    """CDC apply onto a PARTITIONED target: the rebuilt state keeps the
    partition layout, and the staged swap must not delete the fresh data
    through the backup's stale per-partition locations."""
    import json

    from bruin_spark.streaming.streaming import apply_cdc_stream

    src = tmp_path / "cdcp_src"
    src.mkdir()
    cp = str(tmp_path / "cdcp_ckpt")
    schema = "op string, id bigint, region string, val string, ts bigint"

    spark.sql("DROP TABLE IF EXISTS cdcp_target")
    spark.createDataFrame(
        [(1, "eu", "a", 1), (2, "us", "b", 1)],
        "id bigint, region string, val string, ts bigint",
    ).write.partitionBy("region").saveAsTable("cdcp_target")

    (src / "b1.json").write_text(
        "\n".join(
            json.dumps(e)
            for e in [
                {"op": "u", "id": 1, "region": "eu", "val": "a2", "ts": 2},
                {"op": "c", "id": 3, "region": "ap", "val": "c", "ts": 3},
                {"op": "d", "id": 2, "region": "us", "val": None, "ts": 4},
            ]
        )
    )
    sdf = spark.readStream.schema(schema).json(str(src))
    apply_cdc_stream(spark, sdf, "cdcp_target", pks=["id"], ts_col="ts", checkpoint=cp)

    rows = {r["id"]: (r["region"], r["val"]) for r in spark.table("cdcp_target").collect()}
    assert rows == {1: ("eu", "a2"), 3: ("ap", "c")}
    part_cols = [c.name for c in spark.catalog.listColumns("cdcp_target") if c.isPartition]
    assert part_cols == ["region"]
    assert not any("__cdc_" in t.name for t in spark.catalog.listTables())
    spark.sql("DROP TABLE cdcp_target")


def test_run_stream_executes_file_streaming_asset(spark, tmp_path):
    """`run --stream <asset>`: a file-dir streaming ingestr asset
    executes as a Structured Streaming query (availableNow) into its
    table; a second run with the same checkpoint... (new files only) is
    covered by the CDC tests — here we check the end-to-end CLI path."""
    import json
    from types import SimpleNamespace

    from bruin_spark.cli import cmd_run

    src = tmp_path / "clicks"
    src.mkdir()
    (src / "p1.json").write_text(
        "\n".join(json.dumps({"id": i, "page": f"/p{i % 3}"}) for i in range(6))
    )
    d = tmp_path / "streampipe"
    (d / "assets").mkdir(parents=True)
    (d / "pipeline.yml").write_text("name: streampipe\n")
    (d / "assets" / "clicks_stream.asset.yml").write_text(
        "name: clicks_stream\ntype: ingestr\nparameters:\n"
        f"  source_uri: json://{src}\n"
        "  source_table: ignored\n"
        "  stream: true\n"
        '  schema: "id bigint, page string"\n'
    )
    spark.sql("DROP TABLE IF EXISTS clicks_stream")
    args = SimpleNamespace(
        pipeline=str(d), asset=None, select=None, downstream=False, only=None,
        tag=[], exclude_tag=[], full_refresh=False, apply_interval_modifiers=False,
        workers=1, start=None, end=None, run_id=None, state=str(d / "s.json"),
        tables_dir=None, variant=None, environment=None, push_metadata=False,
        sensor_mode=None, continue_run=False, stream="clicks_stream", var=None,
    )
    assert cmd_run(args) == 0
    assert spark.table("clicks_stream").count() == 6
    # rerun: the stable per-asset checkpoint (pipeline dir) means the
    # already-processed files are NOT re-read — no duplicated rows
    assert cmd_run(args) == 0
    assert spark.table("clicks_stream").count() == 6
    assert (d / ".bruin_checkpoints" / "clicks_stream").is_dir()
    # without --stream the same pipeline skips the streaming asset
    spark.sql("DROP TABLE IF EXISTS clicks_stream")
    args.stream = None
    assert cmd_run(args) == 0
    assert not spark.catalog.tableExists("clicks_stream")


def test_run_streaming_asset_cdc_file_source(spark, tmp_path):
    """A +cdc streaming asset applies the op envelope (upsert/delete)
    onto the target instead of appending raw events."""
    import json

    from bruin_spark.model.pipeline import Asset, Column
    from bruin_spark.streaming.streaming import run_streaming_asset

    src = tmp_path / "cdcsrc"
    src.mkdir()
    (src / "b1.json").write_text(
        "\n".join(
            json.dumps(e)
            for e in [
                {"op": "c", "id": 1, "v": "a", "ts": 1},
                {"op": "u", "id": 1, "v": "a2", "ts": 2},
                {"op": "c", "id": 2, "v": "b", "ts": 3},
                {"op": "d", "id": 2, "v": None, "ts": 4},
            ]
        )
    )
    asset = Asset(
        name="cdc_stream_tgt",
        type="ingestr",
        parameters={
            "source_uri": f"json://{src}",
            "stream": "true",
            "cdc": "true",
            "incremental_key": "ts",
            "schema": "op string, id bigint, v string, ts bigint",
        },
        columns=[Column(name="id", type="bigint", primary_key=True)],
    )
    spark.sql("DROP TABLE IF EXISTS cdc_stream_tgt")
    run_streaming_asset(spark, asset, checkpoint=str(tmp_path / "ckpt"))
    rows = {r["id"]: r["v"] for r in spark.table("cdc_stream_tgt").collect()}
    assert rows == {1: "a2"}
    spark.sql("DROP TABLE cdc_stream_tgt")


def test_batch_cdc_snapshot_uri_strips_feed_config():
    """A batch run of a CDC asset reads the BASE connection: the +cdc
    scheme and replication-feed params are stripped for the snapshot,
    while ordinary connection params survive."""
    from bruin_spark.sources.ingest import snapshot_source_uri

    assert (
        snapshot_source_uri(
            "postgres+cdc://u@h:5432/db?publication=pub&slot=s1&sslmode=require"
        )
        == "postgres://u@h:5432/db?sslmode=require"
    )
    assert (
        snapshot_source_uri("mssql+ct://h/db") == "mssql://h/db"
    )
    # non-CDC URIs pass through untouched
    assert snapshot_source_uri("mysql://h/db?tls=1") == "mysql://h/db?tls=1"


def test_cdc_on_unsupported_database_scheme_errors():
    import pytest

    from bruin_spark.sources.uri import apply_cdc_parameters

    with pytest.raises(ValueError, match="does not support"):
        apply_cdc_parameters("snowflake://acct/db", {"cdc": "true"})
    # boolean-typed YAML `cdc: true` engages CDC too
    uri, params = apply_cdc_parameters("postgres://h/db", {"cdc": True})
    assert uri.startswith("postgres+cdc://")


def test_normalize_leaves_raw_jdbc_uris_alone():
    from bruin_spark.sources.ingest import jdbc_options
    from bruin_spark.sources.uri import normalize

    raw = "jdbc:postgresql://host:5432/db"
    assert normalize(raw) == raw
    assert jdbc_options(raw, table="t")["url"] == raw

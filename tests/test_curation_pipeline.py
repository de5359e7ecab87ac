"""LLM-curation pipeline end-to-end THROUGH the orchestrator: the
training-data operators (RefinedWeb funnel, attrition report) running
as ordinary bruin assets — seed → python asset (operators via the
in-scope spark session) → SQL asset with checks — via the real CLI
entry point, twice (idempotent rerun), in the reference's
integration-test style."""

import textwrap

import pytest

from bruin_spark.cli import main as cli_main

DOCS = [
    # (doc_id, text, lang) — single-line texts keep the seed CSV simple
    (1, "the cat and the dog have fun with all of that good stuff today.", "en"),
    (2, "tiny doc.", "en"),  # gopher: too few words
    (3, "the cat and the dog have fun with all of that good stuff here", "en"),  # lines: no terminal punct? ends without '.'
    (4, "the quick brown fox jumps over the lazy dog near the old stone bridge at dawn today it seems.", "en"),
    (5, "the quick brown fox jumps over the lazy dog near the old stone bridge at dawn today it seems.", "en"),
    (6, "the quick brown fox jumps over the lazy dog near the old stone bridge at dawn today it seems.", "en"),
    (7, "a completely different document with the usual words and a clean ending for that one too.", "en"),
]


@pytest.fixture()
def pipeline_dir(tmp_path):
    d = tmp_path / "curation"
    assets = d / "assets"
    assets.mkdir(parents=True)
    (d / "pipeline.yml").write_text("name: curation_pipeline\n")

    lines = ["doc_id,text,lang"] + [f'{i},"{t}",{lang}' for i, t, lang in DOCS]
    (assets / "docs.csv").write_text("\n".join(lines) + "\n")
    (assets / "raw_documents.asset.yml").write_text(
        textwrap.dedent(
            """
            name: raw_documents
            type: spark.seed
            parameters:
              path: docs.csv
            columns:
              - name: doc_id
                type: bigint
                checks: [{name: not_null}, {name: unique}]
              - name: text
                type: string
              - name: lang
                type: string
            """
        )
    )
    (assets / "curation_decisions.py").write_text(
        textwrap.dedent(
            '''
            """ @bruin
            name: curation_decisions
            type: python
            depends: [raw_documents]
            materialization:
              type: table
              strategy: create+replace
            columns:
              - name: doc_id
                type: bigint
                checks: [{name: not_null}, {name: unique}]
            @bruin """

            def materialize():
                from bruin_spark.operators.refinedweb import refinedweb_funnel

                return refinedweb_funnel(
                    spark.table("raw_documents"), gopher_min_words=5
                ).toPandas()
            '''
        )
    )
    (assets / "curation_attrition.py").write_text(
        textwrap.dedent(
            '''
            """ @bruin
            name: curation_attrition
            type: python
            depends: [curation_decisions]
            materialization:
              type: table
              strategy: create+replace
            @bruin """

            def materialize():
                from bruin_spark.operators.refinedweb import funnel_attrition

                return funnel_attrition(spark.table("curation_decisions")).toPandas()
            '''
        )
    )
    (assets / "curated_corpus.sql").write_text(
        textwrap.dedent(
            """
            /* @bruin
            name: curated_corpus
            type: spark.sql
            depends: [raw_documents, curation_decisions]
            materialization:
              type: table
              strategy: create+replace
            columns:
              - name: doc_id
                type: bigint
                checks: [{name: not_null}, {name: unique}]
            @bruin */
            SELECT d.doc_id, d.text, d.lang
            FROM raw_documents d
            JOIN curation_decisions c ON d.doc_id = c.doc_id
            WHERE c.keep
            """
        )
    )
    return d


def test_curation_pipeline_end_to_end(spark, pipeline_dir):
    for _ in range(2):  # idempotent rerun (create+replace everywhere)
        rc = cli_main(
            ["run", str(pipeline_dir), "--start", "2024-01-01", "--end", "2024-01-02"]
        )
        assert rc == 0

    decisions = {r["doc_id"]: r for r in spark.table("curation_decisions").collect()}
    assert set(decisions) == {i for i, _, _ in DOCS}
    # pinned stage outcomes
    assert decisions[2]["stage_failed"] == "gopher"        # too short
    assert decisions[3]["gopher_pass"] and not decisions[3]["line_pass"]
    kept = {r["doc_id"] for r in spark.table("curated_corpus").collect()}
    assert kept == {i for i, r in decisions.items() if r["keep"]}
    # the curated corpus lost at least the known-bad docs
    assert 2 not in kept and 3 not in kept

    att = {r["stage"]: r for r in spark.table("curation_attrition").collect()}
    assert att["gopher"]["n_in"] == len(DOCS)
    assert att["spans"]["n_out"] == len(kept)
    # chained: each stage's n_out feeds the next stage's n_in
    order = ["gopher", "lines", "lm", "boilerplate", "spans"]
    for a, b in zip(order, order[1:]):
        assert att[a]["n_out"] == att[b]["n_in"]


def test_curate_cli(spark, tmp_path, capsys):
    """`bruin curate` end-to-end over a parquet input: attrition report
    on stdout, decisions parquet written and consistent."""
    src = str(tmp_path / "docs.parquet")
    out = str(tmp_path / "decisions.parquet")
    spark.createDataFrame(DOCS, "doc_id long, text string, lang string").write.parquet(src)
    rc = cli_main(["curate", src, "--out", out, "--lm-top-v", "32"])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "1. gopher" in printed and "5. spans" in printed
    dec = spark.read.parquet(out)
    assert dec.count() == len(DOCS)
    assert set(dec.columns) >= {"doc_id", "keep", "stage_failed"}

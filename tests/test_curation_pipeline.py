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


# -- curation -> training handoff (r13): tokenize, mix, pack as assets ---------

TRAIN_DOCS = [
    (1, "the cat and the dog have fun with all of that good stuff today.", "en"),
    (2, "tiny doc.", "en"),  # dropped at gopher
    (3, "a completely different document with the usual words and a clean ending for that one too.", "en"),
    (4, "the quick brown fox jumps over the lazy dog near the old stone bridge at dawn today it seems.", "en"),
    (5, "every good boy does fine and all cows eat grass while the band plays on through the night.", "en"),
    (6, "le chat et le chien jouent ensemble dans le grand jardin vert toute la belle jour ici.", "fr"),
    (7, "une autre phrase complete avec beaucoup de mots differents pour bien tester le pipeline entier.", "fr"),
]

_PACK_BOUNDS = (64, 128, 256)
_UNIMAX_BUDGET = 3


@pytest.fixture()
def training_pipeline_dir(tmp_path):
    """The curation pipeline EXTENDED through the training handoff:
    seed -> funnel decisions -> curated corpus -> BPE tokenization ->
    UniMax language mixture + padding-waste packing report — every
    stage an ordinary asset with declared columns and quality checks,
    scheduled by the real DAG executor."""
    d = tmp_path / "training"
    assets = d / "assets"
    assets.mkdir(parents=True)
    (d / "pipeline.yml").write_text("name: training_handoff\n")

    lines = ["doc_id,text,lang"] + [f'{i},"{t}",{lang}' for i, t, lang in TRAIN_DOCS]
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
                checks: [{name: not_null}]
              - name: lang
                type: string
                checks: [{name: accepted_values, value: [en, fr]}]
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
    (assets / "tokenized_corpus.py").write_text(
        textwrap.dedent(
            '''
            """ @bruin
            name: tokenized_corpus
            type: python
            depends: [curated_corpus]
            materialization:
              type: table
              strategy: create+replace
            columns:
              - name: doc_id
                type: bigint
                checks: [{name: not_null}, {name: unique}]
              - name: n_ids
                type: bigint
                checks: [{name: positive}]
            @bruin """

            def materialize():
                from pyspark.sql import functions as F

                from bruin_spark.operators.tokenizer import bpe_encode_ids

                ids = bpe_encode_ids(spark.table("curated_corpus"), n_merges=4)
                return ids.select(
                    "doc_id",
                    "n_ids",
                    F.array_join(
                        F.transform("ids", lambda x: x.cast("string")), " "
                    ).alias("ids_str"),
                ).toPandas()
            '''
        )
    )
    (assets / "language_mixture.py").write_text(
        textwrap.dedent(
            f'''
            """ @bruin
            name: language_mixture
            type: python
            depends: [curated_corpus]
            materialization:
              type: table
              strategy: create+replace
            columns:
              - name: lang
                type: string
                checks: [{{name: not_null}}, {{name: unique}}]
              - name: alloc
                type: double
                checks: [{{name: non_negative}}]
            @bruin """

            def materialize():
                from bruin_spark.operators.sampling import unimax_quotas

                return unimax_quotas(
                    spark.table("curated_corpus"), "lang",
                    budget={_UNIMAX_BUDGET}, epoch_cap=1.0,
                ).toPandas()
            '''
        )
    )
    (assets / "packing_report.py").write_text(
        textwrap.dedent(
            f'''
            """ @bruin
            name: packing_report
            type: python
            depends: [tokenized_corpus]
            materialization:
              type: table
              strategy: create+replace
            custom_checks:
              - name: no_pathological_bucket
                count: 0
                query: >
                  SELECT bucket_len FROM packing_report WHERE pad_frac > 0.95
              - name: token_conservation
                count: 0
                query: >
                  SELECT 1 WHERE
                    (SELECT sum(total_tokens) FROM packing_report)
                    <> (SELECT sum(least(n_ids, {max(_PACK_BOUNDS)})) FROM tokenized_corpus)
            @bruin """

            def materialize():
                from bruin_spark.operators.text import padding_waste

                return padding_waste(
                    spark.table("tokenized_corpus"),
                    boundaries={_PACK_BOUNDS!r},
                    count_col="n_ids",
                ).toPandas()
            '''
        )
    )
    return d


def test_training_handoff_pipeline(spark, training_pipeline_dir):
    import math

    for _ in range(2):  # idempotent rerun
        rc = cli_main(
            [
                "run",
                str(training_pipeline_dir),
                "--start",
                "2024-01-01",
                "--end",
                "2024-01-02",
            ]
        )
        assert rc == 0

    curated = spark.table("curated_corpus").collect()
    kept_ids = {r["doc_id"] for r in curated}
    assert 2 not in kept_ids and kept_ids  # gopher victim gone, corpus non-empty

    # tokenization covers exactly the curated corpus, ids are real
    tok = {r["doc_id"]: r for r in spark.table("tokenized_corpus").collect()}
    assert set(tok) == kept_ids
    for r in tok.values():
        assert r["n_ids"] > 0
        assert len(r["ids_str"].split(" ")) == r["n_ids"]

    # golden packing report: recompute from the tokenized table
    bs = sorted(_PACK_BOUNDS)
    expected: dict[int, list[int]] = {}
    for r in tok.values():
        b = next((x for x in bs if r["n_ids"] <= x), bs[-1])
        e = expected.setdefault(b, [0, 0, 0, 0])
        e[0] += 1
        e[1] += int(r["n_ids"] > bs[-1])
        e[2] += min(r["n_ids"], bs[-1])
        e[3] += b - min(r["n_ids"], bs[-1])
    packing = {r["bucket_len"]: r for r in spark.table("packing_report").collect()}
    assert set(packing) == set(expected)
    for b, (n_docs, n_tr, total, pad) in expected.items():
        row = packing[b]
        assert (row["n_docs"], row["n_truncated"], row["total_tokens"], row["pad_tokens"]) == (
            n_docs, n_tr, total, pad,
        )
        assert row["pad_frac"] == pytest.approx(round(pad / (n_docs * b), 6))

    # golden UniMax mixture: water-filling over the curated lang counts
    avail = {}
    for r in curated:
        avail[r["lang"]] = avail.get(r["lang"], 0) + 1
    mix = {r["lang"]: r for r in spark.table("language_mixture").collect()}
    assert set(mix) == set(avail)
    for lang, row in mix.items():
        assert row["avail"] == avail[lang]
        assert row["cap"] == pytest.approx(avail[lang] * 1.0)  # epoch_cap=1
        assert 0 <= row["alloc"] <= row["cap"]
        assert row["epochs"] == pytest.approx(round(row["alloc"] / row["avail"], 6))
    assert sum(r["alloc"] for r in mix.values()) <= _UNIMAX_BUDGET
    # budget is met up to flooring (or every language saturated)
    total_alloc = sum(r["alloc"] for r in mix.values())
    saturated = all(
        math.isclose(r["alloc"], r["cap"]) for r in mix.values()
    )
    assert saturated or total_alloc >= _UNIMAX_BUDGET - len(mix)

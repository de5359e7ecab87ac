"""padding_waste (operators/text.py) and the UniMax epoch-schedule
draw (workloads/sampling_q.py sample_unimax_draw)."""

import pytest
from pyspark.sql import functions as F

from bruin_spark.operators.text import padding_waste


def test_padding_waste_hand_values(spark):
    texts = [
        (0, " ".join(["w"] * 4)),    # bucket 8, pad 4
        (1, " ".join(["w"] * 8)),    # bucket 8, pad 0
        (2, " ".join(["w"] * 9)),    # bucket 16, pad 7
        (3, " ".join(["w"] * 40)),   # > max: truncated to 16, pad 0
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    got = {
        r["bucket_len"]: r.asDict()
        for r in padding_waste(df, boundaries=(8, 16)).collect()
    }
    assert got[8]["n_docs"] == 2 and got[8]["pad_tokens"] == 4
    assert got[8]["pad_frac"] == pytest.approx(round(4 / 16, 6))
    assert got[8]["n_truncated"] == 0
    assert got[16]["n_docs"] == 2 and got[16]["n_truncated"] == 1
    assert got[16]["total_tokens"] == 9 + 16
    assert got[16]["pad_tokens"] == 7
    assert got[16]["pad_frac"] == pytest.approx(round(7 / 32, 6))


def test_padding_waste_plan_is_one_pass(spark):
    df = spark.createDataFrame([(0, "a b c")], ["doc_id", "text"])
    plan = padding_waste(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1  # the single groupBy shuffle
    assert "EvalPython" not in plan and "Window" not in plan


def test_unimax_draw_totals_match_allocation(spark, tmp_path):
    """sum(n_repeats) per language == the UniMax alloc, and repeats
    never exceed the epoch cap's ceiling."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bruin_spark.operators.sampling import unimax_quotas
    from bruin_spark.workloads.sampling_q import _UNIMAX_EPOCHS, sample_unimax_draw

    rows = [(i, f"text {i}", ["en", "en", "en", "fr", "zh"][i % 5], "s", 7)
            for i in range(60)]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows]),
        "lang": pa.array([r[2] for r in rows]),
        "source": pa.array([r[3] for r in rows]),
        "n_chars": pa.array([r[4] for r in rows], type=pa.int64()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    sf_dir = str(tmp_path)

    draw = sample_unimax_draw(spark, sf_dir)
    got = {
        r["lang"]: r["total"]
        for r in draw.groupBy("lang").agg(F.sum("n_repeats").alias("total")).collect()
    }
    docs = spark.read.parquet(str(tmp_path / "documents.parquet"))
    alloc = {
        r["lang"]: r["alloc"]
        for r in unimax_quotas(
            docs, "lang", budget=2 * 60, epoch_cap=_UNIMAX_EPOCHS
        ).collect()
    }
    assert got == {k: v for k, v in alloc.items() if v > 0}
    assert draw.agg(F.max("n_repeats")).collect()[0][0] <= int(_UNIMAX_EPOCHS) + 1

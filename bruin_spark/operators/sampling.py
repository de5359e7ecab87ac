"""Deterministic sampling and dataset splitting for training-data pipelines.

At 100 TB, `df.sample()` / `randomSplit()` are the wrong tools for corpus
curation: they are non-reproducible across runs/retries (task re-execution
re-draws), and can't be re-derived downstream. The standard practice is
content-addressed bucketing — hash a stable id into N buckets and carve
fractions out of the bucket space. Properties:

- **reproducible**: same id → same bucket, on any cluster, any engine
  (md5 is md5 — the DuckDB oracle computes the identical assignment);
- **map-only**: pure expression, no shuffle, fully codegen'd JVM-side;
- **consistent across tables**: hashing the same key in two datasets
  yields aligned splits (e.g. documents and their embeddings land in the
  same split without a join);
- **incremental-safe**: new data added later lands in splits at the same
  fractions without disturbing earlier assignments.

Reference parity: bruin has no sampler (its warehouses own execution);
this is part of the training-data surface this engine adds on top
(SURVEY.md §2 training-data extras).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

N_BUCKETS = 1_000_000


def hash_bucket(col: Column | str, salt: str = "", n_buckets: int = N_BUCKETS) -> Column:
    """Uniform deterministic bucket in [0, n_buckets) from md5(salt||id).

    Uses the first 8 hex digits (32 bits) — uniform, and small enough that
    the hex→long conversion is exact in every engine's signed 64-bit int.
    """
    c = F.col(col) if isinstance(col, str) else col
    hexpart = F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 8)
    return (F.conv(hexpart, 16, 10).cast("long") % n_buckets).alias("bucket")


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~`fraction` of rows, chosen by id hash (stable across runs)."""
    return df.filter(hash_bucket(id_col, salt) < int(fraction * N_BUCKETS))


def assign_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Add a `split` column partitioning rows into named fractions.

    Buckets are carved into contiguous ranges in weight order, so the
    assignment is a single chained comparison on one hash — splits are
    exhaustive and disjoint by construction.
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    bucket = hash_bucket(id_col, salt)
    expr = None
    edge = 0.0
    names = list(weights)
    for name in names[:-1]:
        edge += weights[name] / total
        cond = bucket < int(edge * N_BUCKETS)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (expr.otherwise(names[-1]) if expr is not None else F.lit(names[-1])).alias("split")
    return df.withColumn("split", expr)


def stratified_quota_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    quotas: dict[str, int],
    default_quota: int = 0,
    salt: str = "quota",
    two_phase: bool = True,
    oversample: float = 4.0,
) -> DataFrame:
    """Keep at most ``quotas[stratum]`` rows per stratum, chosen by hash
    rank — the training-mix shaping op ("cap English at N docs, keep all
    of the low-resource languages").

    Selection is the quota-smallest hash buckets per stratum: stable
    across runs AND monotone under growth (a kept id stays kept until
    the stratum's quota fills with smaller hashes).

    With ``two_phase`` (the default) the exact rank window only ever
    sees ~``oversample × quota`` rows per stratum: a first cheap pass
    finds the strata that need cutting (n > oversample×quota; the
    aggregate-side filter means only genuinely-hot strata reach the
    driver, never the full stratum cardinality), a broadcast-joined
    per-stratum hash threshold then cuts each hot stratum map-side
    BEFORE the window, and a verification count
    guarantees at least ``min(quota, stratum_size)`` survivors per
    stratum (doubling any undershooting threshold — vanishingly rare at
    oversample=4, but the guarantee is what keeps the output
    byte-identical to the single-phase form: whenever ≥ quota rows
    survive a bucket cut, the quota-smallest buckets are all among
    them).  That bounds the hot-stratum sort task at ~oversample×quota
    rows no matter how big the stratum is — a 100 TB English stratum
    costs two map-only scans plus a window over a few-×-quota sliver,
    instead of one sort task over the whole stratum.

    ``two_phase=False`` keeps the direct single-window form (one shuffle
    on the stratum key), fine when strata are known-small.  Ties (two
    ids in one bucket) break on the id for determinism; both forms
    return identical rows.
    """
    import math

    from pyspark.sql import Window
    from pyspark.sql.types import LongType, StructField, StructType

    bucket = hash_bucket(id_col, salt)
    w = Window.partitionBy(stratum_col).orderBy(bucket, F.col(id_col))

    quota_expr = None
    for stratum, q in quotas.items():
        cond = F.col(stratum_col) == stratum
        quota_expr = (
            F.when(cond, q) if quota_expr is None else quota_expr.when(cond, q)
        )
    quota_expr = (
        quota_expr.otherwise(default_quota)
        if quota_expr is not None
        else F.lit(default_quota)
    )

    if not two_phase:
        return (
            df.withColumn("_qrank", F.row_number().over(w))
            .filter(F.col("_qrank") <= quota_expr)
            .drop("_qrank")
        )

    spark = df.sparkSession
    # Zero-quota strata contribute nothing to the output: cut them
    # map-side up front so they never reach the rank window (a huge
    # unlisted stratum under default_quota=0 would otherwise be fully
    # sorted just to be discarded by `_qrank <= 0`).
    df = df.filter(quota_expr > 0)
    # Only strata that actually NEED a cut (n > oversample × quota, with
    # a positive quota) come back to the driver — the aggregate-side
    # filter keeps the collected set at the number of genuinely-hot
    # strata, not the stratum cardinality (a high-cardinality stratum
    # column would otherwise be a driver OOM).
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_n"))
    cut_rows = counts.filter(
        (quota_expr > 0) & (F.col("_n") > F.lit(float(oversample)) * quota_expr)
    ).collect()
    sizes = {r[0]: r[1] for r in cut_rows}
    if not sizes:
        # nothing is hot: the plain single-window form, no extra scans
        return (
            df.withColumn("_qrank", F.row_number().over(w))
            .filter(F.col("_qrank") <= quota_expr)
            .drop("_qrank")
        )

    thr = {
        s: min(
            N_BUCKETS,
            int(
                math.ceil(
                    oversample * quotas.get(s, default_quota) / n * N_BUCKETS
                )
            ),
        )
        for s, n in sizes.items()
    }
    stratum_type = df.schema[stratum_col].dataType
    tschema = StructType(
        [
            StructField("_stratum", stratum_type, True),
            StructField("_thr", LongType(), False),
        ]
    )

    def _filtered(cur_thr: dict) -> DataFrame:
        # left-join thresholds for the cut strata only; everything else
        # passes through untouched (_thr null)
        rows = [(s, int(t)) for s, t in cur_thr.items()]
        tdf = spark.createDataFrame(rows, tschema)
        joined = df.join(
            F.broadcast(tdf), df[stratum_col].eqNullSafe(tdf["_stratum"]), "left"
        ).drop("_stratum")
        return joined.filter(F.col("_thr").isNull() | (bucket < F.col("_thr")))

    # Verify the cut left >= quota survivors wherever it actually cut
    # (threshold < N_BUCKETS); double any undershooting threshold.  Each
    # iteration counts ONLY the cut strata (map-side-combined); with
    # oversample=4 the first pass succeeds essentially always.
    while True:
        cut_strata = {s for s, t in thr.items() if t < N_BUCKETS}
        if not cut_strata:
            break
        surv = {
            r[0]: r[1]
            for r in _filtered(thr)
            .filter(F.col("_thr").isNotNull())
            .groupBy(stratum_col)
            .count()
            .collect()
        }
        bad = [
            s
            for s in cut_strata
            if surv.get(s, 0) < min(quotas.get(s, default_quota), sizes[s])
        ]
        if not bad:
            break
        for s in bad:
            thr[s] = min(N_BUCKETS, thr[s] * 2)

    return (
        _filtered(thr)
        .withColumn("_qrank", F.row_number().over(w))
        .filter(F.col("_qrank") <= quota_expr)
        .drop("_qrank", "_thr")
    )


def bucket_sql(id_expr: str, salt: str = "", n_buckets: int = N_BUCKETS) -> str:
    """The DuckDB-equivalent bucket expression (for oracles / warehouses
    that speak ANSI SQL) — byte-identical assignment to `hash_bucket`."""
    return (
        f"(('0x' || SUBSTR(MD5('{salt}' || CAST({id_expr} AS VARCHAR)), 1, 8))::BIGINT"
        f" % {n_buckets})"
    )


def domain_mixture_quotas(
    df: DataFrame,
    domain_col: str,
    total: int,
    temperature: float | None = None,
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Per-domain document quotas for a target training MIXTURE -> one
    row per domain: (domain, avail, quota).

    Target weights come either from an explicit ``weights`` dict or from
    temperature sampling over the observed counts (w_d ∝ count_d^(1/T),
    the standard multilingual flattening — T>1 upweights low-resource
    domains). Budget is allocated by weighted water-filling: every
    domain gets min(avail_d, λ·w_d) with the water level λ chosen so the
    total fills the budget — a domain that runs out of documents spills
    its share onto the rest, proportionally.

    Scale shape: one groupBy(domain) aggregate, then pure WINDOW math
    over the k-domain table (k is small by definition) — the water level
    is found with a prefix-scan over domains sorted by avail/weight, no
    driver loop, no iteration. Weights/λ products round to 6 decimals
    before flooring so the DuckDB oracle lands on identical integers.
    """
    from pyspark.sql import Window

    counts = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).cast("double").alias("avail")
    )
    if weights is not None:
        expr = None
        for d, wt in weights.items():
            cond = F.col("domain") == d
            expr = F.when(cond, float(wt)) if expr is None else expr.when(cond, float(wt))
        w_col = expr.otherwise(F.lit(0.0)) if expr is not None else F.lit(0.0)
    else:
        t = 1.0 if temperature is None else float(temperature)
        w_col = F.round(F.pow(F.col("avail"), F.lit(1.0 / t)), 6)
    wdf = counts.withColumn("w", w_col).filter(F.col("w") > 0)
    wdf = wdf.withColumn("ratio", F.col("avail") / F.col("w"))

    order = Window.orderBy("ratio", "domain")
    prefix_avail = F.coalesce(
        F.sum("avail").over(order.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0.0)
    )
    suffix_w = F.sum("w").over(order.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    annotated = wdf.select(
        "domain",
        "avail",
        "w",
        "ratio",
        F.row_number().over(order).alias("rn"),
        ((F.lit(float(total)) - prefix_avail) / suffix_w).alias("lam_cand"),
    )
    everything = Window.partitionBy()
    first_valid = F.min(
        F.when(F.col("lam_cand") <= F.col("ratio"), F.col("rn"))
    ).over(everything)
    lam = F.max(
        F.when(F.col("rn") == first_valid, F.col("lam_cand"))
    ).over(everything)
    quota = F.when(
        lam.isNull() | (F.col("rn") < first_valid), F.col("avail")
    ).otherwise(F.least(F.col("avail"), F.floor(F.round(lam * F.col("w"), 6))))
    return annotated.select(
        "domain",
        F.col("avail").cast("bigint").alias("avail"),
        quota.cast("bigint").alias("quota"),
    )


def domain_mixture_sample(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    total: int,
    temperature: float | None = None,
    weights: dict[str, float] | None = None,
    salt: str = "mix",
    two_phase: bool = True,
) -> DataFrame:
    """Sample ~``total`` rows matching a target domain MIXTURE
    (DoReMi/Pile-style weighted mixing, temperature flattening for
    multilingual corpora): quotas from :func:`domain_mixture_quotas`,
    rows chosen per-domain by the same monotone hash rank as
    :func:`stratified_quota_sample` (which also supplies the two-phase
    hot-domain path — the k-row quota table is the only driver-side
    data)."""
    qrows = domain_mixture_quotas(
        df, domain_col, total, temperature=temperature, weights=weights
    ).collect()  # k domains — small by definition
    quotas = {r["domain"]: int(r["quota"]) for r in qrows}
    return stratified_quota_sample(
        df,
        id_col,
        domain_col,
        quotas,
        default_quota=0,
        salt=salt,
        two_phase=two_phase,
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES): each row draws ``key = -ln(u) / w`` with ``u``
    derived from ``md5(salt || id)`` — the k SMALLEST keys are an exact
    weighted sample without replacement, reproducible across runs and
    engines (no rand()).

    Rows with NULL or non-positive weight are excluded.  Ties (only
    possible via hash collision on u AND equal weights) break on the
    id for determinism.

    100 TB shape: the key is one map-only expression; selection is
    ``ORDER BY key LIMIT k`` which Spark plans as TakeOrderedAndProject
    — per-partition partial top-k, then a merge of P·k candidate rows
    on one reducer (k is small by contract).  No full sort, no window,
    no shuffle of the corpus.  Plan-asserted in tests.
    """
    w = F.col(weight_col).cast("double")
    u = (hash_bucket(id_col, salt) + F.lit(0.5)) / F.lit(float(N_BUCKETS))
    key = -F.log(u) / w
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("sample_key", key)
        .orderBy(F.col("sample_key").asc(), F.col(id_col).asc())
        .limit(int(k))
        .withColumn("sample_key", F.round(F.col("sample_key"), 6))
    )


def unimax_quotas(
    df: DataFrame,
    lang_col: str,
    budget: int,
    epoch_cap: float = 4.0,
) -> DataFrame:
    """UniMax language-budget allocation (Chung et al. 2023): spread a
    training budget UNIFORMLY across languages, except no language may
    repeat more than ``epoch_cap`` epochs of its available data.

    The paper's sequential procedure (visit languages smallest-first;
    give each ``min(avail*cap, remaining_budget/remaining_langs)``) is
    exactly uniform water-filling against per-language caps, so it has
    the same closed form as :func:`domain_mixture_quotas` with unit
    weights and ``cap = avail*epoch_cap``: languages with cap below the
    water level λ saturate, the rest get λ, and λ solves
    ``sum(min(cap_l, λ)) = budget`` via one prefix-scan over languages
    sorted by cap — no driver loop.

    Returns one row per language: ``(lang, avail, cap, alloc,
    epochs)`` with ``alloc`` floored to integers and ``epochs =
    alloc/avail``.  If the caps cannot absorb the budget every language
    saturates (``alloc = cap`` floored).

    Scale shape: ONE map-side-combinable groupBy(lang) count, then
    window math over the k-language table — k is bounded by the world's
    language inventory, so the single-partition window is constant-size
    by construction.
    """
    from pyspark.sql import Window

    counts = df.groupBy(F.col(lang_col).alias("lang")).agg(
        F.count(F.lit(1)).cast("double").alias("avail")
    )
    capped = counts.withColumn(
        "cap", F.round(F.col("avail") * F.lit(float(epoch_cap)), 6)
    )

    order = Window.orderBy("cap", "lang")
    everything = Window.partitionBy()
    prefix_cap = F.coalesce(
        F.sum("cap").over(order.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0.0),
    )
    n_langs = F.count(F.lit(1)).over(everything)
    rn = F.row_number().over(order)
    # λ candidate at row i: spread what the i..k tail must absorb evenly
    lam_cand = (F.lit(float(budget)) - prefix_cap) / (
        n_langs - rn + F.lit(1)
    ).cast("double")
    annotated = capped.select(
        "lang",
        "avail",
        "cap",
        rn.alias("rn"),
        lam_cand.alias("lam_cand"),
    )
    first_valid = F.min(
        F.when(F.col("lam_cand") <= F.col("cap"), F.col("rn"))
    ).over(everything)
    lam = F.max(
        F.when(F.col("rn") == first_valid, F.col("lam_cand"))
    ).over(everything)
    alloc = F.when(
        lam.isNull() | (F.col("rn") < first_valid), F.col("cap")
    ).otherwise(F.least(F.col("cap"), lam))
    # round before flooring so the DuckDB oracle lands on identical ints
    alloc_i = F.floor(F.round(alloc, 6))
    return annotated.select(
        "lang",
        F.col("avail").cast("bigint").alias("avail"),
        F.floor(F.round(F.col("cap"), 6)).cast("bigint").alias("cap"),
        alloc_i.cast("bigint").alias("alloc"),
        F.round(alloc_i / F.col("avail"), 6).alias("epochs"),
    )

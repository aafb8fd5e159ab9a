"""The distributed extraction pipeline (SURVEY.md §4.4 physical sketch):

    scan documents (pruned by resume bucket filter)
      → salted repartition on (cost_bucket, salt)     # skew-taming shuffle
      → mapInPandas(extract_iter)                     # ONLY Python stage
      → write documents_extracted partitioned by bucket (idempotent)
      → per-bucket metrics agg → _progress manifest commit

Spark-first notes:
  * All pre/post-UDF expressions are built-in pyspark.sql.functions
    (JVM, whole-stage codegen): payload-cost estimation uses
    F.aggregate over the spans array, never Python.
  * The skew story (north_star "explicit salted repartitioning to tame
    skew from oversized PDFs"): scan order would otherwise cluster the
    oversized cohort into the tasks that read their row groups. We
    repartition on a uniform salt derived from xxhash64(doc_id), with
    heavyweight docs (payload ≥ OVERSIZE_COST_BUCKET_BYTES) spread
    round-robin so no two giants must share a task; Arrow batches are
    additionally re-chunked by cumulative payload bytes inside the UDF
    so one giant can't blow a batch (analog of the reference's 50 MB
    admission cap world, docling-pdf config.py:20).
  * Errors are rows (pdf_extractor.py:357-369) — a poisoned doc never
    kills a task, so speculative re-execution stays safe.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docling_pdf_spark.checkpoint import BucketManifest, ProgressLog
from docling_pdf_spark.conf import OVERSIZE_COST_BUCKET_BYTES, SALT_BUCKETS
from docling_pdf_spark.schemas import EXTRACTED_SCHEMA

MAX_BATCH_PAYLOAD_BYTES = 8 * 1024 * 1024  # re-chunk bound inside the UDF


def _cost_expr():
    """Payload bytes per doc, computed JVM-side over the spans array
    (whole-stage codegen; no Python touches this)."""
    return F.aggregate(
        F.coalesce(F.col("spans"), F.array()),
        F.lit(0).cast("long"),
        lambda acc, s: acc + F.coalesce(F.length(s["text"]), F.lit(0)).cast("long"),
    )


def with_cost(df: DataFrame) -> DataFrame:
    return df.withColumn("_cost_bytes", _cost_expr())


def salted_repartition(df: DataFrame, num_partitions: int) -> DataFrame:
    """Explicit skew-taming shuffle (SURVEY.md §4.3.1).

    Light docs: uniform hash salt over doc_id. Heavy docs (oversized
    cohort): a distinct per-doc salt stream so they scatter one-per-task
    instead of landing wherever the scan found them.
    """
    df = with_cost(df)
    salt = F.pmod(F.xxhash64("doc_id"), F.lit(num_partitions * SALT_BUCKETS))
    heavy_salt = F.pmod(F.xxhash64("doc_id", F.lit(1)), F.lit(num_partitions))
    df = df.withColumn(
        "_salt",
        F.when(F.col("_cost_bytes") >= OVERSIZE_COST_BUCKET_BYTES, heavy_salt)
        .otherwise(salt),
    )
    return df.repartition(num_partitions, "_salt")


def _chunked_extract_arrow(
    batches: Iterable["pa.RecordBatch"],
) -> Iterator["pa.RecordBatch"]:
    """mapInArrow body: re-chunk each Arrow batch so cumulative payload
    stays under MAX_BATCH_PAYLOAD_BYTES (one oversized doc can't blow a
    batch), then run the shared semantics Arrow-native — the pandas
    object-column round-trip is skipped entirely."""
    from docling_pdf_spark.core.batch import extract_arrow_batch

    for batch in batches:
        n = batch.num_rows
        if not n:
            continue
        idx = batch.schema.get_field_index("_cost_bytes")
        if idx >= 0:
            cost = batch.column(idx).to_pylist()
            # version-safe projection: RecordBatch.drop_columns only
            # exists in pyarrow >= 16 (round-1 ADVICE — older installs
            # are common on managed clusters)
            batch = batch.select(
                [n for n in batch.schema.names if n != "_cost_bytes"]
            )
        else:
            spans_idx = batch.schema.get_field_index("spans")
            cost = [
                0 if ss is None else sum(len(s["text"] or "") for s in ss)
                for ss in batch.column(spans_idx).to_pylist()
            ]
        start = 0
        run = 0
        for i, c in enumerate(cost):
            run += int(c or 0)
            if run >= MAX_BATCH_PAYLOAD_BYTES and i > start:
                yield extract_arrow_batch(batch.slice(start, i - start))
                start, run = i, int(c or 0)
        if start < n:
            yield extract_arrow_batch(batch.slice(start, n - start))


CLUSTER_CV_THRESHOLD = 0.25
DETECT_SAMPLE_FRACTION = 0.01


def detect_cost_sorted(
    df: DataFrame,
    sample_fraction: float = DETECT_SAMPLE_FRACTION,
    threshold: float = CLUSTER_CV_THRESHOLD,
    min_effective_splits: int | None = None,
) -> bool:
    """Is per-doc cost CLUSTERED by scan split? Heavy-only salting
    degrades to a 24× max/median straggler tail on cost-sorted layouts
    (BENCH/BASELINE.md skew table): the giants spread fine, but scan
    splits packed with just-below-threshold docs stay hot. This probe
    lets salt_mode='auto' pick 'full' exactly there.

    Mechanism: group a sampled scan by spark_partition_id — the ACTUAL
    split assignment the UDF stage will inherit (a global-order
    correlation would be fooled by the scan's size-descending file
    bin-packing, which reorders files while leaving each split
    internally cost-homogeneous — the pathology is split COMPOSITION,
    not split order). Verdict: coefficient of variation of the
    per-split mean cost, over the LIGHT cohort only (the heavy cohort
    is round-robin-scattered in every mode, so it can't cause this
    tail). Well-mixed layouts have near-equal split means (CV ≈ 0);
    sorted/clustered layouts spread the means across the whole cost
    distribution (CV ≈ the cost CV, far above threshold).

    A second, independent trigger (min_effective_splits): the light
    branch inherits the scan partitioning, so if the light cohort's
    rows concentrate in too few splits — effective parallelism
    N²/Σn_i², the inverse Simpson index — heavy-only serializes the
    whole light corpus regardless of cost ORDER. (Found by the skew
    harness: a single-row-group sorted file put >50% of the docs in one
    42 s task while the clustering CV was 0, because with one effective
    split there IS no between-split variance.) extract() passes
    num_partitions/4; None skips the check.

    One narrow pass, no shuffle, tiny agg; at 100 TB this extra scan is
    far cheaper than either mistake it prevents (a 100 TB full shuffle,
    or the straggler tail)."""
    light = with_cost(df).where(
        F.col("_cost_bytes") < OVERSIZE_COST_BUCKET_BYTES
    )
    probe = light.select(
        F.spark_partition_id().alias("_pid"),
        F.col("_cost_bytes").cast("double").alias("_c"),
    )

    def _cv(p) -> tuple[int, int, float | None, float | None]:
        """Sampling-noise-corrected CV of per-split means (random-effects
        ANOVA): under a well-mixed layout the sampled split means still
        scatter by ≈ doc_var/n_i pure sampling error — with few sampled
        docs per split that alone can cross any fixed threshold
        (review-found). Subtract the expected sampling variance
        E[Var(m_i)] = doc_var·k/N from the observed between-split
        variance before taking the CV, so only REAL cost clustering
        remains."""
        per = p.groupBy("_pid").agg(
            F.count("*").alias("n"),
            F.sum("_c").alias("s1"),
            F.sum(F.col("_c") * F.col("_c")).alias("s2"),
        )
        row = per.agg(
            F.count("*").alias("k"),
            F.sum("n").alias("rows"),
            F.sum("s1").alias("t1"),
            F.sum("s2").alias("t2"),
            F.sum(F.col("s1") * F.col("s1") / F.col("n")).alias("wms"),
            F.sum(F.col("n") * F.col("n")).alias("nsq"),
        ).head()
        if not row or not row["k"] or not row["rows"]:
            return 0, 0, None, None
        n_tot = float(row["rows"])
        eff = n_tot * n_tot / float(row["nsq"])  # inverse Simpson
        if row["k"] < 2 or not row["t1"]:
            return int(row["rows"]), int(row["k"]), None, eff
        k = float(row["k"])
        mean = float(row["t1"]) / n_tot
        if mean <= 0:
            return int(row["rows"]), int(row["k"]), None, eff
        doc_var = max(0.0, float(row["t2"]) / n_tot - mean * mean)
        # weighted between-split variance: Σ n_i (m_i − mean)² / N
        var_between = max(0.0, float(row["wms"]) / n_tot - mean * mean)
        adjusted = max(0.0, var_between - doc_var * k / n_tot)
        return int(row["rows"]), int(row["k"]), (adjusted ** 0.5) / mean, eff

    # per-split sample floor (second-review finding): at ~1 sampled doc
    # per split the between-split variance IS the doc variance and the
    # ANOVA correction cancels it exactly, blinding the probe on
    # many-small-file sorted layouts. Escalate the fraction until splits
    # average >= MIN_DOCS_PER_SPLIT sampled docs (one escalation, capped
    # at a whole-probe pass).
    MIN_DOCS_PER_SPLIT = 8
    if sample_fraction < 1.0:
        n, k, cv, eff = _cv(probe.sample(fraction=sample_fraction, seed=20250816))
        if n < 100:  # tiny input: the sample is noise — probe it whole
            n, k, cv, eff = _cv(probe)
        elif k and n / k < MIN_DOCS_PER_SPLIT:
            boosted = min(1.0, sample_fraction * MIN_DOCS_PER_SPLIT * k / max(n, 1))
            n, k, cv, eff = _cv(
                probe if boosted >= 1.0
                else probe.sample(fraction=boosted, seed=20250816)
            )
    else:
        n, k, cv, eff = _cv(probe)
    if (
        min_effective_splits is not None
        and eff is not None
        and eff < min_effective_splits
    ):
        return True  # light branch would serialize: full salt regardless
    return cv is not None and cv >= threshold


def resolve_salt_mode(df: DataFrame, num_partitions: int) -> str:
    """THE 'auto' policy, defined once (whole-round-review finding: the
    probe call + min_effective_splits formula were restated in three
    places, letting the skew harness drift from production): full salt
    when the layout is cost-clustered OR the light branch would have
    fewer than num_partitions/4 effective splits; heavy otherwise."""
    return (
        "full"
        if detect_cost_sorted(df, min_effective_splits=max(2, num_partitions // 4))
        else "heavy"
    )


def heavy_only_salting(df: DataFrame, num_partitions: int) -> DataFrame:
    """Skew taming without shuffling the world (the 100 TB-correct
    variant): only the oversized cohort (~0.5% of docs, but the entire
    stage tail if they cluster in one input split) is hash-scattered
    across num_partitions; light docs keep the scan's narrow
    partitioning. Shuffle volume drops from |table| to |heavy cohort|,
    and the JVM ser/deser cost stops competing with the Python workers
    for cores."""
    df = with_cost(df)
    is_heavy = F.col("_cost_bytes") >= OVERSIZE_COST_BUCKET_BYTES
    light = df.where(~is_heavy)
    # round-robin, not hash: with ~#partitions giants, hashing
    # birthday-collides several into one task (measured 25× max/median);
    # round-robin is an exact spread and the determinism sort it needs
    # touches only the heavy cohort
    heavy = df.where(is_heavy).repartition(num_partitions)
    return light.unionByName(heavy)


def extract(
    df: DataFrame,
    num_partitions: int | None = None,
    salt_mode: str = "auto",
) -> DataFrame:
    """documents → documents_extracted as a DataFrame transform.

    Laziness caveat: with salt_mode='auto' (the default) THIS CALL runs
    1–2 small eager probe jobs (the sampled layout scan) before
    returning; every other mode is fully lazy. Callers composing plans
    without wanting execution — or calling extract() repeatedly on the
    same input — should pass an explicit mode ('heavy'/'full'/'none')
    or resolve 'auto' once themselves via detect_cost_sorted (what
    run_extraction does across its commit groups).

    salt_mode:
      'auto' (default)  — probe the layout (detect_cost_sorted) and
                          pick 'full' for cost-sorted inputs, 'heavy'
                          otherwise; closes the documented heavy-only
                          24× footgun without manual mode selection;
      'heavy'           — shuffle only the oversized cohort (above);
      'full'            — shuffle everything on the uniform salt (for
                          adversarially cost-sorted inputs);
      'none'            — trust the input partitioning."""
    if num_partitions:
        if salt_mode == "auto":
            salt_mode = resolve_salt_mode(df, num_partitions)
        if salt_mode == "full":
            df = salted_repartition(df, num_partitions)
        elif salt_mode == "heavy":
            df = heavy_only_salting(df, num_partitions)
        elif salt_mode != "none":
            raise ValueError(f"unknown salt_mode: {salt_mode}")
    cols = ["doc_id", "spans"]
    if "_cost_bytes" in df.columns:
        cols.append("_cost_bytes")
    return df.select(*cols).mapInArrow(_chunked_extract_arrow, schema=EXTRACTED_SCHEMA)


# --------------------------------------------------------------------------
# checkpointed job (resume / lineage / metrics) — SURVEY.md §4.3.2
# --------------------------------------------------------------------------


def run_extraction(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_dir: str,
    n_buckets: int = 16,
    num_partitions: int | None = None,
    buckets_per_commit: int | None = None,
    input_snapshot: str | None = None,
    fail_after_commits: int | None = None,
    salt_mode: str = "auto",
) -> ProgressLog:
    """Checkpointed batch extraction with per-bucket resume.

    The unit of progress is a deterministic doc_id hash bucket (NOT a
    Spark partition id, which is plan-dependent). Completed buckets are
    skipped on re-run; bucket output directories are overwritten
    atomically via dynamic partition overwrite, so a re-run after a
    mid-job kill is idempotent (no dup/missing doc_ids).

    fail_after_commits: test hook — raise after N commit groups to
    simulate a mid-job crash (kill-and-resume test, SURVEY.md §5.2.4).
    """
    log = ProgressLog(checkpoint_dir)
    done = log.done_buckets()

    from docling_pdf_spark.sources.io import file_fingerprint

    current_snapshot = input_snapshot or file_fingerprint(input_path)
    # lineage guard: a completed bucket whose manifest was produced from
    # a DIFFERENT input snapshot must not be silently skipped — the
    # resume would stitch outputs of two different inputs together
    stale = [
        m.partition_id
        for m in log.all_manifests()
        if m.status == "done"
        and m.lineage.get("input_snapshot") not in (None, current_snapshot)
    ]
    if stale:
        raise RuntimeError(
            f"input snapshot changed since buckets {sorted(stale)} were "
            f"committed (manifest lineage mismatch); clear {checkpoint_dir} "
            "or pass the original input"
        )

    docs = spark.read.parquet(input_path)
    docs = docs.withColumn("bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)))
    pending = [b for b in range(n_buckets) if b not in done]
    if not pending:
        return log
    # resolve 'auto' ONCE for the whole job (the layout doesn't change
    # between commit groups; per-group probes would be redundant jobs)
    if salt_mode == "auto" and num_partitions:
        salt_mode = resolve_salt_mode(docs, num_partitions)

    # real lineage token (Iceberg snapshot id in catalog mode; file
    # fingerprint in the parquet fallback) — resume detects when the
    # input changed underneath a completed bucket (guard above)
    snapshot = current_snapshot
    group_size = buckets_per_commit or len(pending)
    groups = [pending[i : i + group_size] for i in range(0, len(pending), group_size)]

    # completeness-guard input counts for ALL pending buckets in ONE
    # doc_id-pruned scan (whole-round-review finding: the per-group
    # recount was an extra full input scan per commit group)
    in_counts = {
        r["bucket"]: int(r["n"])
        for r in docs.where(F.col("bucket").isin([int(b) for b in pending]))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .collect()
    }

    for gi, group in enumerate(groups):
        started = _utcnow_iso(spark)
        sub = docs.where(F.col("bucket").isin([int(b) for b in group]))
        out = extract(
            sub.drop("bucket"), num_partitions=num_partitions, salt_mode=salt_mode
        )
        out = out.withColumn(
            "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets))
        )
        # dynamic partition overwrite → only this group's bucket dirs
        # replaced (the shared overwrite-safe write pins the conf — a
        # default 'static' session would truncate the whole output path)
        from docling_pdf_spark.sources.io import idempotent_partition_overwrite

        idempotent_partition_overwrite(out, ["bucket"], output_path)

        # metrics from the committed output (no recompute of the UDF
        # stage). Explicit schema: an all-empty commit group leaves no
        # parquet files to infer from, and the completeness guard below
        # (not a schema-inference crash) must be what reports that.
        stats = (
            spark.read.schema(out.schema).parquet(output_path)
            .where(F.col("bucket").isin([int(b) for b in group]))
            .groupBy("bucket")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum(F.col("extraction_successful").cast("long")).alias("n_ok"),
                F.sum(F.col("n_chars")).alias("chars"),
                F.sum(F.col("n_words")).alias("words"),
                F.sum(F.col("n_pages").cast("long")).alias("pages"),
            )
            .collect()
        )
        finished = _utcnow_iso(spark)
        by_bucket = {r["bucket"]: r for r in stats}
        # completeness guard (reference main.py:232-236 analog: a task
        # marked completed with no result is a 500, not a success): a
        # bucket whose input slice is non-empty must never be committed
        # 'done' with zero output rows — that would make resume skip it
        # forever. Counts precomputed once for the whole job above.
        for b in group:
            r = by_bucket.get(b)
            n_docs = int(r["n_docs"]) if r else 0
            n_ok = int(r["n_ok"]) if r else 0
            if n_docs == 0 and in_counts.get(b, 0) > 0:
                raise RuntimeError(
                    f"bucket {b}: output is empty but its input slice has "
                    f"{in_counts[b]} docs — refusing to commit 'done' "
                    "(completeness guard); the bucket stays pending for resume"
                )
            log.commit(
                BucketManifest(
                    partition_id=int(b),
                    status="done",
                    n_docs=n_docs,
                    n_ok=n_ok,
                    n_failed=n_docs - n_ok,
                    metrics={
                        "chars": int(r["chars"]) if r else 0,
                        "words": int(r["words"]) if r else 0,
                        "pages": int(r["pages"]) if r else 0,
                    },
                    lineage={
                        "input_snapshot": snapshot,
                        "partition_key": f"bucket={b}",
                    },
                    started_at=started,
                    finished_at=finished,
                )
            )
        if fail_after_commits is not None and gi + 1 >= fail_after_commits:
            raise RuntimeError(f"injected failure after {gi + 1} commit group(s)")
    return log


def _utcnow_iso(spark: SparkSession) -> str:
    """Real timestamps (deliberate improvement over the reference's
    always-null created_at/completed_at, redis_manager.py:57,122)."""
    import datetime

    return datetime.datetime.now(datetime.timezone.utc).isoformat()

"""spark-submit entrypoint for the training-data CURATION pipeline —
the 100 TB use case the operators exist for, chained end to end:

    extract (interleaved docs → span table, mapInArrow)
      → quality gates   (JVM expressions: length / token / digit ratio)
      → exact dedup     (keep lowest doc_id per md5(full_text))
      → near-dup drop   (MinHash-LSH pairs; drop the higher doc_id of
                         every pair above the Jaccard-estimate cutoff)
      → curated parquet + ONE JSON line of funnel counts

Every stage is one of the tested library operators; this job is the
composition, not new logic. Scale notes: the only Python stage is the
extraction UDF; quality gates are codegen filters; both dedups shuffle
once on their key (hash / band bucket with the mega-bucket cap); the
near-dup drop side is a distinct-id anti-join whose strategy AQE picks
at runtime (broadcast only when measured small — a forced broadcast
would OOM at crawl-scale dup rates).

    spark-submit --py-files dist/docling_pdf_spark.zip jobs/curate.py \
        --input <documents parquet> --output <curated path> \
        [--min-chars 80] [--max-digit-ratio 0.3] [--jaccard 0.8]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _dsir_keep_count(n: int, frac: float) -> int:
    """Floor of the EXACT product (the +1e-9 absorbs float
    representation error: 90*0.7 = 62.99999... must keep 63,
    review-found); keep at least one doc when any survive — a tiny
    corpus at frac 0.5 silently dropping EVERYTHING is never what the
    flag meant."""
    if n <= 0:
        return 0
    return max(1, math.floor(n * frac + 1e-9))


def curate(
    spark,
    input_path: str,
    output_path: str,
    min_chars: int = 80,
    min_tokens: int = 10,
    max_digit_ratio: float = 0.3,
    jaccard: float = 0.8,
    num_partitions: int | None = None,
    near_dup: str = "minhash",
    cluster_resolve: bool = False,
    strip_boilerplate: int | None = None,
    cosine: float = 0.9,
    decon_eval: str | None = None,
    decon_gram_words: int = 8,
    max_dup_line_frac: float | None = None,
    max_dup_para_frac: float | None = None,
    max_top_bigram_frac: float | None = None,
    max_top_3gram_frac: float | None = None,
    max_top_4gram_frac: float | None = None,
    max_symbol_word_ratio: float | None = None,
    max_bullet_line_frac: float | None = None,
    max_ellipsis_line_frac: float | None = None,
    redact_pii: bool = False,
    redact_pii_aggressive: bool = False,
    mix_budget: int | None = None,
    mix_weights: dict[str, int] | None = None,
    mix_stratum: str = "producer",
    shuffle_seed: int | None = None,
    dsir_target: str | None = None,
    dsir_keep_frac: float = 0.5,
    dsir_hash: str = "fast",
    quality_exemplars: str | None = None,
    quality_threshold: float = 0.5,
):
    """documents → curated extracted corpus; returns the funnel dict.

    near_dup: 'minhash' (word-level Jaccard estimate ≥ `jaccard`),
    'winnow' (shared winnowed rolling-hash fingerprints — catches
    partial-passage reuse a whole-doc similarity score dilutes away),
    or 'embedding' (feature-hashed text vectors, IVF-bucketed cosine
    pairs ≥ `cosine` — the embedding-space path; swap the hashing-trick
    embedder for model vectors to dedupe semantically).

    decon_eval: optional parquet of benchmark/eval documents (needs a
    `text` column); any curated doc sharing a word-`decon_gram_words`-
    gram with the eval set is dropped (n-gram decontamination). The
    eval gram set is distinct + broadcast — benchmarks stay
    broadcastable at any corpus scale, so the training side pays one
    narrow gram pass and no corpus-scale shuffle."""
    from pyspark.sql import functions as F

    from docling_pdf_spark.functions.text import digit_ratio, token_count
    from docling_pdf_spark.operators.dedup import minhash_lsh_dedup
    from docling_pdf_spark.operators.winnow import winnow_near_dup_pairs
    from docling_pdf_spark.pipeline import extract

    def _join_text_spans(delim: str) -> "F.Column":
        # the ONE definition of "a document's text" for the gates below
        # (the repetition gate re-joins with '\n\n' — same span
        # selection, different delimiter; keep them from drifting)
        return F.array_join(
            F.transform(
                F.filter(F.coalesce(F.col("spans"), F.array()),
                         lambda s: s["kind"] == "text"),
                lambda s: s["text"],
            ),
            delim,
        )

    # fail fast on mix-stage argument mistakes BEFORE any Spark action
    # runs — a bad flag must not cost the whole funnel (review-found)
    if (mix_budget is None) != (mix_weights is None):
        raise ValueError("mix_budget and mix_weights must be set together")
    if mix_budget is not None:
        from docling_pdf_spark.operators.mixer import _check_weights

        _check_weights(mix_weights)
        if mix_budget < 0:
            raise ValueError(f"mix_budget must be >= 0, got {mix_budget}")
    if dsir_target is not None:
        if not (0.0 < dsir_keep_frac <= 1.0):
            raise ValueError(
                f"dsir_keep_frac must be in (0, 1], got {dsir_keep_frac}"
            )
        if dsir_hash not in ("portable", "fast"):
            raise ValueError(
                f"dsir_hash must be portable|fast, got {dsir_hash!r}"
            )
    if quality_exemplars is not None and not (
        0.0 <= quality_threshold <= 1.0
    ):
        raise ValueError(
            f"quality_threshold must be in [0, 1], got {quality_threshold}"
        )
    # eager side-input contract checks: a bad path or schema must not
    # cost the whole funnel (review-found — the exemplar read used to
    # happen only after the corpus had already been processed). Schema
    # reads are footer-only; the label-domain probe is one job over
    # the SMALL exemplar file, never the corpus.
    for _path, _need in (
        (decon_eval, {"text"}),
        (dsir_target, {"text"}),
        (quality_exemplars, {"text", "label"}),
    ):
        if _path:
            _cols = set(spark.read.parquet(_path).columns)
            if not _need <= _cols:
                raise ValueError(
                    f"exemplar parquet {_path!r} must have columns "
                    f"{sorted(_need)}, found {sorted(_cols)}"
                )
    if quality_exemplars is not None:
        _bad = (
            spark.read.parquet(quality_exemplars)
            .where(
                # validate WITHOUT truncation: cast-to-int would floor
                # a fractional label like 0.9 to 0 and let it pass,
                # only to crash hours later at LogisticRegression.fit
                # (round-6 advice, low)
                F.col("label").isNull()
                | ~F.col("label").cast("double").isin(0.0, 1.0)
            )
            .limit(1)
            .count()
        )
        if _bad:
            raise ValueError(
                "quality_exemplars labels must all be 0 or 1 (a "
                "multi-class label would silently fit a multinomial "
                "model and crash at scoring)"
            )

    # per-stage observability (r5 VERDICT #6): Spark is lazy, so each
    # stage's wall time is attributed to the ACTION that materializes
    # it (the counts the funnel needs anyway). The stages list rides
    # in the funnel JSON so a 100 TB operator can see which stage
    # moved without a bench harness.
    stages: list[dict] = []

    def _stage(name: str, rows_in, action):
        t = time.perf_counter()
        out = action()
        stages.append(
            {"stage": name, "wall_s": round(time.perf_counter() - t, 3),
             "rows_in": rows_in, "rows_out": out}
        )
        return out

    docs = spark.read.parquet(input_path)
    n_input = _stage("read_input", None, docs.count)
    emb_cached = None

    extracted = extract(docs, num_partitions=num_partitions)
    # full_text for the text operators: re-join the text spans (JVM)
    with_text = extracted.withColumn("full_text", _join_text_spans("\n"))
    # eager --mix-stratum validation (round-6 advice, low): a typo'd
    # stratum column must fail HERE, before the whole funnel (extract,
    # dedup, decon, classifier, dsir) has executed and been paid for —
    # the withColumn inside the mix stage would only raise at the end.
    if mix_budget is not None and mix_stratum not in with_text.columns:
        raise ValueError(
            f"--mix-stratum {mix_stratum!r} is not a column of the "
            f"extracted frame; available: {sorted(with_text.columns)}"
        )
    # persist at the extraction boundary: every downstream count and the
    # final write reuse ONE pass of the (dominant-cost) Python UDF stage
    ok = with_text.where(F.col("extraction_successful")).persist()
    n_ok = _stage("extract", n_input, ok.count)
    # quality gates — pure codegen predicates on the extracted text
    quality = ok.where(
        (F.col("n_chars") >= min_chars)
        & (token_count("full_text") >= min_tokens)
        & (digit_ratio("full_text") <= max_digit_ratio)
    )
    # optional Gopher line-shape gates — pure per-row expressions over
    # the '\n'-joined text (no shuffle; they fuse into the same
    # codegen filter stage as the length gates above)
    line_shape_thresholds = [
        ("symbol_word_ratio", max_symbol_word_ratio),
        ("bullet_line_frac", max_bullet_line_frac),
        ("ellipsis_line_frac", max_ellipsis_line_frac),
    ]
    if any(v is not None for _, v in line_shape_thresholds):
        from docling_pdf_spark.operators import quality as Q

        for name, v in line_shape_thresholds:
            if v is not None:
                quality = quality.where(getattr(Q, name)(F.col("full_text")) <= v)
    # optional Gopher-style repetition gates (dup-line / dup-paragraph /
    # top-bigram fractions): a second quality sub-stage — the signals
    # need an explode+agg per doc, so they only run when a threshold is
    # actually set. Shuffles on doc_id; the semi-join back is
    # co-partitioned on the same key.
    rep_thresholds = [
        ("dup_line_frac", max_dup_line_frac),
        ("dup_para_frac", max_dup_para_frac),
        ("top_bigram_frac", max_top_bigram_frac),
        ("top_3gram_frac", max_top_3gram_frac),
        ("top_4gram_frac", max_top_4gram_frac),
    ]
    if any(v is not None for _, v in rep_thresholds):
        from docling_pdf_spark.operators.quality import repetition_stats

        # join the text SPANS with '\n\n' for this pass: each extracted
        # block is a paragraph, so the \n{2,} paragraph split sees real
        # boundaries (full_text's single-'\n' join would make every doc
        # one paragraph and the dup-para gate inert — review-found);
        # line semantics are unchanged (split on '\n' drops the empty
        # string between blocks). Only the thresholded signals are
        # computed — the bigram pass is the expensive one.
        rep_text = _join_text_spans("\n\n")
        rep = repetition_stats(
            quality.select("doc_id", rep_text.alias("text")),
            signals=tuple(c for c, v in rep_thresholds if v is not None),
        )
        for col, v in rep_thresholds:
            if v is not None:
                rep = rep.where(F.col(col) <= v)
        quality = quality.join(rep.select("doc_id"), "doc_id", "left_semi")
    n_quality = _stage("quality_gates", n_ok, quality.count)

    # optional corpus-frequency boilerplate strip (CCNet-style): lines
    # shared by >= N distinct docs are removed from every TEXT SPAN,
    # offsets rebuilt, media links remapped (operators/boilerplate.py).
    # Runs BEFORE dedup on purpose: shared footers/banners inflate
    # every downstream similarity (two unrelated pages sharing a 40-word
    # cookie banner look near-dup), so dedup must see cleaned text.
    # full_text and the char/word metrics are recomputed from the
    # rebuilt spans so the gates' single source of truth stays true.
    removed_boilerplate = 0
    bp_cached = None
    if strip_boilerplate is not None:
        from docling_pdf_spark.operators.boilerplate import (
            strip_boilerplate_spans,
        )

        def _strip_and_count():
            nonlocal quality, removed_boilerplate, bp_cached
            stripped = strip_boilerplate_spans(
                quality, min_docs=strip_boilerplate
            )
            quality = bp_cached = (
                stripped.withColumn("full_text", _join_text_spans("\n"))
                .withColumn("n_chars", F.length("full_text").cast("long"))
                .withColumn("n_words", token_count("full_text").cast("long"))
                .persist()
            )
            n = quality.count()
            removed_boilerplate = (
                quality.agg(F.sum("n_boilerplate_removed")).collect()[0][0]
                or 0
            )
            quality = quality.drop("n_boilerplate_removed")
            return n

        _stage("strip_boilerplate", n_quality, _strip_and_count)

    # exact dedup: keep the lexicographically-first doc_id per text hash
    # — one shuffle on the hash (a broadcast keeper list would be
    # corpus-sized at realistic dup rates and OOM at 100 TB)
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5("full_text")).orderBy("doc_id")
    exact = (
        quality.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    n_exact = _stage("exact_dedup", n_quality, exact.count)

    # near-dup drop: for every candidate pair, drop doc_b
    # (deterministic: pairs are emitted with doc_a < doc_b)
    texts = exact.select("doc_id", F.col("full_text").alias("text"))
    if near_dup == "minhash":
        pairs = minhash_lsh_dedup(texts, threshold=jaccard)
    elif near_dup == "winnow":
        # containment, not an absolute count: random same-vocabulary
        # docs share incidental substrings (measured 99th percentile
        # 0.88 on the synthetic corpus), while a true near-dup reuses
        # ~all of the smaller doc's fingerprint set (planted one-word
        # edit measures 0.94) — whole-doc dedup wants near-total reuse
        pairs = winnow_near_dup_pairs(texts, min_shared=3, min_containment=0.9)
    elif near_dup == "embedding":
        # embed → train coarse centroids (bounded hash-residue sample) →
        # multi-probe IVF bucketing → per-bucket exact cosine. The only
        # broadcast is the collected n×dim centroid list (bounded by
        # construction); the pair/drop side stays un-broadcast for AQE.
        from docling_pdf_spark.operators.dedup import embedding_near_dups_bucketed
        from docling_pdf_spark.operators.similarity import (
            kmeans_centroids,
            text_embedding,
        )

        # persist: centroid training (sample count, seeds, Lloyd
        # iterations), the multi-probe assignment and both sides of the
        # per-bucket self-join would otherwise each recompute the full
        # tokenize→explode→double-groupBy embedding DAG (review-found:
        # ~6-8 passes of the funnel's most expensive derived stage)
        emb = emb_cached = text_embedding(
            texts, dim=32, id_col="doc_id", text_col="text"
        ).persist()
        cents = kmeans_centroids(emb, n=16, iters=3, id_col="doc_id")
        pairs = embedding_near_dups_bucketed(
            emb, cents, threshold=cosine, id_col="doc_id", nprobe=2
        ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    else:
        raise ValueError(f"unknown near_dup mode: {near_dup}")
    # two drop semantics:
    #   pairwise (default): drop doc_b of every pair — keeps every doc
    #     that is never the larger of a pair. Two docs that are both
    #     near-dups of a THIRD (but whose own pair fell under the LSH
    #     threshold) BOTH survive.
    #   cluster (--cluster-resolve): connected components over the
    #     pairs, keep exactly one doc (the min id) per duplicate
    #     cluster — the published-pipeline semantics (transitive
    #     closure). A strict superset of the pairwise drop set: any
    #     doc_b's component min is <= its doc_a < doc_b.
    # The cluster path runs the iterative star-contraction EAGERLY
    # (localCheckpoint per round), so it is built inside the timed
    # stage action to keep the funnel's wall attribution honest.
    curated = cur_cached = None

    def _near_drop_and_count():
        nonlocal curated, cur_cached
        if cluster_resolve:
            from docling_pdf_spark.operators.components import (
                connected_components,
            )

            cc = connected_components(pairs)
            drop = cc.where(F.col("id") != F.col("component")).select(
                F.col("id").alias("doc_id")
            )
        else:
            drop = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
        # no broadcast hint: on real crawl data near-dup rates hit
        # 30-50%, so the drop list is O(duplicate docs) — TB-scale at
        # 100 TB input — and a forced broadcast OOMs the driver
        # (round-2 ADVICE). AQE picks broadcast on its own when the
        # built side is measured small.
        # persist + count at the near-dup boundary (always, since r6):
        # the count IS the near_dup stage's timing action, and the
        # persisted set is reused by the decon subtree (both sides) and
        # the final write instead of re-running the pair DAG
        # (review-found in r4 for the decon path; unified here for
        # stage observability)
        curated = cur_cached = exact.join(drop, "doc_id", "left_anti").persist()
        return curated.count()

    n_after_near = _stage("near_dup_drop", n_exact, _near_drop_and_count)

    # THE whitespace-normalization rule for every gram consumer (decon
    # AND dsir): full_text joins spans with '\n' and exemplar dumps
    # carry newlines — split-on-space would otherwise produce
    # 'word8\nword9' tokens that never match across the boundary
    # (review-found; one definition so the stages can't drift)
    def ws_norm(c):
        return F.regexp_replace(F.trim(c), r"\s+", " ")

    def read_exemplars(path, label=False):
        # THE exemplar parquet contract: a `text` column (+ `label`
        # when asked) — one reader for decon, dsir AND the classifier
        # so the normalization rule can't drift (review-found dup)
        if not label:
            return spark.read.parquet(path).select(
                F.lit(0).cast("long").alias("doc_id"),
                ws_norm(F.col("text")).alias("text"),
            )
        from pyspark.sql import Window as _W

        # deterministic unique id: monotonically_increasing_id was
        # review-found nondeterministic across the feature/label
        # join's two scans (silent label misalignment). Exemplar sets
        # are small by construction — the single-partition window is
        # bounded by them, never by the corpus.
        return spark.read.parquet(path).select(
            ws_norm(F.col("text")).alias("text"), F.col("label")
        ).withColumn(
            "doc_id",
            F.row_number().over(_W.orderBy("text", "label")).cast("long"),
        )

    if decon_eval:
        if decon_gram_words < 2:
            # 0 would make every position the empty gram '' on BOTH
            # sides → the whole corpus flags contaminated (review-found)
            raise ValueError(f"decon_gram_words must be >= 2, got {decon_gram_words}")
        from docling_pdf_spark.operators.dedup import _gram_arrays

        ev = read_exemplars(decon_eval)
        ev_grams = (
            _gram_arrays(ev, "doc_id", "text", n=decon_gram_words)
            .select(F.explode(F.array_distinct("grams")).alias("g"))
            .distinct()
        )
        tr_grams = _gram_arrays(
            curated.select("doc_id", ws_norm(F.col("full_text")).alias("text")),
            "doc_id",
            "text",
            n=decon_gram_words,
        ).select("doc_id", F.explode(F.array_distinct("grams")).alias("g"))
        contaminated = (
            tr_grams.join(F.broadcast(ev_grams), "g").select("doc_id").distinct()
        )
        curated = curated.join(contaminated, "doc_id", "left_anti")
    decon_attributed = False

    def _count_attributing_decon(df):
        # the first post-decon counting stage materializes the decon
        # anti-join — attribute its wall + row drop to a decon stage
        # exactly once, whoever counts first (classifier/dsir/mix)
        nonlocal decon_attributed
        t0 = time.perf_counter()
        n = df.count()
        if decon_eval and not decon_attributed:
            stages.append(
                {"stage": "decon",
                 "wall_s": round(time.perf_counter() - t0, 3),
                 "rows_in": n_after_near, "rows_out": n}
            )
            decon_attributed = True
        return n

    n_pre_q = None
    n_after_q = None
    qc_cached = None
    qc_keep = None
    if quality_exemplars is not None:
        # learned quality gate (CCNet-style): LR trained on labeled
        # exemplars (parquet with text + label∈{0,1}), scored over the
        # surviving corpus's full_text; keep P(quality) >= threshold
        from docling_pdf_spark.operators.classifier import (
            score_quality,
            train_quality_classifier,
        )

        qc_cached = curated.persist()
        n_pre_q = _count_attributing_decon(qc_cached)
        t_q = time.perf_counter()
        model = train_quality_classifier(
            read_exemplars(quality_exemplars, label=True)
        )
        scored = score_quality(
            qc_cached.select(
                "doc_id", ws_norm(F.col("full_text")).alias("text")
            ),
            model,
        )
        # persist the (narrow) keep list: without it the whole
        # embed+score DAG re-executes at the next downstream action
        # (review-found — the costliest new stage was running 2x)
        qc_keep = scored.where(
            F.col("quality_prob") >= quality_threshold
        ).select("doc_id").persist()
        curated = qc_cached.join(qc_keep, "doc_id", "left_semi")
        n_after_q = curated.count()
        stages.append(
            {"stage": "quality_classifier",
             "wall_s": round(time.perf_counter() - t_q, 3),
             "rows_in": n_pre_q, "rows_out": n_after_q}
        )
    n_pre_dsir = None
    n_after_dsir = None
    dsir_cached = None
    dsir_keep = None
    if dsir_target is not None:
        # DSIR data selection (Xie et al. 2023): score every surviving
        # doc by the hashed-bigram target/raw log-likelihood ratio and
        # keep the top dsir_keep_frac by weight — exact top-k via the
        # distributed rank kernel, never a single-task sort
        from docling_pdf_spark.operators.dsir import (
            dsir_log_ratios,
            dsir_weights,
        )
        from docling_pdf_spark.operators.shuffle import global_row_number

        dsir_cached = curated.persist()
        n_pre_dsir = _count_attributing_decon(dsir_cached)
        t_ds = time.perf_counter()
        raw_txt = dsir_cached.select(
            "doc_id", ws_norm(F.col("full_text")).alias("text")
        )
        tgt = read_exemplars(dsir_target)
        ratios = dsir_log_ratios(raw_txt, tgt, hash_mode=dsir_hash)
        w = dsir_weights(raw_txt, ratios, hash_mode=dsir_hash)
        k = _dsir_keep_count(n_pre_dsir, dsir_keep_frac)
        ranked = global_row_number(
            w,
            [F.col("dsir_logweight").desc(), F.col("doc_id").asc()],
            out_col="_dsir_rank",
        )
        # persist the narrow keep list so the gram+rank DAG doesn't
        # re-execute at the next downstream action (same review-found
        # double-execution class as the classifier stage)
        dsir_keep = ranked.where(
            F.col("_dsir_rank") <= k
        ).select("doc_id").persist()
        curated = dsir_cached.join(dsir_keep, "doc_id", "left_semi")
        n_after_dsir = curated.count()
        stages.append(
            {"stage": "dsir_select",
             "wall_s": round(time.perf_counter() - t_ds, 3),
             "rows_in": n_pre_dsir, "rows_out": n_after_dsir}
        )
    curated = curated.drop("full_text")
    mix_plan_rows = None
    n_pre_mix = None
    based = None
    if mix_budget is not None:
        # final stage: token-budget mixture (water-filling over the
        # stratum column; strata absent from the weight table are
        # dropped — only the planned mixture enters the corpus). The
        # fill order is deterministic: longest docs first, id tiebreak.
        from docling_pdf_spark.operators.mixer import (
            fill_to_allocation,
            token_budget_mix,
        )

        # persist ONCE: the plan aggregate, the selection's offsets
        # branch and its cumsum branch all re-read this cache instead
        # of re-running the funnel lineage (review-found: with decon
        # enabled the gram-explosion anti-join was executing ~5x)
        based = curated.withColumn(
            "_stratum",
            F.coalesce(F.col(mix_stratum).cast("string"), F.lit("unknown")),
        ).persist()
        n_pre_mix = _count_attributing_decon(based)
        t_m = time.perf_counter()
        plan = token_budget_mix(
            based, mix_weights, mix_budget,
            stratum_col="_stratum", tokens_col="n_words",
        )
        mix_plan_rows = [r.asDict() for r in plan.collect()]
        # rebuild the (tiny, one-row-per-stratum) plan from the rows
        # just collected so the two broadcast joins inside
        # fill_to_allocation don't re-run the plan aggregation
        plan = spark.createDataFrame(mix_plan_rows, schema=plan.schema)
        curated = fill_to_allocation(
            based, plan,
            stratum_col="_stratum", tokens_col="n_words",
            id_col="doc_id", order_by=-F.col("n_chars"),
        ).drop("_stratum")
        stages.append(
            {"stage": "mix_plan",
             "wall_s": round(time.perf_counter() - t_m, 3),
             "rows_in": n_pre_mix, "rows_out": n_pre_mix}
        )
    if redact_pii or redact_pii_aggressive:
        # scrub emails/phones/IPv4s from every span text — one JVM
        # transform over the payload column, applied only to the
        # surviving rows (scrubbing pre-funnel would pay the regex on
        # docs that get dropped anyway)
        from docling_pdf_spark.functions.pii import redact_spans

        curated = curated.withColumn(
            "spans", redact_spans("spans", aggressive=redact_pii_aggressive)
        )
    if shuffle_seed is not None:
        # seeded training-order shuffle: every surviving doc gets a
        # dense 1-based shuffle_rank (portable md5 key, distributed
        # prefix-sum — no corpus-wide single-task sort), and the
        # output files are physically range-ordered by rank: reading
        # the part files in NAME order yields the shuffled order
        # (spark.read orders splits by size — re-sort by rank there)
        from docling_pdf_spark.operators.shuffle import deterministic_shuffle

        nparts = num_partitions or spark.sparkContext.defaultParallelism
        curated = (
            deterministic_shuffle(curated, shuffle_seed)
            .repartitionByRange(nparts, "shuffle_rank")
            .sortWithinPartitions("shuffle_rank")
        )
    # the final stage covers whatever is still unmaterialized: with
    # mix on, decon was already counted at the mix boundary so this is
    # the mixture selection + PII redaction + parquet IO; without mix
    # it is decon (when set) + redaction + IO
    t_w = time.perf_counter()
    curated.write.mode("overwrite").parquet(output_path)
    n_curated = spark.read.parquet(output_path).count()
    stages.append(
        {"stage": ("mix_select_redact_write" if mix_budget is not None
                   else "decon_redact_write"),
         "wall_s": round(time.perf_counter() - t_w, 3),
         "rows_in": (n_pre_mix if n_pre_mix is not None
                     else n_after_dsir if n_after_dsir is not None
                     else n_after_q if n_after_q is not None
                     else n_after_near),
         "rows_out": n_curated}
    )
    if based is not None:
        based.unpersist()
    if dsir_cached is not None:
        dsir_cached.unpersist()
    if dsir_keep is not None:
        dsir_keep.unpersist()
    if qc_cached is not None:
        qc_cached.unpersist()
    if qc_keep is not None:
        qc_keep.unpersist()
    ok.unpersist()
    if bp_cached is not None:
        bp_cached.unpersist()
    if emb_cached is not None:
        emb_cached.unpersist()
    cur_cached.unpersist()

    return {
        "n_input": n_input,
        "n_extracted_ok": n_ok,
        "n_quality": n_quality,
        "n_after_exact_dedup": n_exact,
        "n_curated": n_curated,
        # each funnel stage accounts only for ITS drops, so the numbers
        # always sum: input = failed + quality-drops + exact + near
        # (+ contaminated when decon_eval is set) + kept
        "dropped_extraction_failed": n_input - n_ok,
        "dropped_quality": n_ok - n_quality,
        "dropped_exact_dups": n_quality - n_exact,
        "dropped_near_dups": n_exact - n_after_near,
        **(
            {"removed_boilerplate_lines": int(removed_boilerplate)}
            if strip_boilerplate is not None
            else {}
        ),
        **(
            # the post-decon count is the first one materialized by a
            # downstream stage (classifier, dsir, mix, else the final
            # write), so decon's drop splits cleanly from selections
            {"dropped_contaminated": n_after_near - (
                n_pre_q if n_pre_q is not None
                else n_pre_dsir if n_pre_dsir is not None
                else n_pre_mix if n_pre_mix is not None
                else n_curated
            )}
            if decon_eval
            else {}
        ),
        **(
            {"dropped_quality_model": n_pre_q - n_after_q}
            if quality_exemplars is not None
            else {}
        ),
        **(
            {"dropped_dsir": n_pre_dsir - n_after_dsir}
            if dsir_target is not None
            else {}
        ),
        **(
            {
                "dropped_mix_budget": n_pre_mix - n_curated,
                "mix_plan": mix_plan_rows,
            }
            if mix_budget is not None
            else {}
        ),
        "stages": stages,
    }


def _parse_mix_weights(s: str) -> dict[str, int]:
    """argparse type for --mix-weights: 'stratum=int,stratum=int'.
    Raises ArgumentTypeError (a proper usage error naming the flag)
    on a missing '=', a non-integer weight, or a repeated stratum —
    instead of an opaque unpacking traceback / silent last-wins dedupe
    (review-found)."""
    out: dict[str, int] = {}
    for kv in s.split(","):
        if "=" not in kv:
            raise argparse.ArgumentTypeError(
                f"--mix-weights entry {kv!r} must be STRATUM=WEIGHT"
            )
        k, v = kv.split("=", 1)
        k = k.strip()
        try:
            w = int(v)
        except ValueError:
            raise argparse.ArgumentTypeError(
                f"--mix-weights weight for {k!r} must be an integer, "
                f"got {v!r}"
            ) from None
        if k in out:
            raise argparse.ArgumentTypeError(
                f"--mix-weights names stratum {k!r} more than once"
            )
        out[k] = w
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-chars", type=int, default=80)
    ap.add_argument("--min-tokens", type=int, default=10)
    ap.add_argument("--max-digit-ratio", type=float, default=0.3)
    ap.add_argument("--jaccard", type=float, default=0.8)
    ap.add_argument("--cosine", type=float, default=0.9,
                    help="cosine threshold for --near-dup embedding")
    ap.add_argument("--near-dup", choices=("minhash", "winnow", "embedding"),
                    default="minhash",
                    help="near-dup detector: whole-doc Jaccard estimate "
                         "(minhash), shared rolling-hash fingerprints "
                         "for partial-passage reuse (winnow), or "
                         "IVF-bucketed embedding cosine (embedding)")
    ap.add_argument("--strip-boilerplate", type=int, default=None,
                    metavar="MIN_DOCS",
                    help="remove lines appearing in >= MIN_DOCS distinct "
                         "docs from every text span (CCNet-style corpus "
                         "line dedup; offsets rebuilt, media links "
                         "remapped); runs before dedup so shared "
                         "footers stop inflating similarity")
    ap.add_argument("--cluster-resolve", action="store_true",
                    help="resolve near-dup PAIRS into duplicate "
                         "CLUSTERS (connected components) and keep one "
                         "doc per cluster, instead of the pairwise "
                         "drop-the-larger rule")
    ap.add_argument("--decon-eval", default=None,
                    help="parquet of benchmark docs (text column); curated "
                         "docs sharing any word-n-gram with it are dropped")
    ap.add_argument("--decon-gram-words", type=int, default=8)
    ap.add_argument("--max-dup-line-frac", type=float, default=None,
                    help="drop docs whose duplicate-line fraction exceeds "
                         "this (Gopher uses 0.30); off by default")
    ap.add_argument("--max-dup-para-frac", type=float, default=None,
                    help="duplicate-paragraph fraction gate (Gopher 0.30)")
    ap.add_argument("--max-top-bigram-frac", type=float, default=None,
                    help="top-bigram share gate (Gopher 0.20)")
    ap.add_argument("--max-top-3gram-frac", type=float, default=None,
                    help="top-3-gram share gate (Gopher 0.18)")
    ap.add_argument("--max-top-4gram-frac", type=float, default=None,
                    help="top-4-gram share gate (Gopher 0.16)")
    ap.add_argument("--max-symbol-word-ratio", type=float, default=None,
                    help="hash/ellipsis symbols per word gate (Gopher 0.1)")
    ap.add_argument("--max-bullet-line-frac", type=float, default=None,
                    help="fraction of bullet-started lines gate (Gopher 0.9)")
    ap.add_argument("--max-ellipsis-line-frac", type=float, default=None,
                    help="fraction of ellipsis-ended lines gate (Gopher 0.3)")
    ap.add_argument("--redact-pii", action="store_true",
                    help="scrub emails/phones/SSNs/IPv4 from the curated "
                         "span texts (typed [EMAIL]/[PHONE]/[SSN]/[IP] tokens)")
    ap.add_argument("--redact-pii-aggressive", action="store_true",
                    help="additionally scrub bare 10/11-digit NANP runs and "
                         "IBANs (documented FP classes: unix timestamps, "
                         "10-digit order ids — see functions/pii.py)")
    ap.add_argument("--mix-budget", type=int, default=None,
                    help="total token budget for the final mixture stage "
                         "(exact water-filling over --mix-stratum; "
                         "requires --mix-weights)")
    ap.add_argument("--mix-weights", type=_parse_mix_weights, default=None,
                    help="comma list stratum=weight (positive int grain), "
                         "e.g. 'sparkpdf 2.1=500000,unknown=100000'; "
                         "strata not listed are dropped")
    ap.add_argument("--mix-stratum", default="producer",
                    help="column to stratify the mixture on (NULL values "
                         "map to 'unknown')")
    ap.add_argument("--shuffle-seed", type=int, default=None,
                    help="seeded training-order shuffle: adds a dense "
                         "shuffle_rank column and writes the output "
                         "physically ordered by it (same seed -> same "
                         "order on any cluster size)")
    ap.add_argument("--dsir-target", default=None,
                    help="parquet of exemplar docs (column `text`): "
                         "DSIR-select the top --dsir-keep-frac of the "
                         "surviving corpus by hashed-bigram target/raw "
                         "log-likelihood ratio (Xie et al. 2023)")
    ap.add_argument("--dsir-keep-frac", type=float, default=0.5,
                    help="fraction of docs the DSIR stage keeps (0,1]")
    ap.add_argument("--dsir-hash", choices=("portable", "fast"),
                    default="fast",
                    help="bucket hash: xxhash64 (fast, production) or "
                         "md5-low-60 (portable, DuckDB-checkable)")
    ap.add_argument("--quality-exemplars", default=None,
                    help="parquet of labeled exemplars (columns `text`, "
                         "`label` in {0,1}): train a logistic-regression "
                         "quality filter and keep docs with "
                         "P(quality) >= --quality-threshold")
    ap.add_argument("--quality-threshold", type=float, default=0.5,
                    help="probability cutoff for --quality-exemplars")
    ap.add_argument("--num-partitions", type=int, default=None)
    ap.add_argument("--local-cores", type=int, default=None)
    ap.add_argument("--gen-docs", type=int, default=None,
                    help="synthesize a deterministic corpus at --input first")
    args = ap.parse_args(argv)
    # a dsir tuning flag without --dsir-target would silently run the
    # whole funnel with no DSIR stage — same fail-fast class as the
    # mix_budget/mix_weights pairing (review-found)
    if args.dsir_target is None and (
        args.dsir_keep_frac != 0.5 or args.dsir_hash != "fast"
    ):
        ap.error("--dsir-keep-frac/--dsir-hash require --dsir-target")
    if args.quality_exemplars is None and args.quality_threshold != 0.5:
        ap.error("--quality-threshold requires --quality-exemplars")

    from docling_pdf_spark.fixtures import write_corpus
    from docling_pdf_spark.session import get_spark

    if args.gen_docs:
        os.makedirs(os.path.dirname(args.input) or ".", exist_ok=True)
        write_corpus(args.input, args.gen_docs)

    spark = get_spark("curate", local_cores=args.local_cores)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    funnel = curate(
        spark,
        args.input,
        args.output,
        min_chars=args.min_chars,
        min_tokens=args.min_tokens,
        max_digit_ratio=args.max_digit_ratio,
        jaccard=args.jaccard,
        num_partitions=args.num_partitions,
        near_dup=args.near_dup,
        cluster_resolve=args.cluster_resolve,
        strip_boilerplate=args.strip_boilerplate,
        cosine=args.cosine,
        decon_eval=args.decon_eval,
        decon_gram_words=args.decon_gram_words,
        max_dup_line_frac=args.max_dup_line_frac,
        max_dup_para_frac=args.max_dup_para_frac,
        max_top_bigram_frac=args.max_top_bigram_frac,
        max_top_3gram_frac=args.max_top_3gram_frac,
        max_top_4gram_frac=args.max_top_4gram_frac,
        max_symbol_word_ratio=args.max_symbol_word_ratio,
        max_bullet_line_frac=args.max_bullet_line_frac,
        max_ellipsis_line_frac=args.max_ellipsis_line_frac,
        redact_pii=args.redact_pii,
        redact_pii_aggressive=args.redact_pii_aggressive,
        mix_budget=args.mix_budget,
        mix_weights=args.mix_weights,
        mix_stratum=args.mix_stratum,
        shuffle_seed=args.shuffle_seed,
        dsir_target=args.dsir_target,
        dsir_keep_frac=args.dsir_keep_frac,
        dsir_hash=args.dsir_hash,
        quality_exemplars=args.quality_exemplars,
        quality_threshold=args.quality_threshold,
    )
    funnel["elapsed_sec"] = round(time.perf_counter() - t0, 3)
    funnel["status"] = "done"
    funnel["output"] = args.output
    print(json.dumps(funnel))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""End-to-end training-data curation over url-keyed web-page records.

Composes the engine's curation operators into the standard pre-training
data pipeline, in the order that minimizes wasted work at 100 TB:

1. **Re-key**: `weburl.canonical_url` collapses url aliases (case, default
   ports, tracking params, fragments) so one page has ONE key.
2. **LWW**: per canonical url, keep the latest (warc_ts, lsn) version —
   the same `max_by` partial-agg plan as the CDC replay core (one shuffle,
   hot keys collapse map-side).
3. **Quality gate**: Gopher rules + repetition caps, all row-local native
   expressions — evaluated BEFORE the expensive dedup stages so junk never
   reaches a shuffle.
4. **PII mask**: regexp scrub of the surviving text.
5. **Exact dedup**: one fingerprint hash-agg, keep the min-key row.
6. **Near-dup dedup**: MinHash-LSH candidate pairs → connected components
   (large-star/small-star) → keep each cluster's canonical survivor. Pairs
   are banded, never all-pairs; the component loop is O(log n) rounds.
7. **Quota sample**: deterministic per-language md5-threshold sampling —
   a pure scan filter, so it commutes with everything above and reruns
   reproduce the identical corpus.

`curate()` is a job-level operator (like streaming.runner.ReplayRunner):
it RUNS the pipeline — the near-dup closure is inherently iterative — and
returns the curated DataFrame plus per-stage row counts. Intermediate
stages are eagerly localCheckpoint'ed so the iterative stage never
re-derives the upstream plan, and stage counts are byproducts of those
materializations, not extra full passes.

Reference parity note: the reference pipeline's only curation is "latest
raw file wins" (src/minio_client.rs get_latest_*); everything else here is
the round-2 LLM-data-pipeline extension family applied end-to-end.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions import quality as QL
from ..functions import webqa as WQA
from ..functions import weburl as WU
from . import components as CC
from . import sampling as SMP
from . import textdedup as TD
from .dedup import lww_dedup

#: one source of truth for the LSH tuning shared by the in-batch near-dup
#: stage and the persistent cross-run index — a drift between the two
#: would make their dedup verdicts diverge (or fail index param checks)
DEFAULT_MINHASH: dict = dict(n=3, num_hashes=12, bands=4, threshold=0.5)


@dataclass
class CurateConfig:
    url_col: str = "url"
    ts_col: str = "warc_ts"
    lsn_col: str | None = "lsn"  # None → ties broken by ts alone
    text_col: str = "text"
    lang_col: str = "lang"
    # URL-level gate (FineWeb/RefinedWeb: filter on the url BEFORE any
    # text processing): None disables; () enables with the built-in
    # banned-word heuristics only; a non-empty tuple additionally blocks
    # those registered domains (UT1-style list). Row-local, rides the
    # stage-1 scan.
    url_blocked_domains: tuple[str, ...] | None = None
    # corpus-wide line dedup (C4 order: boilerplate lines removed BEFORE
    # the quality gate judges the text)
    line_dedup: bool = False
    # ExactSubstr repeated-span dedup (Lee et al. 2022): duplicated runs of
    # >= span_dedup_k tokens keep only their corpus-wide first occurrence.
    # Same placement rationale as line dedup — strip shared boilerplate
    # spans before the quality gate judges what's left. None disables.
    span_dedup_k: int | None = None
    # quality gate
    apply_gopher: bool = True
    max_dup_line_frac: float = 0.30
    max_dup_3gram_frac: float = 0.50
    # webtext QA gates (functions/webqa.py), all row-local and riding the
    # same stage-3 scan predicate as Gopher:
    # soft-404 pages (error content served with HTTP 200) and mojibake
    # (U+FFFD / control-char soup from charset mis-decodes).
    drop_soft404: bool = False
    drop_mojibake: bool = False
    # zlib compression-ratio band (RefinedWeb machine-generated-spam
    # signal): keep lo <= len(zlib)/len(utf8) <= hi. Arrow-batched pandas
    # UDF — the only Python in the gate, so it is applied as its own
    # filter AFTER the native predicate has already shrunk the rows.
    # Null-ratio (empty text) docs are dropped when a band is set.
    compression_band: tuple[float, float] | None = None
    # pii
    mask_pii: bool = True
    # corpus-self unigram surprisal band (CCNet-style perplexity filter):
    # (lo, hi) keeps documents with lo <= mean token surprisal <= hi —
    # low-tail = boilerplate, high-tail = rare-token noise. None disables.
    # Runs AFTER the row-local gate (the corpus LM shouldn't be trained on
    # junk the cheap rules already reject) and BEFORE the dedup shuffles.
    # Zero-token documents have undefined surprisal and are DROPPED when a
    # band is set (with the Gopher gate on they are already gone; with
    # --no-gopher the band is the stage that removes them).
    surprisal_band: tuple[float, float] | None = None
    # near-dup (MinHash-LSH → components); None disables the stage
    minhash: dict | None = field(default_factory=lambda: dict(DEFAULT_MINHASH))
    # per-language quotas; None disables sampling
    sample_fractions: dict[str, float] | None = None
    sample_default: float = 1.0
    seed: str = "curate"
    # benchmark decontamination (after dedup — dedup first shrinks the
    # corpus side; the bench set is config-scale either way). The stage
    # runs only when curate() is given a bench DataFrame; these tune it.
    decontaminate_ngram: int = 13
    decontaminate_min_hits: int = 1
    # cross-RUN near-dup dedup: path of a persistent MinHashDedupIndex.
    # When set, stage 6 additionally drops new docs that near-duplicate
    # documents SHIPPED BY PREVIOUS RUNS (probed read-only), and the final
    # survivors are committed to the index — so the index tracks the
    # shipped corpus, and a doc that was sampled/decontaminated away does
    # not suppress future occurrences. ``dedup_index_epoch`` makes the
    # commit exactly-once across job retries.
    dedup_index_path: str | None = None
    dedup_index_epoch: int | None = None
    # band-bucket cap for the index probe: a mass-duplicated page otherwise
    # makes its band key quadratic in the probe join; 50 representatives
    # per bucket is far more than dedup verdicts need.
    dedup_index_max_bucket: int | None = 50
    # multimodal near-dup dedup (stage 6.7): when curate() is given a
    # ``media`` frame (one image per page, keyed by the RAW url), pages
    # whose attached image perceptually near-duplicates another page's
    # image (dHash hamming <= media_max_hamming) keep only the cluster's
    # canonical survivor. Pages without media pass through untouched.
    media_content_col: str = "content"
    media_type_col: str = "media_type"
    media_max_hamming: int = 6
    # DSIR importance selection (Xie et al. 2023): keep the dsir_top
    # documents most like the target domain, where the target sample is
    # the survivors matching this SQL predicate (e.g. "lang = 'en'").
    # Runs LAST among content stages — the importance LM should be fit on
    # curated text, not on junk earlier stages remove. Both set or neither.
    dsir_target: str | None = None
    dsir_top: int | None = None


def curate(
    df: DataFrame,
    cfg: CurateConfig,
    bench: DataFrame | None = None,
    media: DataFrame | None = None,
) -> tuple[DataFrame, dict[str, int]]:
    """Run the pipeline; returns (curated DataFrame, stage-count stats).

    Input columns: cfg.url_col, cfg.ts_col, (cfg.lsn_col), cfg.text_col,
    cfg.lang_col — extra columns are carried through untouched.

    ``bench`` (optional): eval-benchmark documents with columns
    (bench_id, text) — when given, documents sharing any
    ``cfg.decontaminate_ngram``-gram with the benchmark are dropped after
    dedup (step 6.5).

    ``media`` (optional): one image per page, columns (cfg.url_col RAW —
    canonicalized here to match the stage-1 re-key, cfg.media_content_col
    binary, cfg.media_type_col) — when given, pages whose image is a
    perceptual near-dup of another page's image keep only the cluster's
    canonical survivor (step 6.7: dHash → banded pairs → components).
    """
    stats: dict[str, int] = {}
    u, t = cfg.url_col, cfg.text_col

    # 1. re-key on the canonical url (row-local)
    carried = [c for c in df.columns if c != u]
    base = df.select(WU.canonical_url(u).alias(u), *carried)

    # 1.5 URL gate (optional, row-local — rides the same scan): FineWeb
    # applies its URL filter before touching the body; a page on a blocked
    # or structurally-spammy url never costs a downstream shuffle.
    if cfg.url_blocked_domains is not None:
        base = base.where(
            WU.url_allowed(u, blocked_domains=cfg.url_blocked_domains)
        )

    # 2. LWW per canonical url — the CDC replay core's operator (max_by
    # partial agg), with the version count riding the same aggregation
    order = [cfg.ts_col] + ([cfg.lsn_col] if cfg.lsn_col else [])
    latest = lww_dedup(
        base, key_cols=(u,), order_cols=order, count_col="_versions"
    ).localCheckpoint(eager=True)
    stats["input_rows"] = int(
        latest.agg(F.sum("_versions")).collect()[0][0] or 0
    )
    latest = latest.drop("_versions")
    stats["after_url_lww"] = latest.count()  # metadata count: checkpointed

    # 2.5 corpus-wide line dedup (optional; C4 removes boilerplate lines
    # before judging quality, so a page that is MOSTLY footer fails the
    # word-count rule on its own content)
    if cfg.line_dedup:
        carried = [c for c in latest.columns if c not in (u, t)]
        deduped_text = TD.line_dedup(latest, u, t)
        latest = (
            latest.select(u, *carried)
            .join(deduped_text, u)
            .localCheckpoint(eager=True)
        )
        stats["after_line_dedup"] = latest.count()

    # 2.6 ExactSubstr span dedup (optional): duplicated >=k-token spans
    # keep their corpus-wide first occurrence only (operators/spandedup).
    # The rebuild preserves newline structure, so the stage-3 line-based
    # rules (dup_line_frac, Gopher's per-line heuristics) still judge
    # real lines, not one flattened mega-line.
    if cfg.span_dedup_k is not None:
        from .spandedup import span_dedup

        carried = [c for c in latest.columns if c not in (u, t)]
        stripped = span_dedup(latest, u, t, k=cfg.span_dedup_k)
        latest = (
            latest.select(u, *carried)
            .join(stripped, u)
            .localCheckpoint(eager=True)
        )
        stats["after_span_dedup"] = latest.count()

    # 3. quality gate (row-local, before any dedup shuffle)
    pred = (
        (QL.dup_line_frac(t) <= F.lit(cfg.max_dup_line_frac))
        & (QL.dup_ngram_frac(t, 3) <= F.lit(cfg.max_dup_3gram_frac))
    )
    if cfg.apply_gopher:
        pred = pred & QL.gopher_pass(t)
    if cfg.drop_soft404:
        pred = pred & ~WQA.is_soft404_col(t)
    if cfg.drop_mojibake:
        pred = pred & ~WQA.is_mojibake_col(t)
    kept = latest.where(pred)
    if cfg.compression_band is not None:
        # Separate filter so the Arrow UDF runs on post-gate rows only.
        lo, hi = cfg.compression_band
        kept = kept.where(WQA.compression_ratio(t).between(lo, hi))

    # 4. PII mask (after the gate: only surviving text is rewritten)
    if cfg.mask_pii:
        carried = [c for c in kept.columns if c != t]
        kept = kept.select(*carried, WU.mask_pii(t).alias(t))
    kept = kept.localCheckpoint(eager=True)
    stats["after_quality"] = kept.count()

    # 4.5 corpus-self surprisal band (optional): two keyed aggs + a
    # term-keyed join over the gate's survivors, then an id-keyed
    # semi-join filter.
    if cfg.surprisal_band is not None:
        from .textprep import unigram_surprisal

        lo, hi = cfg.surprisal_band
        ok = (
            unigram_surprisal(kept, u, t)
            .where(F.col("surprisal").between(lo, hi))
            .select(u)
        )
        # Semi-join keeps only scored-in-band docs; zero-token docs have
        # no surprisal row and are dropped by design (documented above).
        kept = kept.join(ok, u, "left_semi").localCheckpoint(eager=True)
        stats["after_surprisal"] = kept.count()

    # 5. exact dedup (one fingerprint hash-agg; keeper = min url).
    # Checkpointed: the component loop below iterates actions over it.
    deduped = TD.exact_dedup(kept, t, u).localCheckpoint(eager=True)
    stats["after_exact_dedup"] = deduped.count()

    # 6. near-dup dedup: banded pairs → components → canonical survivors.
    # materialize=True: the component loop iterates actions, so the pair
    # plan must be computed ONCE (checkpointed), not re-derived per round.
    idx = None
    if cfg.dedup_index_path is not None:
        from .dedup_index import MinHashDedupIndex

        # Merge over the defaults: a PARTIAL cfg.minhash dict is valid for
        # minhash_lsh_pairs (keyword defaults) and must be here too.
        mh = {**DEFAULT_MINHASH, **(cfg.minhash or {})}
        idx = MinHashDedupIndex.create(
            deduped.sparkSession, cfg.dedup_index_path,
            n=mh["n"], num_hashes=mh["num_hashes"], bands=mh["bands"],
            threshold=mh["threshold"], id_type="string",
        )
        # Cross-run: drop new docs near-duplicating anything a PREVIOUS run
        # shipped (read-only probe — within-batch pairs also surface here,
        # but the in-batch stage below owns those via components, so only
        # pairs with an out-of-batch side act). Probe BEFORE the in-batch
        # stage: a new doc that duplicates the shipped corpus must not
        # survive by being its in-batch cluster's representative.
        probe = idx.duplicates(
            deduped, id_col=u, text_col=t,
            max_bucket=cfg.dedup_index_max_bucket,
        )
        ids_a = (
            deduped.select(F.col(u).alias("id_a")).distinct()
            .withColumn("_a_new", F.lit(True))
        )
        ids_b = (
            deduped.select(F.col(u).alias("id_b")).distinct()
            .withColumn("_b_new", F.lit(True))
        )
        flagged = probe.join(ids_a, "id_a", "left").join(ids_b, "id_b", "left")
        # A pair with an out-of-batch (old) side kills its new side; pairs
        # with both sides new are left for the in-batch components stage.
        drop = (
            flagged.where(F.col("_a_new").isNull()).select(F.col("id_b").alias(u))
            .unionByName(
                flagged.where(F.col("_b_new").isNull()).select(F.col("id_a").alias(u))
            )
            .distinct()
        )
        deduped = deduped.join(drop, u, "left_anti").localCheckpoint(eager=True)
        stats["after_index_dedup"] = deduped.count()
    if cfg.minhash is not None:
        pairs = TD.minhash_lsh_pairs(deduped, t, u, **cfg.minhash)
        comp = CC.connected_components(
            deduped.select(u), pairs, "id_a", "id_b", u
        )
        deduped = CC.dedup_representatives(deduped, comp, u)
        deduped = deduped.localCheckpoint(eager=True)
        stats["after_neardup"] = deduped.count()

    # 6.5 benchmark decontamination (bench grams broadcast — one map-side
    # pass over the already-deduped survivors, no corpus shuffle). The
    # corpus text was PII-masked in stage 4, so the bench side must pass
    # through the SAME mask — otherwise any benchmark n-gram containing an
    # email/IP/phone could never match its masked occurrence in the corpus.
    if bench is not None:
        from .decontaminate import decontaminate as _decon

        if cfg.mask_pii:
            bcarried = [c for c in bench.columns if c != "text"]
            bench = bench.select(*bcarried, WU.mask_pii("text").alias("text"))
        deduped = _decon(
            deduped, bench, text_col=t, id_col=u,
            n=cfg.decontaminate_ngram, min_hits=cfg.decontaminate_min_hits,
        ).localCheckpoint(eager=True)
        stats["after_decontaminate"] = deduped.count()

    # 6.7 multimodal near-dup dedup (optional): decode → dHash → banded
    # pairs → components → canonical survivor, over the page-attached
    # images (operators/imagedup.py::media_dedup — the same component
    # machinery as stage 6, so text and image dedup share one tuned
    # closure). A page with a non-surviving image is dropped; pages
    # without media are untouched. Runs after the text stages, and the
    # media frame is first restricted to the pages still alive, so a page
    # already gone (quality/text-dup) never costs an image decode pair —
    # and, just as important, a DROPPED page can never be elected a
    # cluster's canonical survivor (which would silently delete every
    # live member of that cluster; round-5 ADVICE).
    if media is not None:
        from .audiodup import mixed_media_dedup as _media_dedup

        mcarried = [c for c in media.columns if c != u]
        m_canon = media.select(WU.canonical_url(u).alias(u), *mcarried)
        m_canon = m_canon.join(
            deduped.select(u).distinct(), u, "left_semi"
        )
        # mixed dispatch: audio/* payloads fingerprint through the
        # band-energy path, everything else through the image dHash —
        # families dedup separately (unrelated 64-bit signature spaces)
        labels = _media_dedup(
            m_canon, id_col=u, content_col=cfg.media_content_col,
            type_col=cfg.media_type_col,
            image_hamming=cfg.media_max_hamming,
            audio_hamming=cfg.media_max_hamming,
        )
        drop = labels.where(~F.col("is_survivor")).select(u).distinct()
        deduped = deduped.join(drop, u, "left_anti").localCheckpoint(
            eager=True
        )
        stats["after_media_dedup"] = deduped.count()

    # 6.8 DSIR importance selection (optional): fit target/raw unigram LMs
    # on the curated survivors, keep the dsir_top most-target-like docs.
    # One explode + keyed aggs + a distributed partial top-k — see
    # operators/importance.py for the scale shape.
    if cfg.dsir_target is not None and cfg.dsir_top is not None:
        from .importance import importance_weights, select_top

        w = importance_weights(deduped, u, t, F.expr(cfg.dsir_target))
        deduped = select_top(deduped, w, u, cfg.dsir_top).localCheckpoint(
            eager=True
        )
        stats["after_dsir"] = deduped.count()

    # 7. deterministic per-language quota sample (pure filter)
    if cfg.sample_fractions is not None:
        deduped = SMP.stratified_hash_sample(
            deduped, u, cfg.lang_col, cfg.sample_fractions,
            cfg.sample_default, seed=cfg.seed,
        )

    out = deduped.localCheckpoint(eager=True)
    stats["output_rows"] = out.count()
    # 8. index the SHIPPED survivors (cross-run dedup for future batches).
    if idx is not None:
        eid = idx.commit(out, id_col=u, text_col=t, epoch=cfg.dedup_index_epoch)
        stats["index_epoch"] = -1 if eid is None else eid
    return out, stats

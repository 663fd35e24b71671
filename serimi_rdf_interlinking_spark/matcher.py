"""SerimiMatcher — the two-phase interlinking pipeline, Spark-first.

Query lifecycle parity with the reference (SURVEY.md §3):

1. label-property selection over a bounded class sample (A1/A2) +
   stop-word mining (A3) — one driver-small collect + two aggregations;
2. blocking order + chunk assignment (A12/O4/O5) — distributed sort;
3. warm-up chunk (the reference's first 5 sources with the '?p'
   any-predicate search, initializer.rb:94-98) — learns the text
   predicates ($textp) and the searchable predicates
   ($word_by_word_properties, frozen afterwards in batch mode);
4. batched candidate retrieval for all remaining chunks at once
   (J2/J3 + F11) — inverted-index joins instead of one SPARQL round
   trip per source resource (the reference's central bottleneck,
   SURVEY.md §3 entry point 2);
5. chunk-parallel F12 + RDS scoring + adaptive thresholds via
   groupBy(chunk_id).applyInPandas.

Batch-mode divergences from the strictly sequential reference, both
documented in SURVEY.md §7: the searchable-predicate list does not
evolve after the warm-up (no per-hit promotion), and pivots
(use_pivot) require mode='sequential'. mode='sequential' IS
promotion-faithful: each chunk re-retrieves with the evolving
searchable-predicate order (search_module.rb:107-108) and single-group
chunks retry with a doubled limit (O5, initializer.rb:106-122).
"""

from __future__ import annotations

import logging

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

from .config import SerimiConfig
from .operators import rds_core
from .operators.blocking import blocking_order
from .operators.candidates import (
    and_hits,
    apply_hot_token_cap,
    f11_passing,
    phrase_hits,
    prepare_keywords,
    raw_token_index,
    select_candidates,
    word_hits,
)
from .operators.labels import (
    class_members,
    collect_class_sample,
    mine_stopwords,
    select_entity_labels,
)
from .operators.rds import CHUNK_OUTPUT_SCHEMA, make_chunk_kernel

KW_KEY = ["s", "rank", "chunk_id", "label_idx", "kw"]


@dataclass
class MatchResult:
    alignments: DataFrame  # (source, target, score)
    scores: DataFrame      # (chunk_id, src, cand, score, threshold, accepted)
    labels: list[str]
    stopwords: tuple[str, ...]
    textp: list[str]
    search_predicates: list[str]


class SerimiMatcher:
    def __init__(self, cfg: SerimiConfig | None = None):
        self.cfg = cfg or SerimiConfig()
        self._cached: list[DataFrame] = []

    def _release_intermediates(self, keep: tuple[DataFrame, ...] = ()) -> None:
        """Free every tracked localCheckpoint except the frames backing
        the returned result. localCheckpoint storage does NOT go through
        the CacheManager, so `df.unpersist()` is a no-op on it — the
        blocks are released by unpersisting the LogicalRDD's underlying
        RDD directly. Without this, repeated matcher runs in one session
        accumulate executor storage (round-2 verdict hygiene item)."""
        keep_ids = {id(df) for df in keep}
        to_release = [df for df in self._cached if id(df) not in keep_ids]
        rdd_logger = "org.apache.spark.rdd.MapPartitionsRDD"
        jvm = prev_level = None
        if to_release:
            # silence the expected per-RDD "locally checkpointed ...
            # cannot be recomputed after unpersisting" WARN — releasing
            # is deliberate and the frames are never touched again. The
            # suppression is SCOPED to the unpersist loop: the previous
            # effective level is restored in the finally below, so
            # unrelated RDD warnings later in the session still surface.
            try:
                jvm = to_release[0].sparkSession._jvm
                prev_level = jvm.org.apache.logging.log4j.LogManager.getLogger(
                    rdd_logger
                ).getLevel()
                jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
                    rdd_logger, jvm.org.apache.logging.log4j.Level.ERROR
                )
            except Exception:  # pragma: no cover - log tuning only
                jvm = None
        try:
            for df in to_release:
                try:
                    df._jdf.queryExecution().analyzed().rdd().unpersist(False)
                except Exception:  # pragma: no cover - best-effort cleanup
                    log.debug("checkpoint release failed", exc_info=True)
        finally:
            if jvm is not None and prev_level is not None:
                try:
                    jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
                        rdd_logger, prev_level
                    )
                except Exception:  # pragma: no cover - log tuning only
                    pass
        self._cached = [df for df in self._cached if id(df) in keep_ids]

    def _mat(self, df: DataFrame, name: str) -> DataFrame:
        """Materialize a stage boundary.

        Every downstream stage reuses these frames several times; without
        materialization the logical plan re-explodes at each layer (the
        reference's equivalent is its per-query memo cache,
        sparql.rb:78-93). With cfg.checkpoint_dir set this doubles as
        the per-stage checkpoint the north_rule requires (parquet here;
        Iceberg tables on a real deployment); otherwise an eager
        localCheckpoint truncates lineage in memory.
        """
        if self.cfg.checkpoint_dir:
            path = f"{self.cfg.checkpoint_dir}/{self.cfg.run_id}/{name}"
            df.write.mode("overwrite").parquet(path)
            return df.sparkSession.read.parquet(path)
        ck = df.localCheckpoint(eager=True)
        self._cached.append(ck)
        return ck

    # -- retrieval for one keyword frame against one index ----------------
    def _retrieve(
        self,
        keywords: DataFrame,
        index: DataFrame,
        target: DataFrame,
        tiers: dict[str, int] | None,
        textp: list[str] | None,
        stopwords: tuple[str, ...],
        name: str = "retrieve",
    ):
        cfg = self.cfg
        h1 = phrase_hits(keywords, index, tiers)
        p1 = self._mat(f11_passing(h1, target, textp, stopwords, cfg), f"{name}_p1")
        sel_kws = p1.select(*KW_KEY).distinct()
        failed = keywords.filter("searchable").join(sel_kws, KW_KEY, "left_anti")
        # tier-2 only runs for keywords tier-1 missed (the reference's
        # break-on-first-hit). When nothing missed — the common case on
        # well-matched data — skip the whole AND-search job: the
        # emptiness probe over two materialized frames costs far less
        # than an f11 job with its pandas-UDF stages.
        if failed.isEmpty():
            p2 = None
        else:
            h2 = and_hits(failed, index, tiers, stopwords)
            p2 = self._mat(
                f11_passing(h2, target, textp, stopwords, cfg), f"{name}_p2"
            )
        # tier-3 word-by-word (J4) — opt-in: dead code in the reference
        # ($word_by_word never set); only keywords that also failed
        # tier-2 reach it. Promotion folding stays tier-1/2-driven (the
        # reference's $found would never have come from this tier).
        p3 = None
        if cfg.word_by_word and p2 is not None:
            failed2 = failed.join(
                p2.select(*KW_KEY).distinct(), KW_KEY, "left_anti"
            )
            if not failed2.isEmpty():
                h3 = word_hits(failed2, index, tiers, stopwords)
                p3 = self._mat(
                    f11_passing(h3, target, textp, stopwords, cfg),
                    f"{name}_p3",
                )
        cr = select_candidates(keywords, p1, p2, p3)
        # one checkpoint for pairs+searched instead of two: both are
        # multi-consumer downstream, but each eager materialization is a
        # full Spark job and the fixed job overhead dominates at small
        # chunk sizes (the round-1 job-count finding)
        combo = self._mat(
            cr.pairs.select(
                "chunk_id", "rank", "s", F.col("cand").alias("val"),
                F.lit("pair").alias("kind"),
            ).unionByName(
                cr.searched.select(
                    "chunk_id", "rank", "s", F.col("kw").alias("val"),
                    F.lit("kw").alias("kind"),
                )
            ),
            f"{name}_out",
        )
        cr.pairs = combo.filter(F.col("kind") == "pair").select(
            "chunk_id", "rank", "s", F.col("val").alias("cand")
        )
        cr.searched = combo.filter(F.col("kind") == "kw").select(
            "chunk_id", "rank", "s", F.col("val").alias("kw")
        )
        cr.passing_t1 = p1
        cr.passing_t2 = p2
        return cr

    # -- sequential-mode promotion fold ------------------------------------
    def _fold_promotions(self, cr, order: list[str]) -> list[str]:
        """search_module.rb:107-108: after each keyword's search, the
        predicate that produced the hit ($found) is promoted to the
        front of $word_by_word_properties, so later keywords (and later
        chunks) try it first.

        Granularity notes (documented approximations of the strictly
        per-SPARQL-call reference):

        * the reference's $found is the predicate of the last PASSING
          TRIPLE seen by filter() (search_module.rb:252-260) — which
          can be a NON-searched predicate when another description
          literal passes ASM. But "last passing" there follows the
          SPARQL describe result order, which is endpoint-dependent
          and nondeterministic, so exact parity is ill-defined; we
          promote the searched predicate of the keyword's winning tier
          — a deterministic choice inside the reference's own
          ambiguity envelope (round-2 advice, documented trade);
        * inside and_search the 'nsw' variant's filter() runs last
          (search_module.rb:152-167), so when both variants pass, the
          nsw predicate is the one promoted;
        * keyword fold order is (rank, label_idx, kw) — entity order
          by blocking rank, then the reference's per-entity label
          iteration;
        * with cfg.promote_found_predicate the promoted predicate is
          f11's found_p of the winning tier — the predicate of a
          PASSING DESCRIPTION TRIPLE, the reference's actual $found
          source — falling back to the searched-tier predicate when
          the found predicate is outside the learned cascade (keeps
          the restricted index closed; see config.py).
        """
        found_mode = self.cfg.promote_found_predicate
        # min(struct(tier, found_p)): winning tier first, then the
        # deterministic found-predicate pick within that tier
        agg = F.min(F.struct(F.col("tier"), F.col("found_p"))).alias("b")
        t1: dict[tuple, tuple] = {}
        if cr.passing_t1 is not None:
            for r in (
                cr.passing_t1.groupBy("rank", "label_idx", "kw")
                .agg(agg)
                .collect()
            ):
                t1[(r.rank, r.label_idx, r.kw)] = (r.b.tier, r.b.found_p)
        t2and: dict[tuple, tuple] = {}
        t2nsw: dict[tuple, tuple] = {}
        if cr.passing_t2 is not None:
            for r in (
                cr.passing_t2.groupBy("rank", "label_idx", "kw", "variant")
                .agg(agg)
                .collect()
            ):
                d = t2nsw if r.variant == "nsw" else t2and
                key = (r.rank, r.label_idx, r.kw)
                cur = (r.b.tier, r.b.found_p)
                d[key] = min(d.get(key, cur), cur)

        def promoted(tier: int, found_p: str | None) -> str:
            if found_mode and found_p in order:
                return found_p
            return order[tier]

        new_order = list(order)
        for key in sorted(set(t1) | set(t2and) | set(t2nsw)):
            if key in t1:           # tier-1 hit: and_search never ran
                won = promoted(*t1[key])
            elif key in t2nsw:      # nsw filter() runs after 'and'
                won = promoted(*t2nsw[key])
            else:
                won = promoted(*t2and[key])
            new_order = [won] + [p for p in new_order if p != won]
        return new_order

    # -- batch-mode singleton-chunk merge (O5 analogue) --------------------
    def _merge_singleton_chunks(self, cr):
        """The reference's double-and-retry (O5, initializer.rb:106-122)
        absorbs a chunk whose retrieval found candidates for only ONE
        source into the following span — RDS needs >= 2 groups (a
        pseudo-class) to disambiguate, so a singleton chunk would
        otherwise emit nothing. The sequential loop implements the
        stateful doubling; the batch path gets the same recall by
        REASSIGNING chunk ids: walk chunks in order, accumulating until
        a span holds >= 2 retrieved sources (forward merge, like the
        doubled limit). A trailing span still short of 2 merges
        backward into the last emitted span — an intended-semantics
        improvement over the reference's tail-drop (SURVEY §7). The
        per-chunk stats frame is one row per chunk (tiny collect)."""
        counts = sorted(
            (r.chunk_id, r.n)
            for r in cr.pairs.groupBy("chunk_id")
            .agg(F.countDistinct("s").alias("n"))
            .collect()
        )
        new_ids: dict[int, int] = {}
        span: list[int] = []
        span_n = 0
        last_tgt = None
        for cid, n in counts:
            span.append(cid)
            span_n += n
            if span_n >= 2:
                tgt = span[0]
                for c in span:
                    new_ids[c] = tgt
                last_tgt = tgt
                span, span_n = [], 0
        if span and last_tgt is not None:
            for c in span:
                new_ids[c] = last_tgt
        remap = {k: v for k, v in new_ids.items() if k != v}
        if not remap:
            return cr
        log.info(
            "batch mode: merging %d singleton chunk(s) into scorable "
            "spans (O5 analogue)",
            len(remap),
        )
        m = F.create_map(
            *[x for k, v in remap.items() for x in (F.lit(k), F.lit(v))]
        )
        for attr in ("pairs", "searched"):
            df = getattr(cr, attr)
            setattr(
                cr,
                attr,
                df.withColumn(
                    "chunk_id",
                    F.coalesce(m[F.col("chunk_id")], F.col("chunk_id")),
                ),
            )
        return cr

    # -- chunk-kernel input assembly --------------------------------------
    def _chunk_input(
        self, cand_result, source: DataFrame, target: DataFrame
    ) -> DataFrame:
        pairs = cand_result.pairs  # (chunk_id, rank, s, cand)
        searched = cand_result.searched

        desc = target.filter(~F.col("is_bnode")).select(
            F.col("s").alias("cand"), "p", "o", "o_is_uri"
        )
        cand_rows = (
            pairs.join(desc, "cand")
            .select(
                "chunk_id",
                "rank",
                F.col("s").alias("src"),
                F.lit("cand").alias("role"),
                "cand",
                "p",
                "o",
                "o_is_uri",
            )
        )
        srcs = pairs.select("chunk_id", "rank", "s").distinct()
        origin_rows = (
            srcs.join(source, "s")
            .select(
                "chunk_id",
                "rank",
                F.col("s").alias("src"),
                F.lit("origin").alias("role"),
                F.lit("").alias("cand"),
                "p",
                "o",
                "o_is_uri",
            )
            .distinct()
        )
        kw_rows = searched.select(
            "chunk_id",
            "rank",
            F.col("s").alias("src"),
            F.lit("kw").alias("role"),
            F.lit("").alias("cand"),
            F.col("kw").alias("p"),
            F.lit("").alias("o"),
            F.lit(False).alias("o_is_uri"),
        )
        rows = cand_rows.unionByName(origin_rows).unionByName(kw_rows)

        if self.cfg.dbpedia_target:
            from .sources.triples import WIKI_REDIRECT

            redirects = target.filter(F.col("p") == WIKI_REDIRECT).select(
                F.col("s").alias("alias"), F.col("o").alias("rtarget")
            )
            hit_aliases = pairs.join(
                redirects, pairs["cand"] == redirects["alias"]
            )
            rdir_rows = hit_aliases.select(
                "chunk_id",
                "rank",
                F.col("s").alias("src"),
                F.lit("rdir").alias("role"),
                F.col("alias").alias("cand"),
                F.lit("").alias("p"),
                F.col("rtarget").alias("o"),
                F.lit(True).alias("o_is_uri"),
            ).distinct()
            rdesc = (
                hit_aliases.select(F.col("rtarget").alias("cand")).distinct()
                .join(desc, "cand")
            )
            rdesc_rows = (
                hit_aliases.select("chunk_id", "rank", "s", "rtarget")
                .distinct()
                .join(rdesc, hit_aliases["rtarget"] == rdesc["cand"])
                .select(
                    "chunk_id",
                    "rank",
                    F.col("s").alias("src"),
                    F.lit("rdesc").alias("role"),
                    "cand",
                    "p",
                    "o",
                    "o_is_uri",
                )
                .distinct()
            )
            rows = rows.unionByName(rdir_rows).unionByName(rdesc_rows)
        return rows

    # -- warm-up: learn textp + searchable predicates ----------------------
    def _warmup(self, cand_result, source, target, stopwords):
        """Collects the warm-up chunk (<=5 sources) and replays the
        reference's chunk-1 math on the driver: $textp from the chunk's
        candidate data (serimi_module.rb:179) and the searchable
        predicates from its discriminative entropy (serimi_module.rb:28-30).
        Returns (textp, search_predicates, score_rows)."""
        cfg = self.cfg
        rows = self._chunk_input(cand_result, source, target).collect()
        by_src: dict[str, dict] = {}
        ranks: dict[str, int] = {}
        redirect_map: dict[str, str] = {}
        redirect_desc: dict[str, list[tuple]] = {}
        for r in rows:
            if r.role == "rdir":
                redirect_map[r.cand] = r.o
                continue
            if r.role == "rdesc":
                redirect_desc.setdefault(r.cand, []).append(
                    (r.cand, r.p, r.o, bool(r.o_is_uri))
                )
                continue
            d = by_src.setdefault(r.src, {"cand": set(), "origin": set(), "kw": set()})
            if r.role == "cand":
                d["cand"].add((r.cand, r.p, r.o, bool(r.o_is_uri)))
            elif r.role == "origin":
                d["origin"].add((r.p, r.o, bool(r.o_is_uri)))
            elif r.role == "kw":
                d["kw"].add(r.p)
            ranks[r.src] = r.rank
        srcs = sorted(by_src, key=lambda s: ranks[s])
        groups = [sorted(by_src[s]["cand"]) for s in srcs]
        origins = [sorted(by_src[s]["origin"]) for s in srcs]
        searched = [sorted(by_src[s]["kw"]) for s in srcs]

        textp = rds_core.get_text_properties(groups, cfg.text_property_len)
        filtered, disc = rds_core.entity_label_filtering(
            groups, searched, textp, stopwords, cfg.string_threshold,
            cfg.entropy_group_presence,
        )
        # F13 applies to the warm-up chunk too (serimi_module.rb:86 runs
        # for every chunk) — without it the warm-up emits alias URIs.
        if cfg.dbpedia_target and redirect_map:
            from .operators.rds import apply_dbpedia_redirect

            filtered = [
                apply_dbpedia_redirect(g, redirect_map, redirect_desc)
                for g in filtered
            ]
        search_preds = disc[: cfg.max_search_predicates]

        keep = [i for i, g in enumerate(filtered) if len(g) > 0]
        score_rows: list[tuple] = []
        if len(keep) > 1:
            out = rds_core.score_chunk(
                [filtered[i] for i in keep],
                [origins[i] for i in keep],
                textp,
                topk=cfg.topk,
                rds_threshold=cfg.rds_threshold,
                min_overflow_threshold=cfg.overflow_min_threshold,
            )
            kept_srcs = [srcs[i] for i in keep]
            score_rows = [
                (0, kept_srcs[g], c, v, t, a) for g, c, v, t, a in out
            ]
        return textp, search_preds, score_rows

    # -- reference-parity sequential chunk loop -----------------------------
    def _score_chunk_seq(
        self,
        crs: list,
        chunk_id: int,
        pivot_state: tuple,
        textp: list[str],
        stopwords: tuple[str, ...],
    ) -> list[tuple]:
        """Score one collected chunk on the driver: F12 label filtering,
        F13 redirect expansion (dbpedia), RDS scoring with the pivot
        FIFO carried across chunks (serimi_class.rb:279-298,
        initializer.rb:173-179)."""
        from .operators import rds_core
        from .operators.rds import apply_dbpedia_redirect

        cfg = self.cfg
        pivot_groups, pivot_labels, pivot_subjects = pivot_state

        srcs_ranked = sorted({(int(r.rank), r.src) for r in crs if r.role == "cand"})
        groups, origins, searched = [], [], []
        for _rank, src in srcs_ranked:
            groups.append(
                sorted(
                    {
                        (r.cand, r.p, r.o, bool(r.o_is_uri))
                        for r in crs
                        if r.role == "cand" and r.src == src
                    }
                )
            )
            origins.append(
                sorted(
                    {
                        (r.p, r.o, bool(r.o_is_uri))
                        for r in crs
                        if r.role == "origin" and r.src == src
                    }
                )
            )
            searched.append(
                sorted({r.p for r in crs if r.role == "kw" and r.src == src})
            )

        filtered, _disc = rds_core.entity_label_filtering(
            groups, searched, textp, stopwords,
            cfg.string_threshold, cfg.entropy_group_presence,
        )
        if cfg.dbpedia_target:
            redirect_map: dict[str, str] = {}
            redirect_desc: dict[str, list[tuple]] = {}
            for r in crs:
                if r.role == "rdir":
                    redirect_map[r.cand] = r.o
                elif r.role == "rdesc":
                    redirect_desc.setdefault(r.cand, []).append(
                        (r.cand, r.p, r.o, bool(r.o_is_uri))
                    )
            if redirect_map:
                filtered = [
                    apply_dbpedia_redirect(g, redirect_map, redirect_desc)
                    for g in filtered
                ]
        keep = [i for i, g in enumerate(filtered) if g]
        groups2 = [filtered[i] for i in keep]
        origins2 = [origins[i] for i in keep]
        searched2 = [searched[i] for i in keep]
        srcs2 = [srcs_ranked[i][1] for i in keep]
        if len(groups2) <= 1:
            return []

        pg = list(pivot_groups)
        pl = list(pivot_labels)
        all_groups = groups2 + pg
        all_searched = searched2 + pl
        res = rds_core.rds_score(
            all_groups, origins2, textp, cfg.overflow_min_threshold
        )
        # pivot updates (add_pivot, serimi_class.rb:279-298)
        if cfg.use_pivot:
            for gidx, sidx in res.pivot_hits:
                spivot = res.subjects[gidx][sidx]
                if len(pivot_groups) > cfg.pivot_fifo:
                    break
                if spivot in pivot_subjects:
                    continue
                grp = [t for t in all_groups[gidx] if t[0] == spivot]
                pivot_groups.append(grp)
                pivot_labels.append(
                    all_searched[gidx] if gidx < len(all_searched) else []
                )
                pivot_subjects.append(spivot)
                if len(pivot_groups) > cfg.pivot_fifo:
                    pivot_groups.popleft()
                    pivot_labels.popleft()
                    pivot_subjects.pop(0)

        out: list[tuple] = []
        n = len(groups2)
        scores = res.normalized[:n]
        thresholds = rds_core.rds_thresholds(
            scores, topk=cfg.topk, rds_threshold=cfg.rds_threshold
        )
        for gidx in range(n):
            t = thresholds[gidx]
            for s, v in zip(res.subjects[gidx], scores[gidx]):
                out.append((chunk_id, srcs2[gidx], s, v, t, v >= t))
        return out

    def _run_sequential_loop(
        self,
        source: DataFrame,
        target: DataFrame,
        keywords: DataFrame,
        index: DataFrame,
        order0: list[str],
        textp: list[str],
        stopwords: tuple[str, ...],
    ) -> list[tuple]:
        """mode='sequential': the reference's driver loop
        (initializer.rb:93-130) with

        * rank-window chunks: offset starts after the warm-up span,
          limit = sigma;
        * O5 double-and-retry (initializer.rb:106-122): a chunk where
          only ONE source retrieved candidates rewinds and retries the
          same offset with a doubled limit (cap 100); the doubled limit
          persists for later chunks, as in the reference;
        * per-chunk retrieval with the evolving searchable-predicate
          order — the promotion fold runs after every attempt (the
          reference promotes during failed attempts too, since search()
          executed for those subjects);
        * the pivot FIFO and F13 redirect expansion per chunk.

        One chunk collects at a time — this is the parity mode, not the
        scale path. Intended-semantics divergence (SURVEY §7 policy):
        the reference exits the whole loop when a doubled limit exceeds
        the instance count (`while ... limit <= count`,
        initializer.rb:93), silently dropping the tail; we process the
        final short span instead.
        """
        from collections import deque

        cfg = self.cfg
        max_rank = keywords.agg(F.max("rank")).collect()[0][0]
        count = (max_rank if max_rank is not None else -1) + 1
        order = list(order0)
        pivot_state = (deque(), deque(), [])
        out: list[tuple] = []
        offset, limit = cfg.warmup_chunk, cfg.chunk
        chunk_id = 1
        while offset < count:
            span = keywords.filter(
                (F.col("rank") >= offset) & (F.col("rank") < offset + limit)
            )
            tiers = {p: i for i, p in enumerate(order)} if order else None
            cr = self._retrieve(
                span, index, target, tiers, textp, stopwords, f"seq{chunk_id}"
            )
            n_data = cr.pairs.select("s").distinct().count()
            if order:
                order = self._fold_promotions(cr, order)
            if n_data == 1 and offset + limit < count and limit < 100:
                limit += limit
                continue
            if n_data >= 2:
                cr.pairs = cr.pairs.withColumn("chunk_id", F.lit(chunk_id))
                cr.searched = cr.searched.withColumn(
                    "chunk_id", F.lit(chunk_id)
                )
                rows = self._chunk_input(cr, source, target).collect()
                out.extend(
                    self._score_chunk_seq(
                        rows, chunk_id, pivot_state, textp, stopwords
                    )
                )
            offset += limit
            chunk_id += 1
        self.final_search_order = order
        return out

    # -- the pipeline -------------------------------------------------------
    def run(
        self,
        spark: SparkSession,
        source: DataFrame,
        target: DataFrame,
        class_uri: str,
    ) -> MatchResult:
        cfg = self.cfg

        # right-size the shuffle width for this workload: at fixture
        # scale 32-way shuffles cost more in task scheduling than they
        # gain; on real corpora set cfg.shuffle_partitions to the
        # cluster's parallelism. Restored after the run.
        overrides = {
            "spark.sql.shuffle.partitions": str(cfg.shuffle_partitions),
            **cfg.extra.get("spark_conf", {}),
        }
        saved = {k: spark.conf.get(k, None) for k in overrides}
        for k, v in overrides.items():
            spark.conf.set(k, v)
        try:
            return self._run(spark, source, target, class_uri)
        finally:
            for k, v in saved.items():
                if v is not None:
                    spark.conf.set(k, v)

    def _run(
        self,
        spark: SparkSession,
        source: DataFrame,
        target: DataFrame,
        class_uri: str,
    ) -> MatchResult:
        import os
        import time

        cfg = self.cfg
        timing = os.environ.get("SERIMI_TIMING") == "1"
        t0 = time.time()
        # per-stage wall times of the last run (bench_scaling reads
        # these to separate the O(1) driver warm-up from the
        # corpus-proportional scale stages)
        self.last_timings: dict[str, float] = {}

        def tick(label: str) -> None:
            nonlocal t0
            dt = time.time() - t0
            self.last_timings[label] = round(dt, 3)
            if timing:
                print(f"[serimi {label}: {dt:.1f}s]", flush=True)
            t0 = time.time()

        members = class_members(source, class_uri)
        sample = collect_class_sample(source, members, cfg.class_sample_limit)
        labels, _sample_textp = select_entity_labels(
            sample, cfg.text_property_len
        )
        tick("labels")

        # stop-word mining, the blocking order + keyword prep, and the
        # raw token index are mutually independent (stopwords/blocking
        # read only source+members+labels; the index reads only target)
        # — submit them as concurrent jobs (guide §2.6: overlap
        # independent jobs) so one stage's stragglers back-fill with
        # the next stage's tasks. Results are deterministic per stage,
        # so completion order cannot change any downstream value.
        from concurrent.futures import ThreadPoolExecutor

        def _job_stopwords():
            return mine_stopwords(source, members, labels)

        def _job_keywords():
            # blocking_order pins its range-partitioned frame via our
            # _mat so the blocks are released with the other
            # intermediates
            ranked = blocking_order(
                source, members, labels, cfg,
                mat=lambda df: self._mat(df, "blocking_ordered"),
            )
            return self._mat(
                prepare_keywords(source, ranked, labels, cfg), "keywords"
            )

        def _job_index():
            return self._mat(raw_token_index(target, None, cfg), "index_all")

        with ThreadPoolExecutor(max_workers=3) as pool:
            f_sw = pool.submit(_job_stopwords)
            f_kw = pool.submit(_job_keywords)
            f_ix = pool.submit(_job_index)
            stopwords = f_sw.result()
            keywords = f_kw.result()
            index_raw = f_ix.result()
        tick("stopwords+blocking+index")

        # warm-up chunk: any-predicate search (wbwp == ['?p']). The RAW
        # index was materialized above; the hot-token guard scans the
        # checkpointed frame.
        index_all = apply_hot_token_cap(index_raw, cfg)
        kw0 = keywords.filter(F.col("chunk_id") == 0)
        cr0 = self._retrieve(kw0, index_all, target, None, None, stopwords, "warm")
        tick("warm retrieve")
        textp, search_preds, warm_rows = self._warmup(
            cr0, source, target, stopwords
        )
        tick("warmup kernel")

        # the main-retrieval index is DERIVED from the materialized RAW
        # index (a predicate filter over the checkpointed frame) instead
        # of a second full build — saves a target scan and the
        # explode+distinct shuffle. The hot-token cap is RE-APPLIED on
        # the restricted frame (one cheap aggregation over the
        # checkpoint): a token hot on the any-predicate index but cold
        # under the searched predicates keeps its full (small) fan-out,
        # and the capped sample is always drawn from rows that survive
        # the predicate filter — never pre-filter rows that the
        # restriction would then discard.
        if search_preds:
            restricted = index_raw.filter(F.col("p").isin(search_preds))
            if index_all is index_raw:
                # the any-predicate pass found NO hot token (it returns
                # its input unchanged then, hence the identity check),
                # and a predicate-restricted subset can only have
                # SMALLER per-token fan-outs — skip the second scan job
                index = restricted
            else:
                index = apply_hot_token_cap(restricted, cfg)
            tiers = {p: i for i, p in enumerate(search_preds)}
        else:
            index, tiers = index_all, None  # fallback: nothing learned

        if cfg.mode == "sequential" or cfg.use_pivot:
            if cfg.use_pivot and cfg.mode != "sequential":
                log.warning(
                    "use_pivot=True forces the sequential driver loop "
                    "(mode=%r ignored): chunk input collects to the "
                    "driver one chunk at a time — a parity mode, not "
                    "the scale path",
                    cfg.mode,
                )
            seq_rows = self._run_sequential_loop(
                source, target, keywords, index, search_preds, textp,
                stopwords,
            )
            tick("sequential loop")
            scored = spark.createDataFrame(
                warm_rows + seq_rows, CHUNK_OUTPUT_SCHEMA
            )
        else:
            # batched remaining chunks with the learned predicate
            # cascade (frozen after warm-up — SURVEY §7 divergence)
            kwN = keywords.filter(F.col("chunk_id") >= 1)
            crN = self._retrieve(
                kwN, index, target, tiers, textp, stopwords, "main"
            )
            crN = self._merge_singleton_chunks(crN)
            tick("main retrieve")
            # chunk_input feeds exactly ONE consumer (the kernel's
            # groupBy shuffle, itself a barrier), so the eager
            # localCheckpoint bought nothing but an extra job + a copy
            # of the matcher's LARGEST intermediate; it still
            # materializes as a parquet stage checkpoint when
            # cfg.checkpoint_dir asks for durability
            chunk_input = self._chunk_input(crN, source, target)
            if self.cfg.checkpoint_dir:
                chunk_input = self._mat(chunk_input, "chunk_input")
            tick("chunk input")
            kernel = make_chunk_kernel(
                textp,
                stopwords,
                topk=cfg.topk,
                rds_threshold=cfg.rds_threshold,
                filter_threshold=cfg.string_threshold,
                overflow_min=cfg.overflow_min_threshold,
                group_presence=cfg.entropy_group_presence,
                dbpedia=cfg.dbpedia_target,
            )
            # group by a BUCKET of chunks, not per-chunk: the kernel
            # loops chunk_ids inside each pandas group, amortizing the
            # Arrow group-dispatch overhead over cfg.chunks_per_kernel_group
            # chunks while keeping group memory bounded. Keyed on a
            # deterministic chunk_id division so co-bucketed chunks are
            # stable across runs/resumes.
            bucket = F.floor(
                F.col("chunk_id") / F.lit(max(1, cfg.chunks_per_kernel_group))
            ).alias("kernel_bucket")
            scored = (
                chunk_input.withColumn("kernel_bucket", bucket)
                .groupBy("kernel_bucket")
                .applyInPandas(kernel, CHUNK_OUTPUT_SCHEMA)
            )
            if warm_rows:
                warm_df = spark.createDataFrame(warm_rows, CHUNK_OUTPUT_SCHEMA)
                scored = warm_df.unionByName(scored)
        scored = self._mat(scored, "scored")
        tick("rds kernel")
        # the result (alignments + scores) derives only from the scored
        # checkpoint — every earlier intermediate can release its blocks
        self._release_intermediates(keep=(scored,))

        alignments = (
            scored.filter("accepted")
            .select(
                F.col("src").alias("source"),
                F.col("cand").alias("target"),
                F.col("score"),
            )
            .distinct()
        )
        return MatchResult(
            alignments=alignments,
            scores=scored,
            labels=labels,
            stopwords=stopwords,
            textp=textp,
            search_predicates=search_preds,
        )

"""J2/J3 candidate retrieval + F11 similarity filtering, batched.

The reference issues one Virtuoso `bif:contains` query per (keyword,
predicate) with retry-on-error and break-on-first-hit
(search_module.rb:62-198). Here the whole corpus is searched at once:

* an inverted token index over target literals (explode + distinct)
  replaces Virtuoso's text index; per-token fan-out is capped (skew
  guard — hot tokens like 'john' otherwise explode J2, SURVEY.md §7);
* tier-1 phrase search joins each keyword's RAREST token (frequency
  from the index — selectivity + skew avoidance) against the index and
  verifies the phrase JVM-side with instr();
* tier-2 AND search (search_module.rb:126-168) generates the trailing-
  token-drop prefixes (len>=2) and the stopword-stripped variant, joins
  tokens against the index and verifies ALL-tokens-present with a
  countDistinct == prefix-size aggregate;
* F11 (search_module.rb:228-270) scores DISTINCT (keyword, literal)
  pairs with the advanced_string_matching pandas UDF and keeps
  candidate groups whose best literal beats the threshold;
* cascade selection (first predicate tier with a passing hit; first
  label property with any candidate) becomes min-over-priority
  aggregates — batch-evaluating all tiers then selecting is the
  set-oriented equivalent of the reference's sequential break.
"""

from __future__ import annotations

import logging

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

from ..config import SerimiConfig
from ..functions.columns import norm_text, norm_tokens, paren_strip, valid_date_col
from ..functions.udfs import asm_passes_udf

YAGO_PREFIX = "http://dbpedia.org/class/yago/"


# ---------------------------------------------------------------------------
# keyword preparation (F8 hygiene + search-level cleanup)
# ---------------------------------------------------------------------------


def prepare_keywords(
    source: DataFrame,
    ranked: DataFrame,
    labels: list[str],
    cfg: SerimiConfig,
) -> DataFrame:
    """(src, rank, chunk_id, label_idx, kw, kw_norm, searchable).

    Hygiene per serimi_module.rb:159-164 (len<=150, no bnodes, no
    dates, paren-strip, distinct) then search-level cleanup
    (search_module.rb:69-71: '*'->' ', drop '\"', searchable iff
    len>=3). Non-searchable keywords are kept — they still enter
    @searchedlabels for F12 scoring (serimi_module.rb:173).
    """
    label_map = F.create_map(
        *[x for i, lab in enumerate(labels) for x in (F.lit(lab), F.lit(i))]
    )
    kw = (
        source.join(ranked, "s")
        .filter(F.col("p").isin(labels) & ~F.col("is_bnode") & ~F.col("o_is_uri"))
        .withColumn("label_idx", label_map[F.col("p")])
        .filter(F.length("o") <= cfg.keyword_max_len)
        .filter(~valid_date_col("o"))
        .withColumn("kw", paren_strip("o"))
        .withColumn(
            "kw", F.regexp_replace(F.regexp_replace("kw", r"\*", " "), '"', "")
        )
        .select("s", "rank", "chunk_id", "label_idx", "kw")
        .distinct()
        .withColumn("searchable", F.length("kw") >= cfg.min_keyword_len)
        .withColumn("kw_norm", norm_text("kw"))
    )
    return kw


# ---------------------------------------------------------------------------
# inverted token index over target literals
# ---------------------------------------------------------------------------


# membership mechanism switch for the hot-token cap: below this many
# hot tokens an isin() literal is cheapest (no extra join, no plan
# bloat); above it — e.g. a low max_candidates_per_token over a large
# corpus — the literal would inflate the plan/driver, so membership
# goes through a broadcast semi/anti join instead (degrades gracefully
# with the hot-set size).
HOT_LIST_ISIN_MAX = 2048


def raw_token_index(
    target: DataFrame,
    search_predicates: list[str] | None,
    cfg: SerimiConfig,
) -> DataFrame:
    """The UNCAPPED inverted index (tok, cand, p, norm_o) over distinct
    tokens of target literal values — build step only; callers apply
    `apply_hot_token_cap` (directly, or re-apply it after restricting
    `p`, so the cap always reflects the fan-out of the index actually
    joined)."""
    lits = target.filter(~F.col("o_is_uri") & ~F.col("is_bnode"))
    if search_predicates is not None:
        lits = lits.filter(F.col("p").isin(search_predicates))
    if cfg.dbpedia_target:
        lits = lits.filter(~F.col("s").startswith(YAGO_PREFIX))
    if cfg.drop_redirect_candidates:
        # F7 search-time redirect anti-join (dbpedia_filter,
        # search_module.rb:298-304). NOTE: the reference's only call
        # site (search_module.rb:113) is commented out — F7 is dead
        # code there, because dropping redirect-subjects at search time
        # starves F13 redirect expansion (serimi_module.rb:86) of the
        # alias candidates it replaces. Opt-in for users who want
        # redirect stubs out of the candidate budget and do not rely
        # on alias-only labels.
        from ..sources.triples import WIKI_REDIRECT

        redirect_subjects = (
            target.filter(F.col("p") == WIKI_REDIRECT)
            .select(F.col("s").alias("cand"))
            .distinct()
        )
        lits = lits.join(
            redirect_subjects,
            lits["s"] == redirect_subjects["cand"],
            "left_anti",
        )
    return (
        lits.select(
            F.col("s").alias("cand"),
            "p",
            norm_text("o").alias("norm_o"),
        )
        .withColumn("tok", F.explode(F.array_distinct(norm_tokens("norm_o"))))
        .distinct()
    )


def apply_hot_token_cap(idx: DataFrame, cfg: SerimiConfig) -> DataFrame:
    """Skew guard over an inverted index: tokens whose fan-out exceeds
    cfg.max_candidates_per_token are CAPPED to a deterministic sample
    of that many rows (the cap smallest (cand, p, norm_o) triples,
    chosen by a two-level truncating aggregate so no single task ever
    sorts a hot token's full fan-in). A hot token ('john' across 1M
    person labels) contributes no phrase selectivity — tier-1 joins
    only each keyword's rarest token — but its uncapped fan-in would
    quadratically fan out the tier-2 AND join. Capping (rather than
    dropping, the pre-round-3 behavior) keeps a keyword findable even
    when EVERY one of its tokens is hot, while still bounding every
    downstream token join at max_candidates_per_token rows per key —
    no hot-key salting needed.

    The fan-out scan runs on `idx` AS GIVEN: callers that restrict the
    index to the learned search predicates re-apply this cap on the
    RESTRICTED frame (matcher.py), so a token hot on the any-predicate
    index but cold under the searched predicates is never capped — the
    round-3 half-closure of this guard.

    Membership: the hot set is small by construction (distinct tokens
    above the ceiling), so it collects to the driver for the cap
    decision; it is applied as an isin() literal up to
    HOT_LIST_ISIN_MAX tokens and as a broadcast semi/anti join beyond
    that (plan stays bounded however low the ceiling is set)."""
    cap = cfg.max_candidates_per_token
    hot_list = [
        r.tok
        for r in idx.groupBy("tok")
        .agg(F.count("*").alias("fanout"))
        .filter(F.col("fanout") > cap)
        .select("tok")
        .collect()
    ]
    if not hot_list:
        return idx
    log.warning(
        "apply_hot_token_cap: capping %d hot tokens with fan-out > %d "
        "to a deterministic %d-row sample each (bounded-fan-out skew "
        "guard)",
        len(hot_list),
        cap,
        cap,
    )
    if len(hot_list) <= HOT_LIST_ISIN_MAX:
        is_hot = F.col("tok").isin(hot_list)
        cold = idx.filter(~is_hot)
        hot = idx.filter(is_hot)
    else:
        hot_df = F.broadcast(
            idx.sparkSession.createDataFrame(
                [(t,) for t in hot_list], "tok string"
            )
        )
        cols = idx.columns  # USING-join reorders tok first; restore
        cold = idx.join(hot_df, "tok", "left_anti").select(*cols)
        hot = idx.join(hot_df, "tok", "left_semi").select(*cols)
    # two-level truncating top-k (same shape as similarity._partial_topk):
    # level 1 truncates per (tok, input partition) map-side, so the
    # shuffle carries at most cap rows per partition per hot token;
    # level 2 merges to the final deterministic cap-row sample.
    row = F.struct("cand", "p", "norm_o")
    local = (
        hot.groupBy("tok", F.spark_partition_id().alias("part"))
        .agg(F.slice(F.sort_array(F.collect_list(row)), 1, cap).alias("top"))
        .select("tok", F.explode("top").alias("t"))
    )
    capped = (
        local.groupBy("tok")
        .agg(
            F.slice(F.sort_array(F.collect_list("t")), 1, cap).alias("top")
        )
        .select("tok", F.explode("top").alias("t"))
        .select(
            F.col("t.cand").alias("cand"),
            F.col("t.p").alias("p"),
            F.col("t.norm_o").alias("norm_o"),
            "tok",
        )
    )
    return cold.unionByName(capped)


def build_token_index(
    target: DataFrame,
    search_predicates: list[str] | None,
    cfg: SerimiConfig,
    mat=None,
) -> DataFrame:
    """raw_token_index + apply_hot_token_cap in one call (the simple
    entry point when no predicate restriction follows). `mat`
    materializes the RAW index first so the hot-token frequency scan
    reads the checkpointed frame instead of re-running the whole build
    (one full-plan job instead of two); the cap stays lazy over the
    materialized frame."""
    idx = raw_token_index(target, search_predicates, cfg)
    if mat is not None:
        idx = mat(idx)
    return apply_hot_token_cap(idx, cfg)


# ---------------------------------------------------------------------------
# tier-1 phrase search (J2)
# ---------------------------------------------------------------------------


def phrase_hits(
    keywords: DataFrame,
    index: DataFrame,
    tier_of_pred: dict[str, int] | None,
) -> DataFrame:
    """(s, rank, chunk_id, label_idx, kw, tier, cand) — phrase matches.

    tier_of_pred maps searchable predicate -> cascade priority; None
    means the any-predicate warm-up tier ('?p', tier 0 for all)."""
    tok_freq = index.groupBy("tok").agg(F.count("*").alias("tok_freq"))
    ks = keywords.filter("searchable").withColumn(
        "tok", F.explode(F.array_distinct(norm_tokens("kw_norm")))
    )
    ks = ks.join(tok_freq, "tok")  # inner: a missing token -> no phrase hit
    w = (
        ks.groupBy("s", "rank", "chunk_id", "label_idx", "kw", "kw_norm")
        .agg(
            F.min(F.struct(F.col("tok_freq"), F.col("tok"))).alias("rare")
        )
        .select(
            "s", "rank", "chunk_id", "label_idx", "kw", "kw_norm",
            F.col("rare.tok").alias("tok"),
        )
    )
    hits = (
        w.join(index, "tok")
        .filter(
            F.instr(
                F.concat(F.lit(" "), F.col("norm_o"), F.lit(" ")),
                F.concat(F.lit(" "), F.col("kw_norm"), F.lit(" ")),
            )
            > 0
        )
        .filter(F.col("kw_norm") != "")
    )
    if tier_of_pred is None:
        hits = hits.withColumn("tier", F.lit(0))
    else:
        tier_map = F.create_map(
            *[x for p, i in tier_of_pred.items() for x in (F.lit(p), F.lit(i))]
        )
        hits = hits.withColumn("tier", tier_map[F.col("p")]).filter(
            F.col("tier").isNotNull()
        )
    return hits.select(
        "s", "rank", "chunk_id", "label_idx", "kw", "tier", "cand"
    ).distinct()


# ---------------------------------------------------------------------------
# tier-2 AND search (J3) for keywords without a passing tier-1 hit
# ---------------------------------------------------------------------------


def and_hits(
    failed_keywords: DataFrame,
    index: DataFrame,
    tier_of_pred: dict[str, int] | None,
    stopwords: tuple[str, ...],
) -> DataFrame:
    """(s, rank, chunk_id, label_idx, kw, variant, prefix_len, tier, cand).

    variant 'and' = trailing-token-drop prefixes (len>=2, longest
    wins); variant 'nsw' = full token set minus stopwords (len>=2).
    A hit requires every prefix token in the SAME target literal.
    """
    toks = failed_keywords.withColumn("toks", norm_tokens("kw_norm"))
    n = F.size("toks")
    # 'and' prefixes: L = n, n-1, ..., 2 (search_module.rb:134-147)
    prefixes = (
        toks.filter(n >= 2)
        .withColumn("prefix_len", F.explode(F.sequence(F.lit(2), n)))
        .withColumn("ptoks", F.array_distinct(F.slice("toks", 1, F.col("prefix_len"))))
        .withColumn("variant", F.lit("and"))
    )
    sw_arr = F.array([F.lit(x) for x in stopwords]) if stopwords else F.array().cast("array<string>")
    nsw = (
        toks.withColumn("ptoks", F.array_distinct(F.array_except("toks", sw_arr)))
        .filter(F.size("ptoks") >= 2)
        .withColumn("prefix_len", F.size("ptoks"))
        .withColumn("variant", F.lit("nsw"))
    )
    allpre = prefixes.unionByName(nsw, allowMissingColumns=True).withColumn(
        "n_req", F.size("ptoks")
    )
    exploded = allpre.select(
        "s", "rank", "chunk_id", "label_idx", "kw", "variant", "prefix_len",
        "n_req", F.explode("ptoks").alias("tok"),
    )
    joined = exploded.join(index, "tok")
    grouped = (
        joined.groupBy(
            "s", "rank", "chunk_id", "label_idx", "kw", "variant",
            "prefix_len", "n_req", "cand", "p", "norm_o",
        )
        .agg(F.countDistinct("tok").alias("n_hit"))
        .filter(F.col("n_hit") == F.col("n_req"))
    )
    if tier_of_pred is None:
        grouped = grouped.withColumn("tier", F.lit(0))
    else:
        tier_map = F.create_map(
            *[x for p, i in tier_of_pred.items() for x in (F.lit(p), F.lit(i))]
        )
        grouped = grouped.withColumn("tier", tier_map[F.col("p")]).filter(
            F.col("tier").isNotNull()
        )
    return grouped.select(
        "s", "rank", "chunk_id", "label_idx", "kw", "variant",
        "prefix_len", "tier", "cand",
    ).distinct()


# ---------------------------------------------------------------------------
# tier-3 word-by-word search (J4) for keywords without a tier-1/2 hit
# ---------------------------------------------------------------------------


def word_hits(
    failed_keywords: DataFrame,
    index: DataFrame,
    tier_of_pred: dict[str, int] | None,
    stopwords: tuple[str, ...],
) -> DataFrame:
    """(s, rank, chunk_id, label_idx, kw, word_pos, tier, cand) — J4.

    DEAD CODE in the reference: `$word_by_word` is never set
    (search_module.rb:97), so word_by_word_search
    (search_module.rb:172-198) never runs; this implements its INTENDED
    semantics behind the opt-in ``cfg.word_by_word`` flag, closing the
    one §2 row without an implementation. For keywords that failed
    tiers 1-2, each token searches ALONE (in keyword order, skipping
    stopwords and tokens shorter than 3 chars — the reference's
    `next if` guards); selection downstream keeps the first
    (word_pos, tier) with a PASSING candidate, mirroring the
    reference's break-on-first-passing-token outer loop with its
    first-passing-predicate inner loop."""
    toks = failed_keywords.select(
        "s", "rank", "chunk_id", "label_idx", "kw",
        F.posexplode(norm_tokens("kw_norm")).alias("word_pos", "tok"),
    ).filter(F.length("tok") >= 3)
    if stopwords:
        toks = toks.filter(~F.col("tok").isin(list(stopwords)))
    hits = toks.join(index, "tok")
    if tier_of_pred is None:
        hits = hits.withColumn("tier", F.lit(0))
    else:
        tier_map = F.create_map(
            *[x for p, i in tier_of_pred.items() for x in (F.lit(p), F.lit(i))]
        )
        hits = hits.withColumn("tier", tier_map[F.col("p")]).filter(
            F.col("tier").isNotNull()
        )
    return hits.select(
        "s", "rank", "chunk_id", "label_idx", "kw", "word_pos", "tier",
        "cand",
    ).distinct()


# ---------------------------------------------------------------------------
# F11 — candidate-group similarity filter
# ---------------------------------------------------------------------------


def f11_passing(
    hits: DataFrame,
    target: DataFrame,
    textp: list[str] | None,
    stopwords: tuple[str, ...],
    cfg: SerimiConfig,
) -> DataFrame:
    """Adds pass/fail per (kw, cand): the candidate's description has a
    literal with advanced_string_matching(kw, o) > threshold.

    When textp is unknown (warm-up chunk) the length-ratio prune
    len(o) <= 3*len(kw) applies instead (search_module.rb:247-249).
    Scores are computed once per DISTINCT (kw, literal) pair.

    The output carries ``found_p`` — a deterministic choice (min) of
    the PASSING description triples' predicate per (kw, cand). This is
    the reference's ``$found`` raw material (search_module.rb:252-260
    sets it to the predicate of the last triple that passed filter());
    "last" there follows nondeterministic describe order, so min() is
    the deterministic pick inside the reference's ambiguity envelope.
    The promotion fold uses it when cfg.promote_found_predicate is on.
    """
    cands = hits.select("cand").distinct()
    desc = target.join(cands, target["s"] == cands["cand"], "left_semi").filter(
        ~F.col("o_is_uri") & ~F.col("is_bnode")
    )
    if textp is not None:
        if textp:
            desc = desc.filter(~F.col("p").isin(list(textp)))
    pairs = (
        hits.select("kw", "cand")
        .distinct()
        .join(
            desc.select(
                F.col("s").alias("cand"),
                F.col("p").alias("desc_p"),
                F.col("o").alias("lit"),
            ),
            "cand",
        )
    )
    if textp is None:
        pairs = pairs.filter(F.length("lit") <= 3 * F.length("kw"))
    # boolean short-circuit kernel: F11 consumes only the decision, so
    # the jaccard lower bound / soundex upper bound skip the full
    # ensemble for most pairs (see kernels.asm_passes)
    scored_pairs = (
        pairs.select("kw", "lit")
        .distinct()
        .withColumn(
            "ok",
            asm_passes_udf(stopwords, cfg.string_threshold)(
                F.col("kw"), F.col("lit")
            ),
        )
        .filter(F.col("ok"))
        .select("kw", "lit")
    )
    passing = (
        pairs.join(scored_pairs, ["kw", "lit"], "left_semi")
        .groupBy("kw", "cand")
        .agg(F.min("desc_p").alias("found_p"))
        .withColumn("passes", F.lit(True))
    )
    return hits.join(passing, ["kw", "cand"], "inner")


# ---------------------------------------------------------------------------
# cascade selection
# ---------------------------------------------------------------------------


@dataclass
class CandidateResult:
    pairs: DataFrame      # (chunk_id, rank, s, cand)
    searched: DataFrame   # (chunk_id, rank, s, kw) — winning label property
    # per-tier passing frames, kept for the sequential-mode promotion
    # fold (search_module.rb:107-108 — which predicate "found" each
    # keyword decides the next chunk's cascade order)
    passing_t1: DataFrame | None = None
    passing_t2: DataFrame | None = None


def select_candidates(
    keywords: DataFrame,
    passing_t1: DataFrame,
    passing_t2: DataFrame | None,
    passing_t3: DataFrame | None = None,
) -> CandidateResult:
    """Reference cascade as min-priority selections:

    * per keyword, tier-1 wins at the lowest predicate tier with a
      passing candidate (search_module.rb:91);
    * tier-2 'and' wins at (lowest tier, longest prefix); the 'nsw'
      variant adds its own first-passing tier (b + c union,
      search_module.rb:167);
    * tier-3 word-by-word (J4, opt-in) wins at the first
      (word_pos, tier) with a passing candidate — it only ever
      receives keywords that failed tiers 1-2;
    * per source, the first label property (label_idx) with any
      candidate wins (serimi_module.rb:151-170); its keywords become
      the searched labels.
    """
    kw_key = ["s", "rank", "chunk_id", "label_idx", "kw"]
    best1 = passing_t1.groupBy(*kw_key).agg(F.min("tier").alias("best_tier"))
    sel1 = passing_t1.join(best1, kw_key).filter(
        F.col("tier") == F.col("best_tier")
    ).select(*kw_key, "cand")

    sels = [sel1]
    if passing_t2 is not None:
        t2 = passing_t2
        and_best = (
            t2.filter(F.col("variant") == "and")
            .groupBy(*kw_key)
            .agg(F.min(F.struct(F.col("tier"), (-F.col("prefix_len")).alias("npl"))).alias("b"))
        )
        sel2a = (
            t2.filter(F.col("variant") == "and")
            .join(and_best, kw_key)
            .filter(
                (F.col("tier") == F.col("b.tier"))
                & (-F.col("prefix_len") == F.col("b.npl"))
            )
            .select(*kw_key, "cand")
        )
        nsw_best = (
            t2.filter(F.col("variant") == "nsw")
            .groupBy(*kw_key)
            .agg(F.min("tier").alias("best_tier"))
        )
        sel2b = (
            t2.filter(F.col("variant") == "nsw")
            .join(nsw_best, kw_key)
            .filter(F.col("tier") == F.col("best_tier"))
            .select(*kw_key, "cand")
        )
        sels.extend([sel2a, sel2b])

    if passing_t3 is not None:
        best3 = passing_t3.groupBy(*kw_key).agg(
            F.min(F.struct(F.col("word_pos"), F.col("tier"))).alias("b")
        )
        sel3 = (
            passing_t3.join(best3, kw_key)
            .filter(
                (F.col("word_pos") == F.col("b.word_pos"))
                & (F.col("tier") == F.col("b.tier"))
            )
            .select(*kw_key, "cand")
        )
        sels.append(sel3)

    all_sel = sels[0]
    for s_ in sels[1:]:
        all_sel = all_sel.unionByName(s_)
    all_sel = all_sel.distinct()

    # label-property cascade per source
    src_key = ["s", "rank", "chunk_id"]
    best_label = all_sel.groupBy(*src_key).agg(
        F.min("label_idx").alias("best_label")
    )
    final_pairs = (
        all_sel.join(best_label, src_key)
        .filter(F.col("label_idx") == F.col("best_label"))
        .select("chunk_id", "rank", "s", "cand")
        .distinct()
    )
    searched = (
        keywords.join(best_label, src_key)
        .filter(F.col("label_idx") == F.col("best_label"))
        .select("chunk_id", "rank", "s", "kw")
        .distinct()
    )
    return CandidateResult(pairs=final_pairs, searched=searched)

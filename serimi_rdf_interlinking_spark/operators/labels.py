"""A2 entity-label property selection + A3 stop-word mining.

Label selection (serimi_module.rb:228-278) runs over a bounded class
sample (reference: `limit 4000`), so it is collected to the driver and
computed with the pure kernel — the cap makes this scale-safe at any
corpus size. Stop-word mining (serimi_module.rb:280-343) scans every
label value of the class, so it stays distributed (explode + groupBy +
stats — two shuffles, map-side combined).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import kernels as K
from ..functions.columns import is_numericish_col, norm_tokens
from . import rds_core

RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"


def _ruby_to_f_str(s: str) -> str:
    """Ruby String#to_f followed by Float#to_s (leading-float parse,
    '0.0' for garbage; integral floats print with a trailing .0)."""
    mt = re.match(r"^\s*[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?", s or "")
    if not mt:
        return "0.0"
    f = float(mt.group(0))
    if f == int(f) and abs(f) < 1e16:
        return f"{int(f)}.0"
    return repr(f)


def select_entity_labels(
    sample_triples: list[tuple],
    text_len: int = 400,
    top: int = 3,
) -> tuple[list[str], list[str]]:
    """get_entity_labels over a collected class sample.

    sample rows: (s, p, o, o_is_uri). Returns (label predicates with
    rdfs:label prepended, text predicates of the sample).

    Quirks preserved: the post-text-filter dedup is discarded in the
    reference (serimi_module.rb:239 return value unused), so entropy
    keeps multiplicity; the numeric-literal exclusion compares string
    SIZES of to_i/to_f round-trips (serimi_module.rb:251).
    """
    as4 = [(t[0], t[1], str(t[2]), bool(t[3])) for t in sample_triples]
    textp = rds_core.get_text_properties([as4], text_len)
    textp_set = set(textp)
    data = [t for t in as4 if t[1] not in textp_set]
    candidates, _scores = rds_core.entropy_computation([data], textp=[])
    cand_set = set(candidates)

    eligible: set[str] = set()
    for _s, p, o, is_uri in data:
        if is_uri or p not in cand_set:
            continue
        if len(o) <= 3:
            continue
        if len(str(K.ruby_to_i(o))) == len(o):
            continue  # pure integer by size
        if len(_ruby_to_f_str(o)) == len(o):
            continue  # pure float by size
        eligible.add(p)

    labels = [p for p in candidates if p in eligible][:top]
    labels.insert(0, RDFS_LABEL)
    out: list[str] = []
    for p in labels:
        if p not in out:
            out.append(p)
    return out, textp


def mine_stopwords_for_label(
    triples: DataFrame, members: DataFrame, label: str
) -> list[str]:
    """A3 for one label property (serimi_module.rb:284-341).

    Token frequency = occurrences / number-of-label-values; stop words
    exist only when stddev >= 2*mean (the reference's volatility gate);
    kept when freq >= mean and len > 1, ordered by length desc.
    """
    vals = (
        triples.join(members, "s", "left_semi")
        .filter(F.col("p") == label)
        .select("o")
    )
    n = vals.count()
    if n == 0:
        return []
    toks = vals.select(F.explode(norm_tokens("o")).alias("tok"))
    toks = toks.filter(~is_numericish_col("tok"))
    wc = toks.groupBy("tok").agg((F.count("*") / F.lit(float(n))).alias("v"))
    stats = wc.agg(
        F.avg("v").alias("m"), F.stddev_pop("v").alias("sd")
    ).first()
    if stats is None or stats.m is None:
        return []
    mean, sd = float(stats.m), float(stats.sd or 0.0)
    if sd < mean * 2:
        return []
    rows = (
        wc.filter((F.col("v") >= mean) & (F.length("tok") > 1))
        .select("tok")
        .collect()
    )
    return sorted({r.tok for r in rows}, key=lambda x: (-len(x), x))


def mine_stopwords(
    triples: DataFrame, members: DataFrame, labels: list[str]
) -> tuple[str, ...]:
    """All labels in ONE Spark job: per-label value counts join the
    token frequencies inside the plan (broadcast — one tiny row per
    label), so frequencies, stats, the per-label volatility gate and
    the final filter land in a single collect of just the stop words."""
    vals = (
        triples.join(members, "s", "left_semi")
        .filter(F.col("p").isin(labels))
        .select(F.col("p").alias("label"), "o")
    )
    totals = vals.groupBy("label").agg(
        F.count("*").cast("double").alias("n")
    )
    toks = vals.select(
        "label", F.explode(norm_tokens("o")).alias("tok")
    ).filter(~is_numericish_col("tok"))
    wc = (
        toks.groupBy("label", "tok")
        .agg(F.count("*").alias("c"))
        .join(F.broadcast(totals), "label")
        .select("label", "tok", (F.col("c") / F.col("n")).alias("v"))
    )
    stats = wc.groupBy("label").agg(
        F.avg("v").alias("m"), F.stddev_pop("v").alias("sd")
    )
    flagged = (
        wc.join(stats, "label")
        .filter(
            (F.col("sd") >= F.col("m") * 2)  # per-label volatility gate
            & (F.col("v") >= F.col("m"))
            & (F.length("tok") > 1)
        )
        .select("label", "tok")
        .collect()  # only the stop words come to the driver
    )
    by_label: dict[str, set[str]] = {}
    for r in flagged:
        by_label.setdefault(r.label, set()).add(r.tok)
    out: list[str] = []
    for label in labels:  # reference iterates labels in order
        sw = sorted(by_label.get(label, ()), key=lambda x: (-len(x), x))
        out.extend(sw)
    return tuple(dict.fromkeys(out))


def class_members(triples: DataFrame, class_uri: str) -> DataFrame:
    """J1/F1: subjects having any (s, ?, <K>) triple with K a URI object
    (initializer.rb:72, serimi_module.rb:235)."""
    return (
        triples.filter((F.col("o") == class_uri) & F.col("o_is_uri"))
        .select("s")
        .distinct()
    )


def collect_class_sample(
    triples: DataFrame, members: DataFrame, limit: int = 4000
) -> list[tuple]:
    """F2: distinct member triples, deterministically capped (the
    reference's LIMIT 4000 takes an endpoint-ordered subset; we order by
    (s,p,o) so runs are reproducible)."""
    rows = (
        triples.join(members, "s", "left_semi")
        .filter(~F.col("is_bnode"))
        .select("s", "p", "o", "o_is_uri")
        .distinct()
        .orderBy("s", "p", "o")
        .limit(limit)
        .collect()
    )
    return [(r.s, r.p, r.o, r.o_is_uri) for r in rows]

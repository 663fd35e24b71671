"""Grouped-map wrapper running the SERIMI chunk core inside Spark.

One chunk (<= ~20 source resources + their candidate descriptions) is
exactly the reference's sequential unit of work (initializer.rb:93-130);
here every chunk becomes one pandas group under
``groupBy('chunk_id').applyInPandas`` — thousands of chunks score in
parallel with a single shuffle keyed by chunk_id. Chunk sizes are
bounded by construction (blocking + sigma), so groups are uniformly
small: no skew, no spill.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd

from . import rds_core

CHUNK_INPUT_SCHEMA = (
    "chunk_id long, rank long, src string, role string, cand string,"
    " p string, o string, o_is_uri boolean"
)
CHUNK_OUTPUT_SCHEMA = (
    "chunk_id long, src string, cand string, score double,"
    " threshold double, accepted boolean"
)


def apply_dbpedia_redirect(
    group: list[tuple],
    redirect_map: dict[str, str],
    redirect_desc: dict[str, list[tuple]],
) -> list[tuple]:
    """F13/J5 (serimi_module.rb:82-106): replace candidates that have a
    wikiPageRedirects triple with the redirect target's description."""
    aliases = {t[0] for t in group if t[0] in redirect_map}
    if not aliases:
        return group
    out = [t for t in group if t[0] not in aliases]
    seen = set(out)
    for alias in sorted(aliases):
        tgt = redirect_map[alias]
        for t in redirect_desc.get(tgt, []):
            if t not in seen:
                seen.add(t)
                out.append(t)
    return out


def make_chunk_kernel(
    textp: list[str],
    stopwords: tuple[str, ...],
    topk: int = 0,
    rds_threshold: float | None = None,
    filter_threshold: float = 0.7,
    overflow_min: float = 5.0,
    group_presence: float = 0.4,
    dbpedia: bool = False,
) -> Callable[[pd.DataFrame], pd.DataFrame]:
    """Builds the applyInPandas kernel. Input roles:
    'cand'  (src, cand, p, o, o_is_uri) candidate description triples
    'origin'(src, -,    p, o, o_is_uri) source description pairs
    'kw'    (src, -,    p=kw)           searched labels
    'rdir'  (-,  cand=alias, o=target)  redirect edges (dbpedia only)
    'rdesc' (-,  cand=target, p, o, u)  redirect-target descriptions
    """
    textp = list(textp)
    stopwords = tuple(stopwords)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        """Scores ONE chunk. The Spark entry point is `batched` below,
        which loops this over every chunk_id inside a pandas group —
        grouping by a bucket of chunks amortizes the Arrow dispatch
        overhead that dominates when thousands of ~20-row chunks each
        become their own group (measured round-1: RDS stage scaling
        efficiency 0.59, the group-dispatch laggard)."""
        empty = pd.DataFrame(
            {
                "chunk_id": pd.Series(dtype="int64"),
                "src": pd.Series(dtype="object"),
                "cand": pd.Series(dtype="object"),
                "score": pd.Series(dtype="float64"),
                "threshold": pd.Series(dtype="float64"),
                "accepted": pd.Series(dtype="bool"),
            }
        )
        if pdf.empty:
            return empty
        chunk_id = int(pdf["chunk_id"].iloc[0])

        cand_rows = pdf[pdf.role == "cand"]
        origin_rows = pdf[pdf.role == "origin"]
        kw_rows = pdf[pdf.role == "kw"]

        redirect_map: dict[str, str] = {}
        redirect_desc: dict[str, list[tuple]] = {}
        if dbpedia:
            for r in pdf[pdf.role == "rdir"].itertuples():
                redirect_map[r.cand] = r.o
            for r in pdf[pdf.role == "rdesc"].itertuples():
                redirect_desc.setdefault(r.cand, []).append(
                    (r.cand, r.p, r.o, bool(r.o_is_uri))
                )

        # chunk-ordered source list (blocking rank)
        srcs = sorted(
            {(int(r.rank), r.src) for r in cand_rows.itertuples()}
        )
        groups: list[list[tuple]] = []
        origins: list[list[tuple]] = []
        searched: list[list[str]] = []
        for _rank, src in srcs:
            g = cand_rows[cand_rows.src == src]
            group = sorted(
                {
                    (r.cand, r.p, r.o, bool(r.o_is_uri))
                    for r in g.itertuples()
                }
            )
            og = origin_rows[origin_rows.src == src]
            origin = sorted(
                {(r.p, r.o, bool(r.o_is_uri)) for r in og.itertuples()}
            )
            kg = kw_rows[kw_rows.src == src]
            kws = sorted({r.p for r in kg.itertuples()})
            groups.append(list(group))
            origins.append(list(origin))
            searched.append(kws)

        filtered, _disc = rds_core.entity_label_filtering(
            groups, searched, textp, stopwords, filter_threshold, group_presence
        )
        if dbpedia and redirect_map:
            filtered = [
                apply_dbpedia_redirect(g, redirect_map, redirect_desc)
                for g in filtered
            ]
        keep = [i for i, g in enumerate(filtered) if len(g) > 0]
        groups2 = [filtered[i] for i in keep]
        origins2 = [origins[i] for i in keep]
        srcs2 = [srcs[i][1] for i in keep]

        # the reference skips chunks that collapse to <=1 group
        # (initializer.rb:123) — no alignments from them.
        if len(groups2) <= 1:
            return empty

        rows = rds_core.score_chunk(
            groups2,
            origins2,
            textp,
            topk=topk,
            rds_threshold=rds_threshold,
            min_overflow_threshold=overflow_min,
        )
        return pd.DataFrame(
            {
                "chunk_id": [chunk_id] * len(rows),
                "src": [srcs2[g] for g, *_ in rows],
                "cand": [c for _g, c, *_ in rows],
                "score": [v for _g, _c, v, *_ in rows],
                "threshold": [t for _g, _c, _v, t, _a in rows],
                "accepted": [a for *_x, a in rows],
            }
        )

    def batched(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return kernel(pdf)
        outs = [kernel(sub) for _cid, sub in pdf.groupby("chunk_id", sort=True)]
        return pd.concat(outs, ignore_index=True) if outs else kernel(pdf)

    return batched

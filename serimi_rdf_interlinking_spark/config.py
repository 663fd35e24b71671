"""Run configuration mirroring the reference CLI options.

Reference: serimi.rb:11-120 (OptionParser). Defaults per serimi.rb:
chunk 20 (:54-57), string threshold 0.7 (:66-69), format txt (:50-53),
blocking on (initializer.rb:22 — only ever set true), pivots off
(initializer.rb:15), top-k 0 = adaptive threshold (initializer.rb:16).

Two reference CLI bugs are deliberately NOT replicated (we implement the
*intended* semantics): `-p` writes options[:chunk] (serimi.rb:58-61) and
`-u` writes options[:rdsthreshold] (serimi.rb:74-77).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class SerimiConfig:
    # matcher knobs (reference serimi.rb)
    chunk: int = 20                  # -k  chunk size sigma (serimi.rb:54-57)
    string_threshold: float = 0.7    # -y  $filter_threshold (serimi.rb:66-69)
    rds_threshold: float | None = None  # fixed RDS delta; None = adaptive delta-m
    topk: int = 0                    # top-k per group; 0 = adaptive threshold
    blocking: bool = True            # token-frequency source ordering (search_module.rb:33-56)
    use_pivot: bool = False          # carry pivot groups across chunks (serimi_class.rb:279-298)
    output_format: str = "txt"       # "txt" (src=tgt) | "nt" (owl:sameAs triples)
    warmup_chunk: int = 5            # first chunk is 5 then sigma (initializer.rb:94-98)
    class_sample_limit: int = 4000   # label-selection sample (serimi_module.rb:233-235)
    max_search_predicates: int = 6   # $word_by_word_properties cap (serimi_module.rb:29)
    text_property_len: int = 400     # F9 long-text threshold (serimi_module.rb:13)
    keyword_max_len: int = 150       # F8 label hygiene (serimi_module.rb:160)
    min_keyword_len: int = 3         # search skips keywords < 3 chars (search_module.rb:71)
    pivot_fifo: int = 10             # pivot FIFO cap (serimi_class.rb:281,292-296)
    entropy_group_presence: float = 0.4  # A1 only-once exclusion (serimi_class.rb:36)
    overflow_min_threshold: float = 5.0  # A5 rule max(mu,sigma)>5 (serimi_class.rb:363)

    # engine knobs (ours; no reference analogue)
    mode: str = "batch"              # "batch" = all chunks in parallel (pivots off);
                                     # "sequential" = reference-parity driver loop
    shuffle_partitions: int = 32
    # hot-token skew guard: tokens with index fan-out above this are
    # capped to a deterministic sample of exactly this many rows
    # (frequency prefilter + truncating top-k, logged) — this bounds
    # every token-join key at the ceiling, which is why there is no
    # separate salting knob for the index join.
    max_candidates_per_token: int = 5000
    # batch-mode RDS kernel: number of chunks scored inside one pandas
    # group. Thousands of ~20-row chunks as individual applyInPandas
    # groups are dominated by Arrow dispatch overhead; bucketing
    # amortizes it while keeping per-group memory bounded at
    # ~chunks_per_kernel_group * sigma candidate descriptions.
    chunks_per_kernel_group: int = 8
    checkpoint_dir: str | None = None     # per-stage parquet checkpoints + pipeline_state
    run_id: str = "run0"

    # Sequential-mode promotion source. False (default): promote the
    # SEARCHED predicate of the keyword's winning tier — deterministic,
    # the round-2 documented trade. True: promote the predicate of a
    # PASSING DESCRIPTION TRIPLE (f11's found_p, min() over the passing
    # triples) — the reference's $found semantics
    # (search_module.rb:252-260), where the promoted predicate is the
    # one whose literal actually passed ASM, which can differ from the
    # searched predicate. A found predicate outside the learned
    # searchable list falls back to the searched-tier predicate (the
    # restricted index stays closed over the cascade; the reference
    # could promote novel predicates, but only via nondeterministic
    # describe order).
    promote_found_predicate: bool = False

    # J4 word-by-word fallback tier (search_module.rb:172-198). Dead
    # code in the reference ($word_by_word is never set,
    # search_module.rb:97) — opt-in here with the intended semantics:
    # keywords failing tiers 1-2 retry token-by-token.
    word_by_word: bool = False

    dbpedia_target: bool = False     # enables yago filter + redirect expansion (F6/F13)
    # F7 search-time redirect anti-join (search_module.rb:298-304).
    # Dead code in the reference (its call site :113 is commented out,
    # because it starves F13 redirect expansion) — opt-in here.
    drop_redirect_candidates: bool = False

    extra: dict = field(default_factory=dict)

    def searched_chunk_bounds(self, rank: int) -> int:
        """Map a 0-based blocking rank to its chunk id.

        Reference chunking: first chunk is 5 subjects, every later chunk
        is `chunk` (initializer.rb:93-98, warm-up seeds label learning).
        """
        if rank < self.warmup_chunk:
            return 0
        return 1 + (rank - self.warmup_chunk) // self.chunk

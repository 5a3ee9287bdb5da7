"""Byte-pair-encoding merge training as a relational program
(SURVEY §2.11 — tokenizer construction, the step between vocabulary
statistics (X29) and token-id encoding (X48)).

Sennrich et al. 2016: repeatedly find the most frequent ADJACENT
symbol pair across the corpus and merge it into a new symbol; the
ordered merge list IS the tokenizer. Production trainers
(HuggingFace/SentencePiece) run this single-machine over a word-count
table — which is exactly why it reduces cleanly to a relational
program: after one corpus tokenization pass, ALL state is
vocabulary-sized (unique words x their character lengths), so a 100 TB
corpus and a 100 MB corpus train on the same tiny symbol table; corpus
size only affects the initial word count aggregation.

TWO TIERS share that aggregation (:func:`word_counts`):

- :func:`bpe_train` — the relational trainer: every merge round is a
  lazy Spark plan, DuckDB-replayable window-for-window. The oracle
  twin, and the right tool at small merge budgets; two jobs per round
  makes real vocabularies (32k merges) unreachable.
- :func:`bpe_train_fast` — the production tier: collect the
  vocabulary table under an asserted ceiling and run the merge loop
  driver-side (heap argmax + Sennrich affected-word index). Pinned
  row-identical to the relational trainer at equal budgets in
  test_bpe; 1k+ merge budgets cost seconds, not thousands of jobs.

Plan shape per merge round, all window partitions keyed by WORD (tens
of rows each — no skew possible):

1. pair counts: ``lead(sym)`` + groupBy(pair) weighted by word count
   (map-side combinable);
2. the argmax pair: ``orderBy(cnt desc, l, r).limit(1)`` =
   TakeOrdered, broadcast back via a no-op-safe left join — NO driver
   collect, the whole M-round train is one lazy plan;
3. the merge: greedy leftmost-first application. Candidates are
   positions where (sym, next) equals the top pair; overlapping
   candidates (only possible when l = r, e.g. 'a a a a') resolve by
   run parity — consecutive candidate positions form a run
   (``pos - row_number`` grouping), odd-indexed members merge,
   even-indexed are consumed by their left neighbor. That is exactly
   the left-to-right scan every BPE implementation does, expressed as
   two windows.

Each round's symbol table is LINEAGE-TRUNCATED (``localCheckpoint``),
not merely persisted: round k+1 reads round k twice (pair stats +
merge application), so the LOGICAL plan doubles per round — a persist
caches execution but the driver still analyzes the full tree per
action, and by round 6 the 2^6-subtree plan takes seconds to plan and
renders a 64 MB explain (measured; the failure mode is driver CPU,
not executor work). Checkpointing a VOCABULARY-sized table is cheap
at any corpus scale; on a real cluster prefer reliable
``checkpoint()`` with a checkpoint dir if executor loss during a
train must be survivable (the table is rebuildable either way — one
corpus re-aggregation).

Determinism: ties on pair count break on (left, right) symbol order,
so the merge list is a pure function of the corpus — the DuckDB
oracle replays all M rounds (window-for-window) and must match
row-for-row, segmentations included.

Reference: no counterpart (the reference has no text processing at
all); this is part of the LLM-pipeline surface the engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_bigquery_to_sftp_server_spark.functions.text import tokenize


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The corpus reduced to its vocabulary: ``(word, wn)`` — ONE
    aggregation, the only corpus-sized step of any BPE train. Both
    trainer tiers start here; everything after is vocabulary-sized."""
    toks = df.where(F.col(text_col).isNotNull()).select(
        F.explode(tokenize(F.col(text_col))).alias("word")
    )
    return toks.groupBy("word").agg(F.count("*").alias("wn"))


def word_symbol_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Initial BPE state: one row per (unique word, character
    position): ``(word, wn, pos, sym)`` with ``wn`` the corpus
    occurrence count. Vocabulary-sized — the ONLY corpus-sized step in
    the whole train is the count aggregation in here."""
    return word_counts(df, text_col).select(
        "word",
        "wn",
        F.posexplode(F.split(F.col("word"), "")).alias("pos", "sym"),
    )


def _apply_pair(
    syms: DataFrame, top: DataFrame, withnext: DataFrame | None = None
) -> DataFrame:
    """Apply ONE merge pair (a 0-or-1-row ``(left, right, ...)`` frame)
    to a ``(word, wn, pos, sym)`` table with the greedy leftmost
    run-parity rule. An empty ``top`` makes this a NO-OP (left join —
    a crossJoin would wipe the table; caught by the r9 review, pinned
    in test_bpe). Shared by training (argmax pair — training passes
    its already-computed ``withnext`` so the lead window runs once per
    round) and inference (:func:`apply_merges`, stored pair list)."""
    w = Window.partitionBy("word").orderBy("pos")
    if withnext is None:
        withnext = syms.withColumn("_nxt", F.lead("sym").over(w))
    cand = withnext.join(
        F.broadcast(top.select("left", "right")),
        (F.col("sym") == F.col("left")) & (F.col("_nxt") == F.col("right")),
        "left",
    ).withColumn("_cand", F.col("left").isNotNull())
    # consecutive candidate positions form a run; greedy left-to-right
    # merges the 1st, 3rd, ... member of each run. r17 (guide §2.4):
    # every step below — run detection, parity, the consumed flag, and
    # the post-filter re-numbering — is expressed over the ONE window
    # spec (word, pos asc), so Spark evaluates the whole pass in a
    # single WindowExec with one sort, where the r9 formulation paid
    # FOUR sorts per merge round (three distinct partitionings plus a
    # post-filter row_number). Run membership: a run STARTS at a
    # candidate whose predecessor is not one; positions inside a run
    # are consecutive by construction, so the member index is
    # pos - start_pos, and the greedy rule merges even offsets —
    # exactly row_number() % 2 == 1 of the old per-run window.
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    run_start = F.col("_cand") & ~F.lag("_cand", 1, False).over(w)
    staged = cand.withColumn(
        "_start_pos",
        F.last(F.when(run_start, F.col("pos")), ignorenulls=True).over(
            running
        ),
    )
    staged = staged.withColumn(
        "_merge",
        F.col("_cand")
        & ((F.col("pos") - F.col("_start_pos")) % 2 == 0),
    )
    staged = (
        staged.withColumn("_consumed", F.lag("_merge", 1, False).over(w))
        .withColumn(
            "_newpos",
            F.sum(F.when(F.lag("_merge", 1, False).over(w), 0).otherwise(1)).over(
                running
            ),
        )
    )
    return (
        staged.where(~F.col("_consumed"))
        .select(
            "word",
            "wn",
            # cast pins the old row_number() IntegerType so the symbol
            # table's schema is stable across rounds
            F.col("_newpos").cast("int").alias("pos"),
            F.when(
                F.col("_merge"), F.concat(F.col("left"), F.col("right"))
            )
            .otherwise(F.col("sym"))
            .alias("sym"),
        )
    )


def _one_merge(syms: DataFrame) -> tuple[DataFrame, DataFrame]:
    """One TRAINING round: find the argmax pair, apply it. Returns
    (top-pair frame ``(left, right, pair_count)``, merged table)."""
    w = Window.partitionBy("word").orderBy("pos")
    withnext = syms.withColumn("_nxt", F.lead("sym").over(w))
    pc = (
        withnext.where(F.col("_nxt").isNotNull())
        .groupBy("sym", "_nxt")
        .agg(F.sum("wn").alias("pair_count"))
    )
    top = (
        pc.orderBy(F.desc("pair_count"), F.asc("sym"), F.asc("_nxt"))
        .limit(1)
        .select(
            F.col("sym").alias("left"),
            F.col("_nxt").alias("right"),
            "pair_count",
        )
    )
    return top, _apply_pair(syms, top, withnext=withnext)


def _segment(syms: DataFrame, keys: list[str]) -> DataFrame:
    """Render a symbol table back to per-word space-joined
    segmentations, grouped by ``keys`` — the ONE place the output
    format lives (train and inference must not diverge)."""
    return syms.groupBy(*keys).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "sym"))),
                lambda x: x["sym"],
            ),
        ).alias("segmentation")
    )


def bpe_train(
    df: DataFrame, text_col: str = "text", n_merges: int = 6
) -> tuple[DataFrame, DataFrame]:
    """Train ``n_merges`` BPE rounds over the corpus. Returns
    ``(merges, segmented)``:

    - ``merges``: ``(rank, left, right, pair_count)`` — the ordered
      merge list, rank 1 first;
    - ``segmented``: ``(word, wn, segmentation)`` — every vocabulary
      word as its final space-joined symbol sequence (the tokenizer's
      view of the corpus after all merges).
    """
    from data_pipeline_bigquery_to_sftp_server_spark.cache import CheckpointChain

    # CheckpointChain: truncate lineage every round (see module
    # docstring — the logical plan doubles per round otherwise), eager
    # so each round's job stays tiny, and the previous round's blocks
    # are released once the new round is materialized (r9 advice: bare
    # localCheckpoints linger until GC). ORDERING MATTERS: each round's
    # argmax frame reads the previous symbol table, so it is eagerly
    # checkpointed BEFORE the chain step that releases those blocks.
    chain = CheckpointChain()
    syms = chain.step(word_symbol_table(df, text_col))
    merge_frames = []
    for k in range(1, int(n_merges) + 1):
        top, merged = _one_merge(syms)
        top = top.localCheckpoint(eager=True)
        syms = chain.step(merged)
        merge_frames.append(top.withColumn("rank", F.lit(k)))
    merges = merge_frames[0]
    for f in merge_frames[1:]:
        merges = merges.unionByName(f)
    segmented = _segment(syms, ["word", "wn"])
    return merges.select("rank", "left", "right", "pair_count"), segmented


def bpe_train_fast(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 6,
    max_vocab_rows: int = 2_000_000,
) -> tuple[DataFrame, DataFrame]:
    """Vocabulary-scale BPE training — the PRODUCTION tier the module
    docstring promises: one corpus aggregation reduces the input to the
    ``(word, wn)`` vocabulary table (:func:`word_counts` — the identical
    first step of the relational trainer), that table is collected under
    a count-first asserted ceiling (the exact_near_dup_pairs_np
    discipline), and the Sennrich merge loop runs driver-side over the
    counts — which is exactly what HuggingFace/SentencePiece trainers
    do, because ALL post-aggregation state is vocabulary-sized. 32k
    merges are 32k dict/heap rounds, not 64k sequential Spark jobs (the
    relational :func:`bpe_train`'s round-count ceiling, r9 verdict
    finding #1); corpus size only affects the one aggregation.

    Semantics are pinned ROW-IDENTICAL to the relational trainer at
    equal ``n_merges`` in test_bpe (merge list AND segmentations): the
    same overlapping-adjacent pair counting, the same
    (count desc, left, right) tie-break (UTF-8 byte order == code-point
    order, so Python/Spark/DuckDB agree), and the same greedy
    leftmost-first application. The relational trainer stays as the
    DuckDB-replayable oracle twin; this tier is for real vocabularies.

    Per round the argmax comes from a lazy-deletion heap and only words
    actually containing the merged pair are re-counted (the Sennrich
    index), so a round costs O(affected words × word length), not
    O(vocabulary).

    Returns the same ``(merges, segmented)`` contract as
    :func:`bpe_train`: ``(rank, left, right, pair_count)`` and
    ``(word, wn, segmentation)`` DataFrames.
    """
    import heapq

    wc = word_counts(df, text_col)
    n_vocab = wc.count()
    if n_vocab > max_vocab_rows:
        raise ValueError(
            f"bpe_train_fast: vocabulary has {n_vocab} words > "
            f"max_vocab_rows={max_vocab_rows}. The word-count table is "
            "collected driver-side (vocabulary-sized by design — a "
            "bigger table means the corpus wasn't word-like); raise the "
            "ceiling knowingly or pre-filter the token stream."
        )
    rows = wc.collect()
    words: list[list] = [[list(r["word"]), int(r["wn"])] for r in rows]
    word_keys = [r["word"] for r in rows]

    counts: dict[tuple[str, str], int] = {}
    index: dict[tuple[str, str], set[int]] = {}
    for wi, (syms, wn) in enumerate(words):
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + wn
            index.setdefault((a, b), set()).add(wi)

    heap = [(-c, p[0], p[1]) for p, c in counts.items()]
    heapq.heapify(heap)

    def merge_word(syms: list[str], left: str, right: str) -> list[str]:
        # greedy leftmost-first scan — the rule the relational trainer
        # expresses as run parity
        out, i, m = [], 0, len(syms)
        while i < m:
            if i + 1 < m and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, int(n_merges) + 1):
        best = None
        while heap:
            negc, left, right = heapq.heappop(heap)
            if counts.get((left, right), 0) == -negc:
                best = (left, right, -negc)
                break
        if best is None or best[2] <= 0:
            break  # no adjacent pairs left — remaining rounds are no-ops
        left, right, cnt = best
        merges.append((rank, left, right, cnt))
        touched: set[tuple[str, str]] = set()
        for wi in index.pop((left, right), ()):
            syms, wn = words[wi]
            new = merge_word(syms, left, right)
            if new == syms:
                continue  # stale index entry — pair no longer present
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] -= wn
                touched.add((a, b))
            for a, b in zip(new, new[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + wn
                index.setdefault((a, b), set()).add(wi)
                touched.add((a, b))
            words[wi][0] = new
        # (left, right) rides the same touched bookkeeping as every
        # other pair: greedy application removes each occurrence, so
        # its residual count reaches 0 and it drops out naturally — and
        # if a merge ever left a residual, it re-enters the heap with
        # its true count instead of being silently lost.
        for p in touched:
            c = counts.get(p, 0)
            if c > 0:
                heapq.heappush(heap, (-c, p[0], p[1]))
            else:
                counts.pop(p, None)

    spark = df.sparkSession
    merges_df = spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count bigint"
    )
    segmented_df = spark.createDataFrame(
        [
            (word_keys[wi], words[wi][1], " ".join(words[wi][0]))
            for wi in range(len(words))
        ],
        "word string, wn bigint, segmentation string",
    )
    return merges_df, segmented_df


def encode_words_fast(
    words: DataFrame,
    merges: DataFrame,
    n_merges: int,
    word_col: str = "word",
) -> DataFrame:
    """Vocabulary-scale tokenizer INFERENCE — the encode half of the
    fast tier: the rank table (vocabulary-sized, collected once — an
    eager bounded action like every model collect in this engine)
    ships in the closure, and each Arrow batch encodes its words with
    the lowest-rank-present loop every production tokenizer uses: find
    the lowest-rank pair present in the word, merge ALL its
    occurrences greedy-leftmost, repeat. NO per-round Spark jobs, so a
    32k-merge tokenizer encodes in one corpus pass (vs
    :func:`apply_merges`' two jobs per round — the oracle twin, kept
    for DuckDB replay).

    Equivalence to rank-sequential application is exact, not
    heuristic: a merge only creates adjacencies involving its own new
    symbol, and every pair containing that symbol was learned LATER
    (the symbol didn't exist when earlier pairs were learned) — so an
    earlier pair can never be recreated by a later merge, and
    "lowest rank present, fully merged, repeat" visits pairs in
    exactly the order the round-sequential trainer applied them.
    Pinned in test_bpe: == apply_merges at shared budgets on seen AND
    unseen words, and == the fast trainer's own segmented table on the
    training vocabulary at a 512-merge budget.

    Returns ``(word_col, segmentation)`` for the DISTINCT input words.
    """
    import pandas as pd_local

    mr = (
        merges.where(F.col("rank") <= int(n_merges))
        .select("rank", "left", "right")
        .collect()
    )
    ranks = {(r["left"], r["right"]): int(r["rank"]) for r in mr}

    def encode(word: str) -> str:
        syms = list(word)
        while len(syms) > 1:
            best = None
            for a, b in zip(syms, syms[1:]):
                rk = ranks.get((a, b))
                if rk is not None and (best is None or rk < best[0]):
                    best = (rk, a, b)
            if best is None:
                break
            _, left, right = best
            out, i, m = [], 0, len(syms)
            while i < m:
                if i + 1 < m and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return " ".join(syms)

    # NULL words emit no row — parity with apply_merges, whose
    # posexplode of a NULL split drops them silently
    distinct = (
        words.select(F.col(word_col).alias("word"))
        .where(F.col("word").isNotNull())
        .dropDuplicates(["word"])
    )

    def enc_batch(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd_local.DataFrame(
                {
                    "word": pdf["word"],
                    "segmentation": [encode(w) for w in pdf["word"]],
                }
            )

    return distinct.mapInPandas(
        enc_batch, "word string, segmentation string"
    ).withColumnRenamed("word", word_col)


def apply_merges(
    words: DataFrame,
    merges: DataFrame,
    n_merges: int,
    word_col: str = "word",
) -> DataFrame:
    """Tokenizer INFERENCE: segment arbitrary (possibly unseen) words
    under a trained merge list, applying the stored pairs in rank
    order — the encoder half of a real BPE tokenizer (the trained
    ``segmented`` table only covers the training vocabulary).

    ``merges`` is the bpe_train output; each round broadcasts its
    single (rank=k) pair and replays the identical greedy run-parity
    application, localCheckpointed per round like training. Returns
    ``(word_col, segmentation)`` for the DISTINCT input words — join
    it back to the document stream like q_bpe_encode does with the
    trained table.
    """
    from data_pipeline_bigquery_to_sftp_server_spark.cache import CheckpointChain

    wc = words.select(F.col(word_col).alias("word")).dropDuplicates(["word"])
    chain = CheckpointChain()
    syms = chain.step(
        wc.select(
            "word",
            F.lit(1).alias("wn"),
            F.posexplode(F.split(F.col("word"), "")).alias("pos", "sym"),
        )
    )
    for k in range(1, int(n_merges) + 1):
        pair = merges.where(F.col("rank") == k)
        # each round reads only the previous round + the stored pair
        # list, so the chain's release-previous-after-materialize is
        # safe with no extra checkpoints (unlike training's argmax)
        syms = chain.step(_apply_pair(syms, pair))
    return _segment(syms, ["word"]).withColumnRenamed("word", word_col)

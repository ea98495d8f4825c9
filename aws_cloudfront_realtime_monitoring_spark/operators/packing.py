"""Token-budget shard packing: group documents into fixed-capacity training
shards (sequence-packing's coarse sibling — every large-scale training
pipeline ends with this step).

Bin packing is inherently sequential, so the distributed shape is two-level:

1. **Scatter** (narrow map): docs hash deterministically into P independent
   pack groups via the portable h60 hash — no shuffle yet, any executor can
   compute its rows' group.
2. **Pack** (one shuffle + applyInPandas): each group is packed locally with
   first-fit-decreasing (sorted by tokens desc, doc_id asc — deterministic),
   an Arrow-batched pandas computation over one group at a time. Group
   sizes are corpus/P, so P scales the parallelism and bounds per-task
   memory; shard ids are globally unique as group * MAX_SHARDS + local id.

FFD within a group guarantees <= (11/9 OPT + 1) shards of that group; the
scatter step costs at most a constant factor in fill efficiency in exchange
for full parallelism (the standard trade at 100 TB, where a global greedy
pass is impossible anyway).

Docs larger than the capacity get a dedicated shard (flagged ``oversize``)
rather than being dropped — the caller decides whether to split or discard.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h60

#: per-group shard-id namespace; no group ever packs more shards than this
MAX_SHARDS = 1_000_000


class _FirstFitTree:
    """Leftmost-shard-with-capacity index: a growable segment tree whose
    leaves hold each open shard's REMAINING capacity and whose inner
    nodes hold subtree maxima, so one placement costs O(log shards)
    instead of a linear probe over every open shard (the naive loop is
    O(docs x shards) -- quadratic per group; r8 review). Assignments are
    IDENTICAL to naive first-fit: the descent always takes the leftmost
    leaf whose remaining capacity fits."""

    def __init__(self) -> None:
        self.cap = 1
        self.tree = [-1, -1]  # 1-indexed; leaves at [cap, 2*cap)
        self.n = 0

    def _grow(self) -> None:
        old_leaves = self.tree[self.cap : 2 * self.cap]
        self.cap *= 2
        self.tree = [-1] * (2 * self.cap)
        self.tree[self.cap : self.cap + len(old_leaves)] = old_leaves
        for i in range(self.cap - 1, 0, -1):
            self.tree[i] = max(self.tree[2 * i], self.tree[2 * i + 1])

    def open(self, remaining: int) -> int:
        """Append a shard with the given remaining capacity (may be
        negative for oversize shards: they then never match a fit)."""
        if self.n == self.cap:
            self._grow()
        i = self.cap + self.n
        self.n += 1
        self.tree[i] = remaining
        i //= 2
        while i:
            self.tree[i] = max(self.tree[2 * i], self.tree[2 * i + 1])
            i //= 2
        return self.n - 1

    def place(self, need: int) -> int:
        """First-fit: index of the LEFTMOST shard with remaining >= need
        (capacity deducted), or -1 if none fits."""
        if self.tree[1] < need:
            return -1
        i = 1
        while i < self.cap:
            i = 2 * i if self.tree[2 * i] >= need else 2 * i + 1
        j = i - self.cap
        self.tree[i] -= need
        i //= 2
        while i:
            self.tree[i] = max(self.tree[2 * i], self.tree[2 * i + 1])
            i //= 2
        return j

PACKED_SCHEMA = (
    "doc_id BIGINT, n_tokens BIGINT, pack_group INT, shard_id BIGINT, "
    "shard_fill BIGINT, oversize INT"
)


def pack_shards(docs_with_tokens: DataFrame, capacity: int,
                n_groups: int = 32,
                id_col: str = "doc_id",
                tokens_col: str = "n_tokens") -> DataFrame:
    """Assign every doc to a shard of at most ``capacity`` tokens.

    ``docs_with_tokens`` needs (id_col, tokens_col). Returns one row per doc
    with its shard id, the shard's total fill, and an oversize flag.
    """
    if n_groups < 1:
        # pmod(h60, 0) is NULL: every row would land in one NULL
        # pack_group and die executor-side as an opaque 'cannot convert
        # float NaN to integer' instead of naming the bad argument
        # (r12 review; the zorder_layout partitions-underflow precedent)
        raise ValueError("pack_shards: n_groups must be >= 1")

    def pack_group(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # The iterator form delivers ONE group as MULTIPLE Arrow batches
        # (spark.sql.execution.arrow.maxRecordsPerBatch, default 10k).
        # Packing is a whole-group computation: concatenate first, or
        # every batch would restart shard ids and fills -- colliding
        # shard_ids and silently over-filling shards for any group past
        # one batch (r7 code-review finding, regression-tested with a
        # tiny batch size). Whole-group memory is the design bound
        # already: group size ~ corpus/P, P = n_groups.
        batches = [pdf for pdf in pdf_iter if not pdf.empty]
        if not batches:
            return
        # plain assignment, not a one-iteration loop (r11 review)
        pdf = pd.concat(batches, ignore_index=True)
        if pdf["n_tokens"].isna().any() or pdf["doc_id"].isna().any():
            # a NULL token count / doc id arrives as NaN after the Arrow
            # conversion and would die later as an opaque 'cannot convert
            # float NaN to integer' -- fail with the schema-violation
            # message like the negative-token contract below (r11 review)
            raise ValueError(
                "pack_shards: NULL doc_id/n_tokens rows violate the "
                "packing schema; filter or repair them upstream"
            )
        if pdf["doc_id"].duplicated().any():
            # equal ids hash to the same group, so this per-group check
            # catches EVERY duplicate with zero extra jobs. Duplicates
            # are a double hazard: the FFD sort's (n_tokens, doc_id)
            # key stops being total (assignment order would depend on
            # partitioning -- a determinism hole), and
            # pack_token_sequences' doc_id equi-join would CROSS-join
            # the duplicate rows, silently duplicating tokens
            # (r17 review, verified: 5 tokens in -> 9 out)
            bad = int(pdf.loc[pdf["doc_id"].duplicated(), "doc_id"].iloc[0])
            raise ValueError(
                f"pack_shards: duplicate doc_id {bad}; ids must be "
                "unique (dedupe upstream)"
            )
        group = int(pdf["pack_group"].iloc[0])
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        )
        # first-fit-decreasing over open shards (segment-tree
        # leftmost-fit: O(docs log shards), same assignments as the
        # naive probe -- property-pinned in tests)
        fills: list[int] = []
        assign: list[int] = []
        oversize: list[int] = []
        tree = _FirstFitTree()
        for tok in pdf["n_tokens"]:
            tok = int(tok)
            if tok < 0:
                # A negative need would match the tree's -1 sentinel on
                # UNOPENED leaves and return an index past self.n
                # (IndexError deep in a task); surface the schema
                # violation instead, like the id-type contract below.
                raise ValueError(
                    f"pack_group {group}: negative token count {tok} "
                    f"(doc_id {int(pdf['doc_id'].iloc[len(assign)])}); "
                    "n_tokens must be >= 0"
                )
            if tok > capacity:
                tree.open(capacity - tok)  # negative: never fits more
                fills.append(tok)
                assign.append(len(fills) - 1)
                oversize.append(1)
                continue
            j = tree.place(tok)
            if j < 0:
                j = tree.open(capacity - tok)
                fills.append(tok)
            else:
                fills[j] += tok
            assign.append(j)
            oversize.append(0)
        if len(fills) > MAX_SHARDS:
            raise ValueError(
                f"pack_group {group} produced {len(fills)} shards, over "
                f"the {MAX_SHARDS} per-group id namespace -- shard_ids "
                "would collide with the next group's; increase capacity "
                "or n_groups"
            )
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "n_tokens": pdf["n_tokens"].to_numpy(),
                "pack_group": group,
                "shard_id": [group * MAX_SHARDS + j for j in assign],
                "shard_fill": [fills[j] for j in assign],
                "oversize": oversize,
            }
        )
        yield out

    from pyspark.sql import types as T

    id_type = docs_with_tokens.schema[id_col].dataType
    if not isinstance(
        id_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        # PACKED_SCHEMA pins doc_id BIGINT; a string id would otherwise
        # die deep inside Arrow conversion with an opaque executor-side
        # schema mismatch (r8 review)
        raise ValueError(
            f"id_col {id_col!r} must be an integral type for the "
            f"PACKED_SCHEMA doc_id BIGINT contract (got {id_type})"
        )
    tagged = docs_with_tokens.select(
        F.col(id_col).alias("doc_id"),
        F.col(tokens_col).cast("bigint").alias("n_tokens"),
        F.pmod(h60(F.col(id_col).cast("string")), F.lit(n_groups))
        .cast("int")
        .alias("pack_group"),
    )
    return tagged.groupBy("pack_group").applyInPandas(pack_group, PACKED_SCHEMA)


def pack_token_sequences(
    ids: DataFrame,
    seq_len: int,
    n_groups: int = 32,
    id_col: str = "doc_id",
) -> DataFrame:
    """Packed-pretraining sequences: concatenate SHORT documents into
    full ``seq_len`` training sequences (the T5/GPT data-pipeline step
    after tokenization — training on one doc per sequence wastes the
    context window on padding). Input is a (id_col, token_ids) relation
    (``tokens_to_ids`` output); output is one row per sequence:
    ``(seq_id, token_ids, doc_ids, n_docs, n_tokens, oversize)``.

    Composition of the two existing halves, each already verified:

    1. :func:`pack_shards` assigns docs to <= ``seq_len``-token shards
       (hash-scattered FFD — the deterministic two-level shape);
    2. one equi-join brings each doc's ids to its shard row, and a
       groupBy per shard concatenates member docs in ascending
       ``doc_id`` order (array_sort on (doc_id, ids) structs — total
       and deterministic);
    3. a doc LONGER than ``seq_len`` owns a dedicated oversize shard;
       its single concatenated row is split into ``seq_len`` windows by
       the :func:`~..operators.bpe.chunk_id_seqs` rule downstream of
       this function if the caller wants fixed-length output —
       emitting it whole here keeps "every token exactly once" a
       one-relation invariant the tests pin.

    Shuffle budget: the scatter+pack shuffle moves (doc_id, count)
    rows; the join + groupBy move each token id exactly once — the
    lower bound for any packer that relocates documents."""
    from pyspark.sql import functions as F

    if seq_len < 1:
        raise ValueError(
            f"pack_token_sequences: seq_len must be >= 1, got {seq_len}")
    if "token_ids" not in ids.columns:
        raise ValueError("pack_token_sequences: input has no 'token_ids' "
                         "column (tokens_to_ids output expected)")
    counts = ids.select(
        F.col(id_col),
        F.size("token_ids").cast("bigint").alias("n_tokens"))
    packed = pack_shards(counts, capacity=seq_len, n_groups=n_groups,
                         id_col=id_col)
    joined = ids.select(F.col(id_col).alias("doc_id"), "token_ids").join(
        packed.select("doc_id", "shard_id", "oversize"), "doc_id")
    members = F.array_sort(
        F.collect_list(F.struct("doc_id", "token_ids")))
    return (
        joined.groupBy("shard_id")
        .agg(
            F.flatten(F.transform(members, lambda m: m["token_ids"]))
            .alias("token_ids"),
            F.transform(members, lambda m: m["doc_id"]).alias("doc_ids"),
            F.count("*").cast("int").alias("n_docs"),
            F.max("oversize").cast("int").alias("oversize"),
        )
        .select(
            F.col("shard_id").alias("seq_id"), "token_ids", "doc_ids",
            "n_docs",
            F.size("token_ids").cast("int").alias("n_tokens"),
            "oversize",
        )
    )

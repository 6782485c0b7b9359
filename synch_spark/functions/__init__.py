"""Public column-function library — the JVM-side fast path.

Every function here is (or returns) a Catalyst ``Column`` expression:
it runs inside WholeStageCodegen, never in a Python worker, so it is
safe in the hot path of a 100 TB scan. The library collects the
reusable expressions the engine is built from, grouped by domain:

- **text**: tokenization, quality scoring, language ID, fingerprints
  (reference has no text ops; these are the north-star training-data
  operators over the `documents` table);
- **hashing**: null-safe row digests and order-insensitive checksums
  (upgrade over the reference's count-only verification,
  /root/reference/synch/cli.py:94-110);
- **cdc**: sign annotation for collapsing engines
  (/root/reference/synch/writer/collapsing_merge_tree.py:47-56);
- **numeric**: decimal-exact folds for cross-engine bit-equality.

DataFrame-level operators (joins, windows, groupBy pipelines) live in
``synch_spark.operators``; this module is strictly Column -> Column.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# --- text ----------------------------------------------------------------
from synch_spark.operators.text import (
    bpe_ish_token_count,
    bpe_ish_tokens,
    char_count,
    fingerprint,
    lang_guess,
    mean_token_len,
    ngram_lang_pred,
    normalize_text,
    quality_score,
    stopword_count,
    stopword_ratio,
    token_count,
    tokens,
)

# --- cdc -----------------------------------------------------------------
from synch_spark.events import annotate_sign


def sign_of(action: Column | str) -> Column:
    """+1 for insert/update, -1 for delete — the collapsing-engine sign
    expression (reference: collapsing_merge_tree.py:47-56)."""
    c = F.col(action) if isinstance(action, str) else action
    return F.when(c == "delete", F.lit(-1)).otherwise(F.lit(1)).cast("int")


# --- hashing -------------------------------------------------------------
NULL_SENTINEL = "\x00NULL\x00"
FIELD_SEP = "\x01"


def null_safe_row_hash(cols: list[str]) -> Column:
    """xxhash64 digest over the named columns, robust to nulls AND to
    separator forgery.

    Spark hash functions SKIP null inputs (``xxhash64(NULL,'x') ==
    xxhash64('x',NULL)``), which would make null-position swaps
    invisible. Each field is therefore encoded INJECTIVELY: ``N`` for
    null, else ``V<len>:<value>`` — the explicit length makes field
    boundaries unambiguous, so a value that happens to contain the join
    separator (or the old sentinel text) cannot re-split into a
    colliding row (('x\\x01y','z') vs ('x','y\\x01z') used to hash
    equal). Column order is canonicalized (sorted) so logically equal
    rows hash equal regardless of projection order.
    """
    if not cols:
        return F.lit(0).cast("bigint")
    encoded = []
    for c in sorted(cols):
        s = F.col(c).cast("string")
        encoded.append(
            F.when(s.isNull(), F.lit("N")).otherwise(
                F.concat(F.lit("V"), F.length(s).cast("string"),
                         F.lit(":"), s)
            )
        )
    return F.xxhash64(F.concat_ws(FIELD_SEP, *encoded))


def checksum_agg(cols: list[str]) -> Column:
    """Order-insensitive table checksum aggregate: SUM of the null-safe
    row hash in DECIMAL(38,0). Sum, not XOR — ``h ^ h = 0`` makes any
    even-multiplicity corruption invisible; a wide decimal avoids ANSI
    long-sum overflow. One partial aggregate, fully distributed."""
    return F.sum(null_safe_row_hash(cols).cast("decimal(38,0)"))


# --- layout --------------------------------------------------------------
def interleave_bits(cols: list[Column], bits: int = 8) -> Column:
    """Morton/Z-order key: interleave the low ``bits`` bits of each
    (already-normalized, non-negative) long column, most-significant
    bits outermost, so sorting by the result groups rows that are close
    in EVERY dimension. Pure integer arithmetic (literal shifts only —
    Spark's shiftleft requires a literal), whole-stage-codegen'd.

    Column j's bit i lands at position ``i*len(cols)+j``: the top bits
    of the key alternate between the columns' top bits, which is what
    makes file-range splits constrain every dimension at once (the
    multi-column file-skipping property; see ``zorder_layout``).
    """
    n = len(cols)
    if n < 1 or bits < 1:
        raise ValueError(
            f"interleave_bits needs at least one column and one bit "
            f"(got {n} cols, bits={bits})"
        )
    if n * bits > 63:
        raise ValueError(
            f"interleave_bits: {n} cols x {bits} bits = {n * bits} bit positions "
            "exceed a signed long's 63; Java shift semantics wrap shifts mod 64, "
            "which would silently fold high columns onto low bit positions and "
            "break multi-column skipping. Lower `bits` (e.g. 63 // n_cols)."
        )
    terms = []
    for j, c in enumerate(cols):
        v = c.cast("long")
        for i in range(bits):
            bit = F.shiftright(v, i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, i * n + j))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out
def decimal_sum(col: Column | str, scale: str = "decimal(18,2)") -> Column:
    """Exact (associativity-free) sum: cast each element to a fixed
    decimal before folding, so the result is bit-identical across
    engines and partitionings; cast the result back to double at the
    edge if a float is wanted."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(scale))


def net_price(price: Column | str, discount: Column | str) -> Column:
    """The TPC-H revenue element ``price * (1 - discount)`` folded in
    DECIMAL(18,2) — exact under any aggregation order."""
    p = (F.col(price) if isinstance(price, str) else price).cast("decimal(18,2)")
    d = (F.col(discount) if isinstance(discount, str) else discount).cast(
        "decimal(18,2)"
    )
    return p * (F.lit(1).cast("decimal(18,2)") - d)


__all__ = [
    # text
    "tokens",
    "token_count",
    "char_count",
    "stopword_count",
    "stopword_ratio",
    "mean_token_len",
    "quality_score",
    "lang_guess",
    "ngram_lang_pred",
    "bpe_ish_tokens",
    "bpe_ish_token_count",
    "normalize_text",
    "fingerprint",
    # cdc
    "annotate_sign",
    "sign_of",
    # hashing
    "NULL_SENTINEL",
    "FIELD_SEP",
    "null_safe_row_hash",
    "checksum_agg",
    # layout
    "interleave_bits",
    # numeric
    "decimal_sum",
    "net_price",
]

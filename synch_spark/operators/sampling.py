"""Deterministic, engine-portable sampling for training-data pipelines.

Language/source re-balancing is the canonical last step before
tokenization: down-sample over-represented strata (English web text) to
hit a target mixture. At 100 TB the sampler must be (a) a pure Column
predicate — no shuffle, no state, pushed into the scan pipeline; (b)
DETERMINISTIC across reruns and engines, so the exact corpus is
reproducible from the recipe (seeded `df.sample` is neither: its output
depends on partitioning).

Mechanism: a row is kept iff the first 8 hex chars of
``md5(salt ':' id)`` — a uniform draw over [0, 16^8) that every engine
computes identically — fall below the stratum's rate threshold,
compared AS STRINGS against a precomputed lowercase-hex literal
(fixed-width lowercase hex orders lexicographically = numerically, and
string compare sidesteps engine differences in hex parsing). The same
(salt, id) always lands on the same side, so overlapping runs compose:
rate 0.5 then 0.2 over the same salt keeps the 0.2 subset exactly
(thresholds nest); use distinct salts for independent draws.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

HEX_SPACE = 16 ** 8


def rate_threshold_hex(rate: float) -> str:
    """Lowercase threshold string for a keep-rate in [0, 1].

    Rates < 1 yield an 8-hex-char literal; rate >= 1 yields the sentinel
    ``"g"``, which orders lexicographically ABOVE every 8-hex-char draw
    (draw chars are [0-9a-f], all < 'g'), so ``draw < threshold`` is
    always true. A naive ``format(16**8, "08x")`` would be the 9-char
    ``"100000000"``, and ``"ffffffff" < "100000000"`` is False — rate
    1.0 would silently keep only draws starting with '0' (~6%)."""
    n = max(0, min(HEX_SPACE, int(round(rate * HEX_SPACE))))
    if n >= HEX_SPACE:
        return "g"
    return format(n, "08x")


def _draw(id_col: Column, salt: str) -> Column:
    """The shared per-row draw: first 8 hex chars of md5('salt:id').

    Contract: ``salt`` must not contain ':' (validated — 'a:b' + id '1'
    would collide with salt 'a' + id 'b:1', silently correlating what
    should be independent draws) and ``id_col`` should be NON-NULL —
    concat_ws skips NULLs, so every NULL-id row shares ONE draw and is
    kept or dropped as a bloc, not sampled at the rate. Wire format is
    frozen: changing it would re-draw every previously materialized
    corpus and break threshold nesting across code versions."""
    if ":" in salt:
        raise ValueError(f"sampling salt must not contain ':' (got {salt!r})")
    return F.substring(
        F.md5(F.concat_ws(":", F.lit(salt), id_col.cast("string"))), 1, 8
    )


def sample_gate(id_col: Column, rate: float, salt: str = "s1") -> Column:
    """Boolean keep-predicate for a uniform deterministic sample."""
    return _draw(id_col, salt) < F.lit(rate_threshold_hex(rate))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: str = "s1",
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically.

    ``rates`` maps stratum value -> keep-rate; unlisted strata use
    ``default_rate``. Pure Column algebra: the predicate evaluates
    inside whole-stage codegen next to the scan, so a 90%-down-sampled
    stratum never leaves the scan stage — there is no shuffle at any
    scale, and re-running yields the byte-identical corpus."""
    expr = F.lit(rate_threshold_hex(default_rate))
    for value, rate in sorted(rates.items()):
        expr = F.when(F.col(strata_col) == value,
                      F.lit(rate_threshold_hex(rate))).otherwise(expr)
    return df.filter(_draw(F.col(id_col), salt) < expr)

"""Scale-safe exact ranks: ROW_NUMBER without partition-cardinality windows.

The recurring trap this module kills: ``row_number() OVER (PARTITION BY
low_cardinality_key ORDER BY ...)`` funnels the whole relation through
|distinct keys| tasks — a global sort in disguise (one task when the
window is unpartitioned, four when the key is a 4-stage curriculum, five
for TPC-H's o_orderpriority). The engine's two-phase alternative, first
built for ``token_balanced_shards`` (operators/prep.py) and q59's bin
packing (plans/scale.py), is factored here so every exact-rank consumer
shares one audited implementation:

phase 1 — ``row_number`` windows partitioned on (partition_cols…, bin),
          where ``bin`` is any non-NULL column monotone non-decreasing
          in the leading order column (``floor(key / width)`` is the
          canonical choice). Parallelism ∝ distinct bins, not distinct
          partition keys.
phase 2 — the per-(partition, bin) histogram (bounded by the binning
          contract, so broadcastable) turned into cumulative offsets
          with a window over the HISTOGRAM ONLY, then broadcast-joined
          back: global rank = offset + in-bin row_number.

Exact for ANY bin width, because bin-major order equals global order
when the bin is monotone in the sort key and ties on the leading key
never straddle bins (both hold for floor(key/width) — equal keys share
a bin). Width is a pure scale knob.

Reference parity anchor: the reference's cursor ordering sorts run
requests per model (loca2.py:150-170) at driver scale; these helpers
are the corpus-scale equivalent of the same exact-order contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Broadcast budget for one histogram: bins-per-partition-key such that
# |partition keys| x BINS rows stay a trivially broadcastable relation.
DEFAULT_BINS = 65_536


def binned_row_number(df: DataFrame, bin_col: str,
                      order_cols: tuple,
                      partition_cols: tuple[str, ...] = (),
                      out: str = "rn",
                      count_col: str | None = None) -> DataFrame:
    """Attach ``out`` = exact ``ROW_NUMBER() OVER (PARTITION BY
    partition_cols ORDER BY order_cols ASC)`` (1-based) using the
    two-phase plan above. When ``count_col`` is given, also attach the
    partition's total row count (``COUNT(*) OVER (PARTITION BY
    partition_cols)``) — derived from the same histogram, so it costs
    one more window over the bounded relation, not a corpus pass.

    Contract (caller's obligation, asserted nowhere at runtime because
    it is a plan property): ``df[bin_col]`` is non-NULL (NULL join keys
    would silently drop rows) and monotone non-decreasing in the first
    element of ``order_cols``, with equal leading keys sharing a bin.

    The offsets window runs over the HISTOGRAM relation only — bounded
    rows by the binning contract — so its single-task-per-partition
    shape is a non-issue at any corpus size.
    """
    order = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    wb = Window.partitionBy(*partition_cols, bin_col).orderBy(*order)
    ranked = df.withColumn("_brn", F.row_number().over(wb))

    hist = df.groupBy(*partition_cols, bin_col) \
        .agg(F.count("*").alias("_bn"))
    wo = (Window.partitionBy(*partition_cols)
          .orderBy(F.col(bin_col))
          .rowsBetween(Window.unboundedPreceding, -1))
    sel = [*[F.col(c) for c in partition_cols], F.col(bin_col),
           F.coalesce(F.sum("_bn").over(wo), F.lit(0)).alias("_boff")]
    if count_col is not None:
        sel.append(F.sum("_bn").over(Window.partitionBy(*partition_cols))
                   .cast("bigint").alias(count_col))
    offsets = hist.select(*sel)

    # NULL-SAFE on the partition cols: a NULL group key is a real SQL
    # GROUP BY group and its rows must keep their ranks (a plain
    # equi-join here silently dropped every NULL-keyed row). bin_col
    # stays non-NULL by the binning contract; eqNullSafe keys still
    # take the BroadcastHashJoin path.
    off = offsets
    for c in [*partition_cols, bin_col]:
        off = off.withColumnRenamed(c, f"_brj_{c}")
    cond = ranked[bin_col].eqNullSafe(off[f"_brj_{bin_col}"])
    for c in partition_cols:
        cond = cond & ranked[c].eqNullSafe(off[f"_brj_{c}"])
    return (ranked
            .join(F.broadcast(off), cond)
            .drop(*[f"_brj_{c}" for c in [*partition_cols, bin_col]])
            .withColumn(out, (F.col("_boff") + F.col("_brn")).cast("bigint"))
            .drop("_brn", "_boff"))


def value_bin(col: Column, lo: float, hi: float,
              n_bins: int = DEFAULT_BINS) -> Column:
    """Monotone bin id for a numeric sort key with known [lo, hi]:
    ``floor((key - lo) / width)``, degenerating to bin 0 when the range
    is empty. Never NULL for non-NULL keys; at most ``n_bins + 1``
    distinct values (the +1 absorbs key == hi)."""
    span = float(hi) - float(lo)
    if not span > 0:
        return F.lit(0).cast("bigint")
    width = span / n_bins
    return F.floor((col - F.lit(float(lo))) / F.lit(width)).cast("bigint")


def hash_bin(col: Column, shift: int = 44) -> Column:
    """Monotone bin id for the engine's 60-bit md5 ordering hash:
    ``hash >> shift`` — 2^(60-shift) possible bins (65,536 at the
    default), uniform because the hash is. Equal hashes share a bin by
    construction, so the binned-rank contract holds with (hash, id)
    ordering."""
    return F.shiftright(col, shift).cast("bigint")


def interpolated_cuts(stats: list[tuple[int, float]], n: int,
                      qs: list[float]) -> list[float]:
    """quantile_cont / Spark-percentile values from EXACT order
    statistics: ``stats`` holds (rank, value) for every rank in
    ``quantile_ranks(n, qs)`` (1-based, ascending by value), ``n`` is
    the non-NULL population size. Uses the shared linear-interpolation
    rule ``s_lo + (h - floor(h)) * (s_hi - s_lo)`` with h = (n-1)*q —
    the formula both Spark's ``percentile`` and DuckDB's
    ``quantile_cont`` implement, evaluated in the same IEEE doubles.

    An ulp-level divergence from either engine cannot flip a
    ``score > cut`` stage comparison: the interpolated cut lies in the
    CLOSED interval of two ADJACENT order statistics, and no data value
    exists strictly between adjacent order statistics.
    """
    by_rank = dict(stats)
    out = []
    for q in qs:
        h = (n - 1) * q
        lo_i = int(h)
        s_lo = by_rank[lo_i + 1]
        frac = h - lo_i
        if frac == 0:
            out.append(s_lo)
        else:
            s_hi = by_rank[lo_i + 2]
            out.append(s_lo + frac * (s_hi - s_lo))
    return out


def quantile_ranks(n: int, qs: list[float]) -> list[int]:
    """The 1-based ranks :func:`interpolated_cuts` needs for a
    population of ``n`` non-NULL values — at most 2 per quantile."""
    ranks: set[int] = set()
    for q in qs:
        h = (n - 1) * q
        lo_i = int(h)
        ranks.add(lo_i + 1)
        if h != lo_i:
            ranks.add(lo_i + 2)
    return sorted(ranks)


def grouped_quantile_cont(df: DataFrame, value_col: str,
                          qs_named: list[tuple[float, str]],
                          group_cols: tuple[str, ...] = (),
                          id_cols: tuple[str, ...] = (),
                          count_name: str | None = None,
                          n_bins: int = DEFAULT_BINS) -> DataFrame:
    """Per-group EXACT interpolated quantiles (``quantile_cont`` /
    Spark-``percentile`` semantics) as a bounded relation — one row per
    group with one column per requested quantile — WITHOUT
    ``percentile()``'s aggregation buffer (per-distinct-value state:
    ~N/|groups| doubles per reducer on a high-cardinality column).

    Plan: non-NULL values are value-binned, exact 1-based per-group
    ranks come from :func:`binned_row_number` (windows partitioned on
    (group, bin) — parallelism ∝ bins, never ∝ |groups|), and the
    interpolation ``s_lo + (h - floor(h)) * (s_hi - s_lo)`` with
    ``h = (n-1)*q`` is evaluated in-plan from the ≤2 order statistics
    per quantile that a conditional-max aggregation picks out. Same
    IEEE-double formula both engines implement, so results hash-match
    ``quantile_cont`` (see :func:`interpolated_cuts`). Driver scalars:
    one global (min, max) pair sizing the bins.

    ``count_name`` additionally emits the per-group NON-NULL value
    count (the same population the quantile ranks over).

    Groups whose values are ALL NULL are kept — the group list is
    derived from ``df``, not the non-NULL subset, and the quantile
    columns left-join on (so such groups emit NULL quantiles and a 0
    count, exactly DuckDB's ``quantile_cont`` / ``count(value)``
    behavior). With empty ``group_cols`` the output is the usual
    single global-aggregate row (NULL quantiles, 0 count when no
    non-NULL values exist) — both engines' convention.

    A quantile may be given as ``((num, den), name)`` instead of
    ``(q, name)`` — the EXACT-RATIONAL path for INTEGER value columns:
    ``h = (n-1)*num/den`` is carried as integers (``fh = div``,
    ``m = mod``) and the interpolation is computed as the exact
    integer numerator ``lo*den + m*(hi-lo)`` with ONE final division
    by ``den``. Use it when value magnitudes (e.g. 1e11 microsecond
    gaps) make ``lo + frac*(hi-lo)`` ulp-divergent across engines —
    the float path's same-IEEE-formula guarantee only covers engines
    using the identical multiply-add order, and DuckDB's
    ``quantile_cont`` does not at every magnitude. The oracle side
    must mirror the same integer formula (order statistics + one
    division), not call ``quantile_cont``.
    """
    nn = df.filter(F.col(value_col).isNotNull())
    st = nn.agg(F.min(value_col), F.max(value_col)).first()
    lo, hi = float(st[0] or 0), float(st[1] or 0)
    binned = nn.withColumn(
        "_gqb", value_bin(F.col(value_col).cast("double"), lo, hi, n_bins))
    ranked = binned_row_number(
        binned, "_gqb", (value_col, *id_cols),
        partition_cols=group_cols, out="_gqr", count_col="_gqn")
    aggs, sel = [], [F.col(c) for c in group_cols]
    for q, name in qs_named:
        if isinstance(q, tuple):
            num, den = int(q[0]), int(q[1])
            fh = F.expr(f"((_gqn - 1) * {num}) div {den}")
            m = (F.col("_gqn") - 1) * num % den
            aggs += [
                F.max(F.when(F.col("_gqr") == fh + 1,
                             F.col(value_col).cast("bigint")))
                .alias(f"_{name}_lo"),
                F.max(F.when(F.col("_gqr") == fh + 2,
                             F.col(value_col).cast("bigint")))
                .alias(f"_{name}_hi"),
                F.max(m).cast("bigint").alias(f"_{name}_m"),
            ]
            lo, hi = F.col(f"_{name}_lo"), F.col(f"_{name}_hi")
            sel.append(((lo * den + F.col(f"_{name}_m")
                         * (F.coalesce(hi, lo) - lo)).cast("double")
                        / F.lit(float(den))).alias(name))
            continue
        h = (F.col("_gqn") - 1).cast("double") * F.lit(float(q))
        aggs += [
            F.max(F.when(F.col("_gqr") == F.floor(h) + 1,
                         F.col(value_col))).alias(f"_{name}_lo"),
            F.max(F.when(F.col("_gqr") == F.ceil(h) + 1,
                         F.col(value_col))).alias(f"_{name}_hi"),
            F.max(h - F.floor(h).cast("double")).alias(f"_{name}_fr"),
        ]
        sel.append((F.col(f"_{name}_lo").cast("double")
                    + F.col(f"_{name}_fr")
                    * (F.col(f"_{name}_hi").cast("double")
                       - F.col(f"_{name}_lo").cast("double")))
                   .alias(name))
    if count_name is not None:
        aggs.append(F.max("_gqn").cast("bigint").alias(count_name))
        sel.append(F.col(count_name))
    res = ranked.groupBy(*group_cols).agg(*aggs).select(*sel)
    if group_cols:
        # Keep all-NULL groups: group list from df, quantiles left-join.
        # Join null-SAFELY (eqNullSafe): a NULL group key must still match
        # its own computed aggregates, mirroring SQL GROUP BY, where NULL
        # forms a real group. A plain equi-join would drop the computed
        # quantiles for a NULL-keyed group that has non-NULL values.
        groups = df.select(*group_cols).distinct()
        r = res
        for c in group_cols:
            r = r.withColumnRenamed(c, f"_gqj_{c}")
        cond = None
        for c in group_cols:
            e = groups[c].eqNullSafe(r[f"_gqj_{c}"])
            cond = e if cond is None else (cond & e)
        res = groups.join(r, cond, "left").drop(
            *[f"_gqj_{c}" for c in group_cols])
    if count_name is not None:
        res = res.withColumn(
            count_name,
            F.coalesce(F.col(count_name), F.lit(0)).cast("bigint"))
    return res

"""Exact-moment statistical aggregates (stddev / variance / correlation).

Built-in ``stddev``/``corr`` stream doubles through Welford-style
per-partition accumulators, so results depend on partition fold order —
fine operationally, but not bit-stable across engines, partition counts,
or reruns (see the repo's oracle-parity rules).  For pipelines that need
*reproducible* statistics (data-quality gates, drift detection on
training corpora), this module aggregates **exact decimal moments**
(sum, sum of squares, cross-sum) — decimal addition is associative and
commutative, so any partitioning gives the identical moment — and only
then evaluates the closed-form formulas in IEEE double with one fixed
expression shape.  Two engines computing the same formula over the same
exact moments produce bit-identical doubles.

Scale: one map-side-combinable groupBy — the same shuffle the plain
``stddev`` would take; no extra passes.  decimal(38) headroom: with
scale 8 the sums hold ~1e30, i.e. quadrillions of rows of |x| ≤ 1e6 —
plenty past 100 TB.  (SURVEY §2.4 supersets the reference's aggregate
set; Ksql.Linq has no statistical aggregates at all —
src/Query/Builders/Functions/KsqlFunctionRegistry lists none.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def moment_stats(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str | None = None,
    scale: int = 4,
) -> DataFrame:
    """Per-group n / mean / var_samp / stddev_samp of ``x_col`` — plus
    covar_samp / corr against ``y_col`` when given — from exact decimal
    moments.

    The decimal casts quantize inputs to ``scale`` fractional digits
    first (money-style data is already exact at its native scale; pick
    ``scale`` >= the data's).  All engines computing
    ``(n*sxx - sx*sx) / (n*(n-1))`` over the same exact moments in
    double agree bitwise.
    """
    x = F.col(x_col).cast(f"decimal(18,{scale})")
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("_sx"),
        F.sum((x * x).cast(f"decimal(38,{2 * scale})")).alias("_sxx"),
    ]
    if y_col is not None:
        y = F.col(y_col).cast(f"decimal(18,{scale})")
        aggs += [
            F.sum(y).alias("_sy"),
            F.sum((y * y).cast(f"decimal(38,{2 * scale})")).alias("_syy"),
            F.sum((x * y).cast(f"decimal(38,{2 * scale})")).alias("_sxy"),
        ]
    g = df.groupBy(*group_cols).agg(*aggs)

    n = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    sxx = F.col("_sxx").cast("double")
    mean = sx / n
    mx = n * sxx - sx * sx  # n^2 * (n-1)/n * var — shared subterm
    var = mx / (n * (n - F.lit(1.0)))
    out = [
        *group_cols,
        F.col("n"),
        mean.alias("mean"),
        F.when(F.col("n") > 1, var).alias("var_samp"),
        F.when(F.col("n") > 1, F.sqrt(var)).alias("stddev_samp"),
    ]
    if y_col is not None:
        sy = F.col("_sy").cast("double")
        syy = F.col("_syy").cast("double")
        sxy = F.col("_sxy").cast("double")
        my = n * syy - sy * sy
        cov = (n * sxy - sx * sy) / (n * (n - F.lit(1.0)))
        corr = (n * sxy - sx * sy) / (F.sqrt(mx) * F.sqrt(my))
        out += [
            F.when(F.col("n") > 1, cov).alias("covar_samp"),
            F.when((F.col("n") > 1) & (mx > 0) & (my > 0), corr).alias("corr"),
        ]
    return g.select(*out)

"""Goodness-of-fit metrics as Spark aggregate expressions.

Semantics from the reference ``libraries/metrics.py`` (cited per function):
NaN-pair rows are dropped first (``np.where(isnan(obs)==0 & isnan(model)==0)``
in every reference metric), correlations are Pearson, and std is POPULATION
std (numpy default ddof=0) — hence ``stddev_pop``/``var_pop`` here, never the
sample variants.

Each helper returns a dict of named aggregate Columns so callers can do
``df.groupBy(...).agg(**metrics.kge2012(obs, model))`` or compute several
metric families in one aggregation pass (single shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _pair(obs: Column, model: Column) -> Column:
    """True where both sides are usable (reference drops NaN pairs)."""
    return obs.isNotNull() & model.isNotNull() & ~F.isnan(obs) & ~F.isnan(model)


def _g(c: Column, ok: Column) -> Column:
    return F.when(ok, c)


def rho(obs: Column, model: Column) -> Column:
    """Pearson correlation over valid pairs (``metrics.py:8,69-73``)."""
    ok = _pair(obs, model)
    return F.corr(_g(model, ok), _g(obs, ok))


def kge2012(obs: Column, model: Column, prefix: str = "") -> dict[str, Column]:
    """KGE2012_ALL (``metrics.py:5-15``): rho (NaN->0), beta=mean ratio,
    alpha=CV ratio, kge = 1 - sqrt((rho-1)^2+(beta-1)^2+(alpha-1)^2)."""
    ok = _pair(obs, model)
    o, m = _g(obs, ok), _g(model, ok)
    r = F.coalesce(F.nanvl(F.corr(m, o), F.lit(None)), F.lit(0.0))
    beta = F.avg(m) / F.avg(o)
    alpha = (F.stddev_pop(m) / F.stddev_pop(o)) / beta
    kge = 1.0 - F.sqrt((r - 1) ** 2 + (beta - 1) ** 2 + (alpha - 1) ** 2)
    return {prefix + "kge": kge, prefix + "rho": r,
            prefix + "beta": beta, prefix + "alpha": alpha}


def kge(obs: Column, model: Column, prefix: str = "") -> dict[str, Column]:
    """KGE 2009 variant (``metrics.py:25-32``): alpha = plain std ratio."""
    ok = _pair(obs, model)
    o, m = _g(obs, ok), _g(model, ok)
    r = F.corr(m, o)
    beta = F.avg(m) / F.avg(o)
    alpha = F.stddev_pop(m) / F.stddev_pop(o)
    return {prefix + "kge": 1.0 - F.sqrt((r - 1) ** 2 + (beta - 1) ** 2 + (alpha - 1) ** 2),
            prefix + "rho": r, prefix + "beta": beta, prefix + "alpha": alpha}


def nse(obs: Column, model: Column) -> Column:
    """Nash-Sutcliffe efficiency (``metrics.py:44-48``):
    1 - SSE/SS_about_mean. Decomposed to one-pass aggregates:
    SS_about_mean = n*var_pop(obs)."""
    ok = _pair(obs, model)
    o, m = _g(obs, ok), _g(model, ok)
    sse = F.sum((o - m) * (o - m))
    ss = F.count(o) * F.var_pop(o)
    return 1.0 - sse / ss


def nse_decomposed(obs: Column, model: Column, prefix: str = "") -> dict[str, Column]:
    """NSE_ALL (``metrics.py:50-61``): nse = 2*alpha*rho - alpha^2 - beta^2
    with alpha=std ratio, beta=normalized mean bias."""
    ok = _pair(obs, model)
    o, m = _g(obs, ok), _g(model, ok)
    alpha = F.stddev_pop(m) / F.stddev_pop(o)
    beta = (F.avg(m) - F.avg(o)) / F.stddev_pop(o)
    r = F.corr(m, o)
    return {prefix + "nse": 2 * alpha * r - alpha ** 2 - beta ** 2,
            prefix + "rho": r, prefix + "beta": beta, prefix + "alpha": alpha,
            prefix + "mus": F.avg(m), prefix + "muo": F.avg(o),
            prefix + "sto": F.stddev_pop(m)}


def r2(obs: Column, model: Column) -> Column:
    """Squared Pearson correlation (``metrics.py:63-67``)."""
    r = rho(obs, model)
    return r * r


def rmse(obs: Column, model: Column) -> Column:
    """Root-mean-square error; NaN when <2 valid pairs (``metrics.py:86-93``)."""
    ok = _pair(obs, model)
    o, m = _g(obs, ok), _g(model, ok)
    out = F.sqrt(F.avg((m - o) * (m - o)))
    return F.when(F.count(o) > 1, out)


def nrmse(obs: Column, model: Column) -> Column:
    """100 * RMSE / range(obs) (``metrics.py:75-84``)."""
    ok = _pair(obs, model)
    o = _g(obs, ok)
    return F.when(F.count(o) > 1,
                  100.0 * rmse(obs, model) / (F.max(o) - F.min(o)))


def mae(obs: Column, model: Column) -> Column:
    """Mean absolute error; NaN when <2 valid pairs (``metrics.py:95-101``)."""
    ok = _pair(obs, model)
    o, m = _g(obs, ok), _g(model, ok)
    return F.when(F.count(o) > 1, F.avg(F.abs(m - o)))


def summary(df: DataFrame, obs: str, model: str, by: list[str] | None = None) -> DataFrame:
    """All metric families in ONE aggregation (single shuffle per group)."""
    o, m = F.col(obs), F.col(model)
    aggs = {**kge2012(o, m, "kge2012_"), **kge(o, m, "kge_"),
            **nse_decomposed(o, m, "nse_"),
            "nse": nse(o, m), "r2": r2(o, m), "rmse": rmse(o, m),
            "nrmse": nrmse(o, m), "mae": mae(o, m)}
    cols = [v.alias(k) for k, v in aggs.items()]
    return (df.groupBy(*[F.col(c) for c in by]) if by else df.groupBy()).agg(*cols)

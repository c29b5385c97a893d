"""Deterministic sampling / splitting / sharding for training-data curation.

A 100 TB corpus job cannot re-roll randomness between attempts: every
sampling decision here is a PURE FUNCTION of the row key, so retries,
resumed stages, and re-runs at different parallelism produce byte-identical
cohorts (the same property the checkpoint-resume layer relies on).

The hash is the first 8 hex chars of md5(key) — chosen over xxhash64/crc32
because md5 is implemented identically in every engine the gate touches
(Spark, DuckDB, Python), which makes these operators fully value-oracle-able
cross-engine. md5's avalanche on the 32-bit prefix is more than uniform
enough for percentage bucketing; this is cohort assignment, not crypto.

All of it is pure Catalyst expression — no shuffle beyond what the caller's
aggregation needs, no Python, no RDD. Filters on the bucket push down to the
scan like any other predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000  # basis-point resolution for fractions


def hash_bucket(key: Column) -> Column:
    """Deterministic uniform bucket in [0, BUCKETS): first 32 bits of
    md5(key) mod BUCKETS. Identical in DuckDB as
    ``('0x' || substr(md5(key), 1, 8))::UBIGINT % 10000``.

    NULL keys hash as the literal string ``<NULL>`` — without this they
    would propagate NULL buckets that silently fail every comparison,
    dropping NULL-keyed rows from stratified_sample even at fraction 1.0
    and conflating them with hash_split's explicit holdout."""
    return (F.conv(F.substring(F.md5(
        F.coalesce(key.cast("string"), F.lit("<NULL>"))), 1, 8), 16, 10)
            .cast("long") % BUCKETS)


def hash_split(df: DataFrame, key_col: str,
               splits: dict[str, float],
               out_col: str = "split") -> DataFrame:
    """Assign every row to a named split (train/val/test, ...) by hash
    bucket. ``splits`` maps name -> fraction; fractions must sum to <= 1.0
    (rows past the total get NULL — an explicit holdout). Assignment is
    stable under appends: a row's split never changes when other rows come
    or go, unlike sample()/randomSplit whose draw depends on partitioning.
    """
    if not splits:
        raise ValueError("splits must name at least one cohort")
    total = sum(splits.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    b = hash_bucket(F.col(key_col))
    # CUMULATIVE rounding: per-split round() drifts (three 1/3 fractions ->
    # 3333+3333+3333 leaves bucket 9999 silently holdout even though the
    # fractions sum to 1); rounding the running total guarantees the
    # covered range is exactly round(sum * BUCKETS)
    expr, lo, cum = None, 0, 0.0
    for name, frac in splits.items():
        cum += frac
        hi = int(round(cum * BUCKETS))
        cond = (b >= lo) & (b < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    return df.withColumn(out_col, expr)


def _case_map(col: Column, mapping: dict, default) -> Column:
    """Literal CASE chain ``WHEN col = k THEN v ... ELSE default`` over a
    dict — the shared builder for the per-stratum / per-domain samplers.
    Catalyst folds it; values and default must be plain literals."""
    expr = None
    for key, val in mapping.items():
        cond = col == key
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    return F.lit(default) if expr is None else expr.otherwise(default)


def stratified_sample(df: DataFrame, key_col: str, strata_col: str,
                      fractions: dict, default: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sample: keep a row iff its hash bucket
    falls under its stratum's fraction (e.g. downsample dominant languages,
    keep 100% of rare ones). Same stability guarantee as hash_split; the
    fraction map rides the plan as a literal CASE, so Catalyst folds it and
    the filter pushes down."""
    b = hash_bucket(F.col(key_col))
    thr = _case_map(F.col(strata_col),
                    {s: int(round(f * BUCKETS)) for s, f in fractions.items()},
                    int(round(default * BUCKETS)))
    return df.filter(b < thr)


def mixture_sample(df: DataFrame, key_col: str, domain_col: str,
                   targets: dict[str, float],
                   weight_col: str | None = None) -> DataFrame:
    """Domain-mixture resampling: downsample each domain so the kept corpus
    matches the ``targets`` proportions (Pile/Dolma/SlimPajama-style source
    reweighting), keeping as much data as possible — the binding domain
    (the one with the least data relative to its target share) is kept at
    ~100% and every other domain is cut to match.

    Math: with per-domain counts ``n_d`` and target shares ``t_d``, the
    largest achievable mixed corpus is ``T = min_d n_d / t_d`` (over
    ``t_d > 0``); each domain keeps ``t_d * T`` rows, i.e. hash-bucket
    fraction ``t_d * T / n_d``. Domains absent from ``targets`` (or with
    share 0) are dropped. Shares need not sum to 1 — only their ratios
    matter.

    ``weight_col`` switches the mixture target from row counts to a WEIGHT
    mass (the usual case: token budgets) — ``n_d`` becomes the domain's
    total weight and the target shares are hit in expectation, since docs
    are still bucketed uniformly within each domain. Weights must be
    integers (token/char/byte counts); they are summed as long so the
    domain masses — and therefore the cuts — stay exact and deterministic
    (a double sum would be partition-order-dependent).

    Unlike the other samplers here the keep decision depends on the corpus
    COUNTS, so it is stable across retries/partitionings of the same input
    but NOT under appends (adding rows moves the cuts — inherent to
    mixture balancing; freeze the cuts table if append-stability matters).

    Scale shape: one map-side-combined count aggregate over #domains
    groups, a scalar min, and a broadcast join of the #domains-row cuts
    table back onto the corpus; the bucket filter is pure Catalyst. The
    cut expression ``least(ceil(share * T / n * BUCKETS), BUCKETS)`` is
    evaluated in double precision with the identical operation order in
    the DuckDB oracle twin, so the kept cohort is bit-reproducible
    cross-engine. ceil + the least() clamp pin the BINDING domain's cut
    to exactly BUCKETS for any shares: its mathematical value is exactly
    BUCKETS, fp evaluation lands within ±ε of it, and ceil rounds the
    9999.99… case up while least() catches the 10000.00…1 case — with
    floor, non-dyadic shares could silently drop the binding domain's
    top bucket. Non-binding domains over-keep at most one bucket
    (1/BUCKETS) versus the exact real-arithmetic cut.
    """
    if not targets or all(v <= 0 for v in targets.values()):
        raise ValueError("targets must give at least one domain a "
                         "positive share")
    if any(v < 0 for v in targets.values()):
        raise ValueError("negative target shares are not meaningful — "
                         "use 0 (or omit the domain) to drop it")
    if weight_col is not None:
        import pyspark.sql.types as T
        dt = df.schema[weight_col].dataType
        if not isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType,
                               T.LongType)):
            raise ValueError(
                f"weight_col {weight_col!r} must be an integer type "
                f"(token/char/byte counts), got {dt.simpleString()} — a "
                "fractional column would truncate per-row (weights < 1 "
                "become 0 and can silently empty the output); cast with "
                "explicit rounding first")
    share = _case_map(F.col(domain_col),
                      {name: float(frac) for name, frac in targets.items()},
                      0.0)
    mass = (F.sum(F.col(weight_col).cast("long")) if weight_col
            else F.count("*"))
    # lazy-checkpoint the #domains-row counts table: both consumers below
    # (the scalar min and the cuts projection) otherwise re-derive it from
    # scratch, scanning the corpus twice for the aggregates — three full
    # passes total; checkpointed it's one counts pass + the join pass
    counts = (df.groupBy(domain_col)
                .agg(mass.cast("double").alias("_n"))
                .withColumn("_share", share)
                .localCheckpoint(eager=False))
    tmax = (counts.filter(F.col("_share") > 0)
                  .agg(F.min(F.col("_n") / F.col("_share")).alias("_T")))
    cuts = (counts.crossJoin(F.broadcast(tmax))
                  .withColumn("_cut",
                              F.least(F.ceil(F.col("_share") * F.col("_T")
                                             / F.col("_n")
                                             * F.lit(float(BUCKETS))),
                                      F.lit(BUCKETS).cast("long")))
                  .select(domain_col, "_cut"))
    return (df.join(F.broadcast(cuts), domain_col)
              .filter(hash_bucket(F.col(key_col)) < F.col("_cut"))
              .drop("_cut")
              .select(*df.columns))


def temperature_shares(df: DataFrame, domain_col: str,
                       alpha: float = 0.3,
                       weight_col: str | None = None) -> dict[str, float]:
    """Temperature-flattened target shares for ``mixture_sample`` — the
    multilingual up/down-sampling rule of mT5/XLM-R (Xue et al. 2021
    §3.1; Conneau et al. 2020 §3): observed domain mass p_d is remapped
    to ``q_d ∝ p_d^alpha``. alpha=1 keeps the natural mix, alpha=0 is
    uniform across domains, the common 0.2-0.5 range boosts
    low-resource domains without letting them dominate.

    One map-side-combined aggregate over #domains groups (rows or, with
    ``weight_col``, integer weight mass — the same contract as
    ``mixture_sample``); the power/normalize math runs driver-side on
    the #domains-sized result. NULL domains keep their mass under the
    NULL key, mirroring mixture_sample's grouping, but note
    mixture_sample targets cannot address a NULL domain (dict keys), so
    NULL-domain rows are dropped by the downstream filter — drop or
    fill NULL domains first if they must survive.

    Compose: ``mixture_sample(df, key, dom,
    temperature_shares(df, dom, 0.3))`` — the binding domain under the
    flattened shares is the SMALLEST one (it is boosted the most), so
    the rarest domain keeps ~100% and the head is cut toward it.
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    mass = (F.sum(F.col(weight_col).cast("long")) if weight_col
            else F.count(F.lit(1)))
    rows = df.groupBy(domain_col).agg(mass.alias("_m")).collect()
    raw = {r[domain_col]: float(r["_m"] or 0) for r in rows
           if r[domain_col] is not None and (r["_m"] or 0) > 0}
    if not raw:
        raise ValueError("no non-NULL domain has positive mass")
    total = sum(raw.values())
    powed = {d: (m / total) ** alpha for d, m in raw.items()}
    z = sum(powed.values())
    return {d: v / z for d, v in powed.items()}


def hash_uniform(key: Column) -> Column:
    """Deterministic uniform double in (0, 1): (h32 + 0.5) / 2^32 where h32
    is the first 32 bits of md5(key). Never exactly 0 or 1, so ln(u) is
    finite. DuckDB twin:
    ``(('0x' || substr(md5(key), 1, 8))::UBIGINT + 0.5) / 4294967296.0``."""
    h = F.conv(F.substring(F.md5(
        F.coalesce(key.cast("string"), F.lit("<NULL>"))), 1, 8), 16, 10) \
         .cast("long")
    return (h.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)


def weighted_priority(key: Column, weight: Column) -> Column:
    """Efraimidis-Spirakis (2006) priority: -ln(u) / w with u a pure
    function of the row key. Taking the k SMALLEST priorities is a weighted
    sample without replacement with inclusion probability proportional to
    weight (the classic exponential-race / A-ES one-pass scheme). NULL or
    non-positive weights get +inf priority (never sampled)."""
    w = weight.cast("double")
    return F.when(w > 0, -F.log(hash_uniform(key)) / w) \
            .otherwise(F.lit(float("inf")))


def weighted_sample(df: DataFrame, key_col: str, weight_col: str, k: int,
                    out_col: str = "priority") -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement of ``k`` rows,
    inclusion probability proportional to ``weight_col`` (Efraimidis-
    Spirakis A-ES: keep the k smallest -ln(u)/w). Because u is md5-derived
    from the key, the cohort is a pure function of the corpus content —
    stable across retries, partitionings and engines, like every other
    sampler in this module.

    Scale shape: orderBy(priority).limit(k) compiles to
    TakeOrderedAndProject — each task keeps a local k-heap and only k rows
    per partition reach the driver-side merge; no global sort, no full
    shuffle. This is the quality-weighted subcorpus draw of a training-data
    pipeline (weight = quality score, token count, domain boost...).
    """
    pri = weighted_priority(F.col(key_col), F.col(weight_col))
    return (df.withColumn(out_col, pri)
              .orderBy(out_col, key_col)
              .limit(k))


def weighted_sample_per_group(df: DataFrame, key_col: str, weight_col: str,
                              group_col: str, k: int,
                              salt_buckets: int = 32,
                              out_col: str = "priority") -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement of ``k`` rows PER
    GROUP (per language, per source, ...), inclusion probability
    proportional to ``weight_col`` within each group — the per-stratum
    quality-weighted subcorpus draw (same Efraimidis-Spirakis priority as
    ``weighted_sample``, so the cohort is a pure function of corpus
    content: stable across retries, partitionings and engines).

    Scale shape, two independent skew/width guards:

    - The ranking runs on a NARROW projection ``(key, group, priority)``
      and the winners (<= k rows per group) re-attach to the corpus by a
      broadcast semi-join on the key — the document payload (text, spans,
      media) NEVER shuffles, only three scalar columns per row do.
    - A single window rank over ``group_col`` would still sort each
      group's narrow rows inside ONE task — the dominant group (often
      most of a web corpus) becomes a single-task sort at 100 TB.
      Instead, salted two-phase top-k: rank within ``(group, salt)`` —
      ``salt_buckets`` deterministic sub-partitions of every group, each
      keeping its local top ``k`` — then rank the <= k * salt_buckets
      survivors per group. Phase 2's input is bounded per group
      regardless of corpus size, so skew never concentrates.

    The result is IDENTICAL to the direct single-window rank: every row
    of a group's true top-k is also top-k within its salt bucket, so
    phase 1 can never evict it (asserted against the unsalted plan in
    tests, and the DuckDB oracle twin IS the direct form). On one box
    the salting costs a second (tiny) exchange and wins nothing — its
    value is cluster-side task-size bounding; set ``salt_buckets=1`` to
    get the plain two-exchange plan.

    Eligibility (differs from ``weighted_sample``, which never joins):
    rows with a NULL key, a NULL group or a NULL/non-positive weight are
    EXCLUDED before ranking — a NULL key/group cannot be equi-joined
    back (it would win a rank slot and then vanish, leaving the group
    under k), and
    ``weighted_priority``'s contract is that non-positive weights are
    never sampled (they would otherwise pad sub-k groups with
    priority = +inf rows). The winners join keys on (key, group), so a
    key duplicated across groups attaches only to its own group's row.
    """
    from pyspark.sql import Window
    pri = weighted_priority(F.col(key_col), F.col(weight_col))
    narrow = (df.filter(F.col(key_col).isNotNull() &
                        F.col(group_col).isNotNull() &
                        (F.col(weight_col) > 0))
                .select(F.col(key_col), F.col(group_col),
                        pri.alias(out_col)))
    if salt_buckets > 1:
        # any deterministic sub-partition gives the identical result (the
        # true top-k survives every salt bucket), so use cheap xxhash64
        # here rather than a second md5 per row
        salt = F.pmod(F.xxhash64(F.col(key_col)), F.lit(salt_buckets))
        w1 = Window.partitionBy(group_col, "_salt").orderBy(out_col, key_col)
        narrow = (narrow.withColumn("_salt", salt)
                        .withColumn("_r", F.row_number().over(w1))
                        .filter(F.col("_r") <= k).drop("_r", "_salt"))
    w2 = Window.partitionBy(group_col).orderBy(out_col, key_col)
    winners = (narrow.withColumn("_r", F.row_number().over(w2))
                     .filter(F.col("_r") <= k)
                     .select(key_col, group_col, out_col))
    return (df.join(F.broadcast(winners), [key_col, group_col])
              .select(*df.columns, out_col))


def pack_sequences(df: DataFrame, key_col: str, weight_col: str,
                   capacity: int, shard_budget: int | None = None,
                   out_cols: tuple[str, str] = ("shard", "pack")) -> DataFrame:
    """Deterministic next-fit sequence packing: walk the corpus in
    ``key_col`` order and open a new pack whenever the running weight would
    exceed ``capacity`` — the greedy packer a training loader uses to fill
    fixed context windows with documents (weight = token count). A single
    row heavier than ``capacity`` gets a pack of its own (never split).

    Output: the input columns plus ``shard`` and ``pack`` (pack ids are
    local to their shard; ``(shard, pack)`` is the global pack key).

    Scale shape: packing is sequential by definition, so it CANNOT be one
    Catalyst window (the running total resets on overflow — not a prefix
    sum). Instead the corpus is first cut into contiguous weight shards by
    the two-level distributed prefix sum (``shard_by_budget``, default
    budget = 4096 * capacity, so every shard holds >= ~4096 packs worth of
    rows and at most budget total weight); each shard then packs
    independently inside one applyInPandas group — bounded memory, zero
    cross-shard coordination, embarrassingly parallel across executors.
    Pack boundaries differ from a global single-threaded walk only AT shard
    seams (first pack of a shard never continues the previous shard's last
    pack) — the price of parallelism, bounded to one short pack per shard
    and deterministic.
    """
    if shard_budget is None:
        shard_budget = 4096 * capacity
    shard_col, pack_col = out_cols
    d = shard_by_budget(df, key_col, weight_col, budget=shard_budget,
                        out_col=shard_col)
    fields = [f for f in d.schema.fields]
    import pyspark.sql.types as T
    schema = T.StructType(fields + [T.StructField(pack_col, T.LongType())])
    cap = int(capacity)

    def _pack(pdf):
        pdf = pdf.sort_values(key_col, kind="mergesort").reset_index(drop=True)
        packs, pack, fill, first = [], 0, 0, True
        for w in pdf[weight_col].astype("int64"):
            if not first and fill + w > cap:
                pack += 1
                fill = 0
            fill += int(w)
            first = False
            packs.append(pack)
        pdf[pack_col] = packs
        return pdf

    return d.groupBy(shard_col).applyInPandas(_pack, schema=schema)


def shard_by_budget(df: DataFrame, key_col: str, weight_col: str,
                    budget: int, out_col: str = "shard") -> DataFrame:
    """Contiguous weight-range sharding: order rows by ``key_col``, take the
    EXCLUSIVE prefix sum of ``weight_col`` (token counts, bytes), and cut a
    shard boundary every ``budget`` units — shard = floor(prefix / budget).

    Deterministic (pure function of the sorted corpus), and each shard's
    overshoot is bounded by one row's weight — the property a training
    loader wants. The prefix sum is the two-level distributed one
    (operators/seq.py): range-partition by key, per-partition running sums
    in parallel, O(#partitions) scalar offsets — never a single-partition
    window over 10^12 rows."""
    from ..operators.seq import exclusive_prefix_sum
    d = exclusive_prefix_sum(df, [key_col], weight_col, "_prefix")
    # INTEGER division (`div`), not floor(double): Spark's `/` casts longs
    # to double, which stops representing every integer past 2^53 — a
    # 10^12-row corpus of ~1k-token docs reaches ~10^15, where a prefix of
    # budget*k - 1 can round up and misassign the shard
    return (d.withColumn(out_col, F.expr(f"_prefix div CAST({int(budget)} AS BIGINT)"))
            .drop("_prefix"))


def epoch_shuffle(df: DataFrame, key_col: str, n_shards: int,
                  seed: int = 0, shard_col: str = "shard",
                  pos_col: str = "pos") -> DataFrame:
    """Deterministic global shuffle + balanced round-robin sharding — the
    step between a curated corpus and a training run. Orders the corpus by
    ``md5(seed || ':' || key)`` (a seeded uniform permutation, so changing
    the seed re-shuffles every epoch while retries within an epoch are
    byte-identical), assigns a global sequence position, and deals rows to
    shards round-robin::

        shard = gpos %  n_shards     # every shard within +-1 row of equal
        pos   = gpos // n_shards     # read order inside the shard

    Why not ``ORDER BY rand()``: non-reproducible across retries, and a
    re-run after a lost executor silently re-deals the epoch. Why not
    ``repartition(n_shards)`` + local shuffle: shard membership would
    depend on the input partitioning, breaking resume. Here both columns
    are pure functions of (seed, key), so a killed epoch-prep job re-runs
    to the identical shards, and two engines agree bit-for-bit (the DuckDB
    gate twin is ``row_number() OVER (ORDER BY md5(...), key)`` plus the
    same modular arithmetic).

    Scale shape: the sequence comes from ``operators/seq.py`` (range
    shuffle on the hash — uniform by construction, no skew — then
    per-partition ranks and O(#partitions) driver-side offsets); there is
    no single-partition window and no per-shard window. A training loader
    then reads shard files in ``pos`` order: because shards interleave the
    hash order round-robin, each shard is itself a uniform sample of the
    corpus in shuffled order — loaders that consume shards in parallel
    see independent streams of one global permutation.

    ``key_col`` must be NON-NULL and unique (it is a document id — the
    same contract as ``seq_ids``): a NULL key raises at execution rather
    than silently taking a sentinel hash, because a sentinel would (a)
    collide with a literal key of the same spelling and (b) give two NULL
    rows identical sort keys, making their shard/pos partition-order
    dependent — both of which break the byte-identical-across-retries
    guarantee this operator exists to provide. (The samplers above use a
    sentinel deliberately: a dropped NULL row there biases a cohort; a
    NULL id here is corrupt input.)
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    from ..operators.seq import seq_ids
    k = F.col(key_col).cast("string")
    h = F.md5(F.when(k.isNull(), F.raise_error(F.lit(
            f"epoch_shuffle: NULL {key_col} — keys must be non-null ids")))
           .otherwise(F.concat_ws(":", F.lit(str(int(seed))), k)))
    d = seq_ids(df.withColumn("_h", h), ["_h", key_col], "_gpos", start=0)
    n = int(n_shards)
    return (d.withColumn(shard_col,
                         F.expr(f"CAST(_gpos % {n} AS INT)"))
             .withColumn(pos_col, F.expr(f"_gpos div {n}"))
             .drop("_h", "_gpos"))

#!/usr/bin/env python3
"""Differential-testing query generator.

Emits N random queries in a dialect-neutral SQL subset (valid for both
Spark SQL and DuckDB over the fixture tables) to fuzz_queries.json.
Deterministic for a given seed. Every query carries its own ORDER BY on
all output columns and rounds any double aggregate, following the same
parity rules as the hand-written oracle suite.

Usage: python3 tools/gen_fuzz.py <out.json> [n] [seed]
"""
import json
import random
import sys

TABLES = {
    "lineitem": {
        "ints": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        "doubles": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "strings": ["l_returnflag", "l_linestatus"],
    },
    "orders": {
        "ints": ["o_orderkey", "o_custkey"],
        "doubles": ["o_totalprice"],
        "strings": ["o_orderstatus", "o_orderpriority"],
    },
    "customer": {
        "ints": ["c_custkey", "c_nationkey"],
        "doubles": ["c_acctbal"],
        "strings": ["c_mktsegment", "c_name"],
    },
    "part": {
        "ints": ["p_partkey", "p_size"],
        "doubles": ["p_retailprice"],
        "strings": ["p_brand", "p_type", "p_name"],
    },
}


JOINS = [
    ("lineitem", "orders", "l_orderkey = o_orderkey"),
    ("orders", "customer", "o_custkey = c_custkey"),
    ("lineitem", "part", "l_partkey = p_partkey"),
]


def gen_where(rng, cols):
    preds = []
    for _ in range(rng.randint(0, 2)):
        which = rng.random()
        if which < 0.5:
            c = rng.choice(cols["ints"])
            op = rng.choice(["<", ">", "<=", ">=", "%"])
            if op == "%":
                preds.append(f"{c} % {rng.randint(2, 7)} = {rng.randint(0, 1)}")
            else:
                preds.append(f"{c} {op} {rng.randint(1, 5000)}")
        else:
            c = rng.choice(cols["doubles"])
            preds.append(f"{c} {rng.choice(['<', '>'])} {rng.randint(1, 50000)}")
    return (" WHERE " + " AND ".join(preds)) if preds else ""


def gen_window(rng):
    """Rank-window query: top-k rows per group by one ordering column,
    full-int tiebreak (the int tuple is unique per table in the fixtures,
    so row_number is deterministic). The partition is RANDOM: a string
    column or a derived int-modulo expression (probing partition-clause
    planning, not just categorical keys)."""
    table = rng.choice(list(TABLES))
    cols = TABLES[table]
    if rng.random() < 0.6:
        part = rng.choice(cols["strings"])
    else:
        part = f"{rng.choice(cols['ints'])} % {rng.randint(2, 9)}"
    order = rng.choice(cols["doubles"] + cols["ints"])
    dirn = rng.choice(["ASC", "DESC"])
    ties = ", ".join(f"{c} ASC" for c in cols["ints"])
    proj = ", ".join(cols["ints"])
    k = rng.randint(1, 5)
    fn = rng.choice(["row_number()", "rank()", "dense_rank()"])
    return (f"SELECT pk, {proj}, rn FROM ("
            f"SELECT {part} AS pk, {proj}, {fn} OVER (PARTITION BY {part} "
            f"ORDER BY {order} {dirn}, {ties}) AS rn FROM {table}"
            f"{gen_where(rng, cols)}) WHERE rn <= {k} "
            f"ORDER BY pk, rn, {proj}")


def gen_join(rng):
    """Fact⋈dim aggregate over an equi-join key."""
    fact, dim, cond = rng.choice(JOINS)
    fc, dc = TABLES[fact], TABLES[dim]
    g = rng.choice(dc["strings"])
    d = rng.choice(fc["doubles"])
    i = rng.choice(fc["ints"])
    having = (f" HAVING count(*) > {rng.randint(1, 50)}"
              if rng.random() < 0.4 else "")
    return (f"SELECT {g}, count(*) AS c, round(sum({d}), 2) AS s, "
            f"min({i}) AS m FROM {fact} JOIN {dim} ON {cond}"
            f"{gen_where(rng, fc)} GROUP BY {g}{having} ORDER BY {g}")


def gen_left_join(rng):
    """Row-level LEFT OUTER fact→dim (N:1, so output stays fact-sized)
    with an extra dim-side predicate INSIDE the ON clause — the shape
    where pushing the predicate below the join (inner-join rewrite) is
    WRONG; a planner doing so loses the null-extended rows. Every
    nullable output is coalesced so ordering parity never meets the
    engines' differing NULL sort defaults."""
    fact, dim, cond = rng.choice(JOINS)
    fc, dc = TABLES[fact], TABLES[dim]
    ds = rng.choice(dc["strings"])
    di = rng.choice(dc["ints"])
    extra = f" AND {di} % {rng.randint(2, 5)} = 0"
    proj = ", ".join(fc["ints"])
    lim = rng.randint(200, 500)
    return (f"SELECT {proj}, coalesce({ds}, '~none~') AS dv "
            f"FROM {fact} LEFT JOIN {dim} ON {cond}{extra}"
            f"{gen_where(rng, fc)} "
            f"ORDER BY {proj}, dv LIMIT {lim}")


def gen_anti_join(rng):
    """Anti join in its LEFT JOIN … IS NULL spelling (dialect-neutral
    where LEFT ANTI JOIN is not), on a RANDOM DERIVED key — the
    dim key matched against fact-key arithmetic (fk % m or fk + k), so
    the anti set depends on the derived-key planning both engines must
    agree on. Output is one row per unmatched dim row (non-null ints
    only)."""
    dim, dk, fact, fk, _ = rng.choice(LATERAL_KEYS)
    dc = TABLES[dim]
    derived = rng.choice([
        f"{fk} % {rng.randint(500, 3000)}",
        f"{fk} + {rng.randint(1, 200)}",
        fk,
    ])
    inner_where = gen_where(rng, TABLES[fact])
    proj = ", ".join(dc["ints"])
    outer = gen_where(rng, dc)
    glue = " AND " if outer else " WHERE "
    lim = rng.randint(200, 500)
    return (f"SELECT {proj} FROM {dim} LEFT JOIN "
            f"(SELECT DISTINCT {derived} AS jk FROM {fact}{inner_where}) f "
            f"ON {dk} = f.jk{outer}{glue}f.jk IS NULL "
            f"ORDER BY {proj} LIMIT {lim}")


def gen_derived_join(rng):
    """Aggregate over an equi-join whose key is DERIVED on the fact side
    (fk % m / fk + k against the dim key): random arithmetic keys probe
    expression-keyed join planning (hash of a projection, not a column).
    N:1 by construction, so output is bounded by the fact row count."""
    dim, dk, fact, fk, measure = rng.choice(LATERAL_KEYS)
    fc, dc = TABLES[fact], TABLES[dim]
    derived = rng.choice([
        f"{fk} % {rng.randint(500, 3000)}",
        f"{fk} + {rng.randint(1, 200)}",
    ])
    g = rng.choice(dc["strings"])
    i = rng.choice(fc["ints"])
    return (f"SELECT {g}, count(*) AS c, CAST(sum({i}) AS BIGINT) AS s, "
            f"round(sum({measure}), 2) AS m "
            f"FROM {fact} JOIN {dim} ON {derived} = {dk}"
            f"{gen_where(rng, fc)} GROUP BY {g} ORDER BY {g}")


SETOP_KEYS = [
    ("customer", "c_custkey", "orders", "o_custkey"),
    ("part", "p_partkey", "lineitem", "l_partkey"),
    ("orders", "o_orderkey", "lineitem", "l_orderkey"),
]


def gen_setop(rng):
    """Key-set algebra between a dimension and the fact referencing it."""
    t1, k1, t2, k2 = rng.choice(SETOP_KEYS)
    op = rng.choice(["INTERSECT", "EXCEPT", "UNION"])
    return (f"SELECT k FROM ("
            f"SELECT {k1} AS k FROM {t1}{gen_where(rng, TABLES[t1])} "
            f"{op} "
            f"SELECT {k2} AS k FROM {t2}{gen_where(rng, TABLES[t2])}"
            f") ORDER BY k")


def gen_scalar(rng):
    """Scalar-function projection chain over one table."""
    table = rng.choice(list(TABLES))
    cols = TABLES[table]
    key = cols["ints"][0]
    s = rng.choice(cols["strings"])
    d = rng.choice(cols["doubles"])
    # ORDER BY covers every output column: the LIMIT cut is only
    # deterministic under a total order of the projection (rows still
    # tied are identical in all emitted columns, so any pick matches)
    return (f"SELECT {key}, upper({s}) AS a0, length({s}) AS a1, "
            f"round({d}, 2) AS a2, substr({s}, 1, {rng.randint(2, 8)}) AS a3, "
            f"{s} || '_x' AS a4 FROM {table}{gen_where(rng, cols)} "
            f"ORDER BY {key}, a0, a1, a2, a3, a4 LIMIT 500")


def gen_rollup(rng):
    """Hierarchical aggregate over 1-2 string dims (subtotal rows NULL →
    coalesced so both engines sort them identically)."""
    table = rng.choice(list(TABLES))
    cols = TABLES[table]
    g = rng.sample(cols["strings"], rng.randint(1, min(2, len(cols["strings"]))))
    i = rng.choice(cols["ints"])
    proj = ", ".join(f"coalesce({c}, 'ALL') AS g{n}" for n, c in enumerate(g))
    order = ", ".join(f"g{n}" for n in range(len(g)))
    # HAVING c > 0 papers over a real engine divergence this fuzzer
    # found: over an EMPTY (fully filtered) input, DuckDB/standard SQL
    # emit the () grouping set's grand-total row (count 0), Spark emits
    # no rows at all. The guard makes both sides empty.
    return (f"SELECT {proj}, count(*) AS c, CAST(sum({i}) AS BIGINT) AS s "
            f"FROM {table}{gen_where(rng, cols)} "
            f"GROUP BY ROLLUP ({', '.join(g)}) HAVING count(*) > 0 "
            f"ORDER BY {order}, c, s")


def gen_frame(rng):
    """Positional window frames (ROWS BETWEEN) + lag/lead over a TOTAL
    order (the full int tuple is unique per table in the fixtures).
    Integer aggregates only: a ROWS frame fixes WHICH values aggregate
    but engines differ in summation ORDER (sliding segment trees vs
    running sums), so float frame-sums are not parity-safe. Window sums
    of ints are HUGEINT in DuckDB -> CAST AS BIGINT."""
    table = rng.choice(list(TABLES))
    cols = TABLES[table]
    part = rng.choice(cols["strings"])
    order = ", ".join(f"{c} ASC" for c in cols["ints"])
    i = rng.choice(cols["ints"])
    k = rng.randint(1, 4)
    frame = rng.choice([
        f"ROWS BETWEEN {k} PRECEDING AND CURRENT ROW",
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        f"ROWS BETWEEN {k} PRECEDING AND {k} FOLLOWING",
    ])
    fn = rng.choice([
        f"CAST(sum({i}) OVER w AS BIGINT)",
        f"min({i}) OVER w",
        f"max({i}) OVER w",
        f"count(*) OVER w",
        f"lag({i}, {k}) OVER w2",
        f"lead({i}, {k}) OVER w2",
    ])
    # lag/lead take no frame: w2 omits it (WINDOW clause parses in both)
    proj = ", ".join(cols["ints"])
    return (f"SELECT {part}, {proj}, {fn} AS wv FROM {table}"
            f"{gen_where(rng, cols)} "
            f"WINDOW w AS (PARTITION BY {part} ORDER BY {order} {frame}), "
            f"w2 AS (PARTITION BY {part} ORDER BY {order}) "
            f"ORDER BY {part}, {proj}")


LATERAL_KEYS = [
    ("customer", "c_custkey", "orders", "o_custkey", "o_totalprice"),
    ("part", "p_partkey", "lineitem", "l_partkey", "l_quantity"),
    ("orders", "o_orderkey", "lineitem", "l_orderkey", "l_extendedprice"),
]


def gen_lateral(rng):
    """Correlated LATERAL subquery (SQL-standard form, valid in Spark
    >= 3.2 and DuckDB): per outer row, aggregate the fact rows matching
    the key. Rows with no match keep count 0 / NULL aggregates — same in
    both engines because the lateral aggregate always yields one row."""
    dim, dk, fact, fk, measure = rng.choice(LATERAL_KEYS)
    dc = TABLES[dim]
    # every aggregate is coalesce-wrapped: this fuzzer FOUND that DuckDB
    # 1.0 DROPS the outer row when a correlated LATERAL aggregate's group
    # is empty (bare min/max/sum -> 14743 rows from 15000 orders), while
    # Spark keeps it with a NULL — the standard behavior (an aggregate
    # subquery always yields one row). coalesce() restores DuckDB's row,
    # making both engines emit all outer rows. Documented in OPERATORS.md.
    agg = rng.choice([
        "count(*) AS n",
        f"CAST(coalesce(sum({TABLES[fact]['ints'][0]}), 0) AS BIGINT) AS n",
        f"round(coalesce(sum({measure}), 0), 2) AS n",
        f"coalesce(min({TABLES[fact]['ints'][0]}), -1) AS n",
    ])
    lim = rng.randint(100, 400)
    return (f"SELECT {dk}, t.n FROM {dim}, "
            f"LATERAL (SELECT {agg} FROM {fact} WHERE {fk} = {dk}) t"
            f"{gen_where(rng, dc)} "
            f"ORDER BY {dk}, t.n LIMIT {lim}")


def gen_exists(rng):
    """Correlated EXISTS / NOT EXISTS and uncorrelated IN / NOT IN
    (decorrelation + anti/semi-join planning differ per engine — the
    LATERAL shape found a real divergence here, so this probes the same
    machinery from the quantified-predicate side). Key columns are
    NOT NULL in the fixtures, so NOT IN's null semantics don't bite."""
    dim, dk, fact, fk, _ = rng.choice(LATERAL_KEYS)
    dc = TABLES[dim]
    neg = rng.choice(["", "NOT "])
    inner_where = gen_where(rng, TABLES[fact])
    if rng.random() < 0.5:
        sub = (f"{neg}EXISTS (SELECT 1 FROM {fact} WHERE {fk} = {dk}"
               f"{inner_where.replace(' WHERE ', ' AND ', 1)})")
    else:
        sub = (f"{dk} {neg}IN (SELECT {fk} FROM {fact}{inner_where})")
    outer = gen_where(rng, dc)
    glue = " AND " if outer else " WHERE "
    proj = ", ".join(dc["ints"])
    lim = rng.randint(100, 400)
    return (f"SELECT {proj} FROM {dim}{outer}{glue}{sub} "
            f"ORDER BY {proj} LIMIT {lim}")


def gen_query(rng):
    shape = rng.random()
    if shape < 0.13:
        return gen_window(rng)
    if shape < 0.23:
        return gen_join(rng)
    if shape < 0.30:
        return gen_setop(rng)
    if shape < 0.36:
        return gen_scalar(rng)
    if shape < 0.43:
        return gen_rollup(rng)
    if shape < 0.51:
        return gen_frame(rng)
    if shape < 0.58:
        return gen_lateral(rng)
    if shape < 0.65:
        return gen_exists(rng)
    if shape < 0.73:
        return gen_left_join(rng)
    if shape < 0.81:
        return gen_anti_join(rng)
    if shape < 0.89:
        return gen_derived_join(rng)
    table = rng.choice(list(TABLES))
    cols = TABLES[table]
    group = rng.sample(cols["strings"], rng.randint(1, min(2, len(cols["strings"]))))
    aggs = []
    for _ in range(rng.randint(1, 3)):
        kind = rng.choice(["count", "sum_int", "min_int", "max_int",
                           "sum_round", "min_d", "max_d", "count_distinct"])
        i = rng.choice(cols["ints"])
        d = rng.choice(cols["doubles"])
        alias = f"a{len(aggs)}"
        if kind == "count":
            aggs.append(f"count(*) AS {alias}")
        elif kind == "sum_int":
            # integer sums are HUGEINT in DuckDB -> float through the
            # driver's pandas path ("5" vs "5.0" hash-mismatch); CAST is
            # a no-op for Spark's BIGINT sum (caught by seed 4242's
            # fuzz0088 in round 11)
            aggs.append(f"CAST(sum({i}) AS BIGINT) AS {alias}")
        elif kind == "min_int":
            aggs.append(f"min({i}) AS {alias}")
        elif kind == "max_int":
            aggs.append(f"max({i}) AS {alias}")
        elif kind == "sum_round":
            aggs.append(f"round(sum({d}), 2) AS {alias}")
        elif kind == "min_d":
            aggs.append(f"round(min({d}), 4) AS {alias}")
        elif kind == "max_d":
            aggs.append(f"round(max({d}), 4) AS {alias}")
        else:
            aggs.append(f"count(DISTINCT {i}) AS {alias}")
    where = gen_where(rng, cols)
    gcols = ", ".join(group)
    sql = (f"SELECT {gcols}, {', '.join(aggs)} FROM {table}{where} "
           f"GROUP BY {gcols} ORDER BY {gcols}")
    return sql


def main():
    out = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    rng = random.Random(seed)
    queries = {f"fuzz{i:04d}": gen_query(rng) for i in range(n)}
    with open(out, "w") as f:
        json.dump(queries, f, indent=1)
    print(f"wrote {n} queries to {out}")


if __name__ == "__main__":
    main()

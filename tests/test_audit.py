"""Data-audit operators: exact first-digit extraction at power-of-ten
boundaries, SQL-truncating signed division, kappa/Benford/association
rules vs direct DuckDB computation, and bucket-count invariance of the
pair exchange."""

import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_first_digit_power_of_ten_exact():
    from raydoc.functions.audit import _first_digit

    v = np.array([1, 9, 10, 11, 99, 100, 101, 999, 1000,
                  10**6, 10**6 + 1, 5 * 10**12, 7], np.int64)
    assert _first_digit(v).tolist() == \
        [int(str(x)[0]) for x in v.tolist()]


def test_trunc_div_matches_sql():
    import duckdb

    from raydoc.functions.audit import _trunc_div

    cases = [(7, 2), (-7, 2), (7, -2), (-7, -2), (0, 5), (-1, 3),
             (-999999, 1000000), (999999, 1000000)]
    for n, d in cases:
        assert _trunc_div(n, d) == duckdb.sql(
            f"SELECT {n} // ({d})").fetchone()[0], (n, d)


def test_benford_matches_duckdb(ray_session):
    import duckdb

    from raydoc.functions.audit import benford_values

    mine = benford_values(SF).to_pandas()
    exp = duckdb.sql(f"""
        WITH v AS (SELECT CAST(ROUND(value*100) AS BIGINT) AS c
                   FROM read_parquet('{SF}/events.parquet')
                   WHERE CAST(ROUND(value*100) AS BIGINT) > 0),
        d AS (SELECT CAST(substr(CAST(c AS VARCHAR),1,1) AS BIGINT)
                  AS digit, COUNT(*) AS n FROM v GROUP BY digit)
        SELECT digit, CAST(n AS BIGINT) AS n,
               CAST(n * 1000000 // (SELECT SUM(n) FROM d) AS BIGINT)
                   AS ppm
        FROM d ORDER BY digit""").fetchdf()
    assert mine.reset_index(drop=True).equals(exp.reset_index(drop=True))
    assert mine["n"].sum() > 0
    assert 0 < mine["ppm"].sum() <= 1_000_000


def test_cohen_kappa_known_matrix(ray_session):
    """Engine cells equal DuckDB's; kappa is the exact ppm of the
    standard formula on those cells."""
    import duckdb

    from raydoc.functions.audit import cohen_kappa

    r = cohen_kappa(SF).to_pylist()[0]
    n11, n10, n01, n00 = (r["n_both_pos"], r["n_a_only"],
                          r["n_b_only"], r["n_both_neg"])
    exp = duckdb.sql(f"""
        SELECT SUM(CASE WHEN a AND b THEN 1 ELSE 0 END),
               SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END),
               SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END),
               SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)
        FROM (SELECT n_chars >= 300 AS a,
                     length(text)-length(replace(text,' ','')) >= 55 AS b
              FROM read_parquet('{SF}/documents.parquet'))""").fetchone()
    assert (n11, n10, n01, n00) == tuple(int(x) for x in exp)
    nn = n11 + n10 + n01 + n00
    pe = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    assert r["po_ppm"] == (n11 + n00) * 1_000_000 // nn
    assert r["kappa_ppm"] == int(
        (nn * (n11 + n00) - pe) * 1_000_000 / (nn * nn - pe))


def test_association_rules_consistency(ray_session):
    """Rules agree with DuckDB and are bucket-count invariant; every
    (a,b) rule has its (b,a) mirror with the same n_both."""
    import duckdb

    from raydoc.functions.audit import association_rules

    mine = association_rules(SF).to_pandas()
    alt = association_rules(SF, num_buckets=4).to_pandas()
    assert mine.equals(alt)

    exp = duckdb.sql(f"""
        WITH d AS (SELECT DISTINCT user_id, event_type
                   FROM read_parquet('{SF}/events.parquet')),
        n_tot AS (SELECT COUNT(DISTINCT user_id) AS nu
                  FROM read_parquet('{SF}/events.parquet')),
        sizes AS (SELECT event_type, COUNT(*) AS n
                  FROM d GROUP BY event_type),
        pairs AS (SELECT a.event_type AS ta, b.event_type AS tb,
                         COUNT(*) AS nab
                  FROM d a JOIN d b ON a.user_id = b.user_id
                   AND a.event_type <> b.event_type GROUP BY ta, tb)
        SELECT ta AS antecedent, tb AS consequent,
               CAST(nab AS BIGINT) AS n_both,
               CAST(sa.n AS BIGINT) AS n_ante,
               CAST(nab * 1000000 // sa.n AS BIGINT) AS conf_ppm,
               CAST(CAST(nab AS HUGEINT) * nu * 1000000
                    // (CAST(sa.n AS HUGEINT) * sb.n) AS BIGINT)
                   AS lift_ppm
        FROM pairs JOIN sizes sa ON ta = sa.event_type
        JOIN sizes sb ON tb = sb.event_type, n_tot
        ORDER BY antecedent, consequent""").fetchdf()
    assert mine.reset_index(drop=True).equals(exp.reset_index(drop=True))

    fwd = {(r.antecedent, r.consequent): r.n_both
           for r in mine.itertuples()}
    for (a, b), n in fwd.items():
        assert fwd[(b, a)] == n

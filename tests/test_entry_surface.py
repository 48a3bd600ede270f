"""Registration-surface guards: the driver contract's two dicts stay
consistent, and every oracle is at least syntactically valid DuckDB
(EXPLAIN against the real sf0.001 views — catches a typo'd column or
function name at test time instead of inside a 277-query gate run)."""

import duckdb
import pytest

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def surface():
    return entrymod.queries(), entrymod.oracle_sql()


def test_every_oracle_has_a_query(surface):
    qs, oracles = surface
    assert set(oracles) - set(qs) == set()


def test_query_names_are_wellformed(surface):
    qs, _ = surface
    for name, fn in qs.items():
        assert name == name.lower() and " " not in name
        assert callable(fn)


def test_surface_size_floor(surface):
    """Ratchet: the driver surface must never silently shrink."""
    qs, oracles = surface
    assert len(qs) >= 277
    assert len(oracles) >= 239


def test_all_oracles_parse(surface):
    _, oracles = surface
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    bad = []
    for name, sql in oracles.items():
        if "read_parquet('/tmp/" in sql:
            continue  # scratch-handshake oracles need the query to run first
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001
            bad.append((name, str(e).splitlines()[0]))
    assert bad == []

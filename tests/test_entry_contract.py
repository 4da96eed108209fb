"""Local replica of the driver's correctness gate: run every ``queries()``
entry and its ``oracle_sql()`` twin side-by-side (Spark vs DuckDB) at
sf0.001 and compare row-count + column names + order-insensitive values."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(val):
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return round(val, 9)
    if isinstance(val, (list, tuple)):
        return tuple(_canon(v) for v in val)
    return val


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_canon(r[i]) for i in order) for r in rows),
        key=repr,  # None-safe total order (cube/rollup emit NULL dims)
    )


ORACLE_KEYS = sorted(entry_mod.oracle_sql().keys())


def test_every_oracle_has_a_query():
    qs = entry_mod.queries()
    missing = [k for k in ORACLE_KEYS if k not in qs]
    assert not missing, f"oracle_sql keys without queries(): {missing}"


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_duckdb(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    sql = entry_mod.oracle_sql()[name]
    # the driver's gate runs at sf0.01 (where the committed golden points);
    # this local replica runs at sf0.001 — swap in the matching golden
    sql = sql.replace("flagship_sf0.01.parquet", "flagship_sf0.001.parquet")
    res = duck.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = _canon_rows(spark_cols, spark_rows)
    b = _canon_rows(duck_cols, duck_rows)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["doc_id", "n_spans", "n_pages", "text_hash"]
    assert all(r["n_spans"] > 0 for r in rows)


def test_sparkonly_queries_run(spark):
    qs = entry_mod.queries()
    for name in ("flagship_extract_spans", "sim_lsh_ann_topk", "sim_knn_join",
                 "sim_embedding_near_dups", "multimodal_features"):
        assert name in qs
        rows = qs[name](spark, SF_DIR).collect()
        assert len(rows) >= 0


def test_bench_headline_names_are_registered():
    """Every bench.py HEADLINE name must be a queries() entry — a renamed
    query must not silently vanish from the per-round benchmark."""
    import bench

    qs = entry_mod.queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, missing

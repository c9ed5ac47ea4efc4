"""Manifest/DAG/selector tests mirroring the reference's mock-manifest
fixtures (FIXTURES.md §B; dbtwiz tests/conftest.py:102-130)."""

from __future__ import annotations

import pytest

from dbtwiz_spark.macros import extract_refs, render, scd2_sql
from dbtwiz_spark.manifest import Manifest, Model, Source


def build_manifest() -> Manifest:
    m = Manifest()
    m.add_source(Source("source1", "/tmp/source1"))
    m.add_model(Model("model1", "SELECT * FROM {{ ref('source1') }}", materialized="view"))
    m.add_model(
        Model(
            "model2",
            "SELECT * FROM {{ ref('model1') }} WHERE partitiondate >= {{ interval_start() }}",
            materialized="incremental",
            incremental_strategy="insert_overwrite",
            partition_by="partitiondate",
            require_partition_filter=True,
            partition_expiration_days=180,
            tags=["daily"],
        )
    )
    m.add_model(Model("model3", "SELECT * FROM {{ ref('model2') }}", tags=["daily"]))
    return m


def test_dag_maps_and_closures():
    m = build_manifest()
    assert m.parent_map["model2"] == {"model1"}
    assert m.child_map["model1"] == {"model2"}
    assert m.upstream("model3") == {"model1", "model2"}
    assert m.downstream("model1") == {"model2", "model3"}


def test_topo_order():
    m = build_manifest()
    assert m.topo_order() == ["model1", "model2", "model3"]


def test_selectors():
    m = build_manifest()
    assert m.select("model2") == ["model2"]
    assert m.select("+model2") == ["model1", "model2"]
    assert m.select("model2+") == ["model2", "model3"]
    assert m.select("+model3+") == ["model1", "model2", "model3"]
    assert m.select("tag:daily") == ["model2", "model3"]
    with pytest.raises(KeyError):
        m.select("nope")


def test_state_modified_selector():
    m = build_manifest()
    state = m.fingerprints()
    assert m.select("state:modified", state=state) == []
    m.models["model2"].sql += " AND 1=1"
    assert m.select("state:modified", state=state) == ["model2"]


def test_cycle_detection():
    m = Manifest()
    m.add_model(Model("a", "SELECT * FROM {{ ref('b') }}"))
    m.add_model(Model("b", "SELECT * FROM {{ ref('a') }}"))
    with pytest.raises(ValueError, match="cycle"):
        m.topo_order()


def test_extract_refs_and_render():
    sql = (
        "SELECT * FROM {{ ref('m1') }} JOIN {{ source('ds', 'src1') }} USING (k) "
        "WHERE d >= {{ interval_start() }} AND x = {{ var('x', 7) }}"
    )
    assert extract_refs(sql) == ["m1", "src1"]
    out = render(
        sql,
        resolve={"m1": "wh_m1", "src1": "wh_src1"},
        variables={"x": 9},
        interval_start="2024-01-01",
        interval_end="2024-01-31",
    )
    assert "wh_m1" in out and "wh_src1" in out
    assert "TIMESTAMP '2024-01-01'" in out and "x = 9" in out


def test_scd2_macro_shape():
    sql = scd2_sql("staging_customers", "customer_id", "partitiondate")
    assert "LEAD(partitiondate)" in sql and "PARTITION BY customer_id" in sql


def test_readd_model_drops_stale_edges():
    """Re-registering a model (edit / move rewrite) must replace its edges:
    stale child_map entries would corrupt closures and topo order."""
    from dbtwiz_spark.manifest import Manifest, Model

    m = Manifest()
    m.add_model(Model("a", "SELECT 1"))
    m.add_model(Model("c", "SELECT 1"))
    m.add_model(Model("b", "SELECT * FROM {{ ref('a') }}"))
    assert "b" in m.downstream("a")
    # b now depends on c instead of a
    m.add_model(Model("b", "SELECT * FROM {{ ref('c') }}"))
    assert "b" not in m.downstream("a")
    assert "b" in m.downstream("c")
    order = m.topo_order()
    assert order.index("c") < order.index("b")

import pyarrow as pa
import pytest

from rfb_cnpj_etl_ray.spec import (
    PAYLOAD_SCHEMA,
    SchemaEvolutionError,
    TableSpec,
    conform_table,
    evolve_schema,
    schema_from_jsonable,
    schema_to_jsonable,
)


def test_evolve_identity():
    assert evolve_schema(PAYLOAD_SCHEMA, PAYLOAD_SCHEMA) is PAYLOAD_SCHEMA


def test_evolve_column_add():
    incoming = PAYLOAD_SCHEMA.append(pa.field("lang", pa.string()))
    out = evolve_schema(PAYLOAD_SCHEMA, incoming)
    assert out.field("lang").type == pa.string()
    assert out.names == PAYLOAD_SCHEMA.names + ["lang"]


def test_evolve_widen_accepts_narrow_incoming():
    # early segments wrote n_tok:int16 — table stays int32, values cast up
    narrow = pa.schema(
        [pa.field("doc_id", pa.string()), pa.field("n_tok", pa.int16())]
    )
    out = evolve_schema(PAYLOAD_SCHEMA, narrow)
    assert out.field("n_tok").type == pa.int32()


def test_evolve_widen_upgrades_table():
    wide = pa.schema([pa.field("n_tok", pa.int64())])
    out = evolve_schema(PAYLOAD_SCHEMA, wide)
    assert out.field("n_tok").type == pa.int64()
    assert out.field("tokens").type == pa.list_(pa.int32())


def test_evolve_list_value_widen():
    cur = pa.schema([pa.field("tokens", pa.list_(pa.int32()))])
    wide = pa.schema([pa.field("tokens", pa.list_(pa.int64()))])
    assert evolve_schema(cur, wide).field("tokens").type == pa.list_(pa.int64())


def test_evolve_rejects_type_change():
    bad = pa.schema([pa.field("n_tok", pa.string())])
    with pytest.raises(SchemaEvolutionError):
        evolve_schema(PAYLOAD_SCHEMA, bad)


def test_schema_json_roundtrip():
    sch = PAYLOAD_SCHEMA.append(pa.field("emb", pa.list_(pa.float32())))
    assert schema_from_jsonable(schema_to_jsonable(sch)).equals(sch)


def test_tablespec_json_roundtrip():
    spec = TableSpec(name="sequences", schema=PAYLOAD_SCHEMA)
    back = TableSpec.from_json(spec.to_json())
    assert back.name == spec.name
    assert back.schema.equals(spec.schema)
    assert back.key == ("doc_id",)


def test_conform_table_adds_nulls_and_casts():
    t = pa.table({"doc_id": ["a"], "n_tok": pa.array([3], pa.int16())})
    out = conform_table(t, PAYLOAD_SCHEMA)
    assert out.schema.equals(PAYLOAD_SCHEMA)
    assert out.column("tokens").null_count == 1
    assert out.column("n_tok").to_pylist() == [3]

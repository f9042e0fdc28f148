"""TableSpec registry + schema-evolution rules.

The reference drives *everything* off one declared-schema dict
(``SCHEMA``, reference ``src/rfb_cnpj_etl/db/schema.py:11-193`` — its
documented "source of truth" for DDL, file→table routing and load logic).
This module is the engine's equivalent: a registry of ``TableSpec``s —
``pyarrow.Schema`` + key columns — that drives readers, mergers and sinks,
plus the schema-evolution rules the north rule adds on top (column add,
integer widen; narrowing rejected loudly).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import pyarrow as pa


class SchemaEvolutionError(ValueError):
    """An incoming segment schema is incompatible with the table spec."""


#: the north-rule payload table: pre-tokenized training sequences.
PAYLOAD_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
    ]
)

#: change event = payload columns (nullable for op="D") + log position + op.
CHANGE_SCHEMA = pa.schema(
    [
        pa.field("lsn", pa.int64()),
        pa.field("op", pa.string()),  # "I" | "U" | "D"
    ]
    + list(PAYLOAD_SCHEMA)
)

OPS = ("I", "U", "D")


@dataclass
class TableSpec:
    """Declared schema + keys for one logical lake table.

    Reference analog: one entry of ``SCHEMA`` (schema.py) holding columns,
    ``primary_key`` and ``source_file_stem`` routing. Here the key is the
    merge/upsert key and the hash-partition key.
    """

    name: str
    schema: pa.Schema
    key: tuple[str, ...] = ("doc_id",)
    lsn_column: str = "lsn"
    #: routing stems: a change-log segment file whose stem starts with one of
    #: these feeds this table (reference: ``source_file_stem`` +
    #: ``get_targets_from_zip_name``, db_batch_producer.py:18-28).
    source_file_stems: tuple[str, ...] = ("seg",)

    def change_schema(self) -> pa.Schema:
        fields = [pa.field(self.lsn_column, pa.int64()), pa.field("op", pa.string())]
        fields += [f for f in self.schema]
        return pa.schema(fields)

    def to_json(self) -> str:
        return json.dumps(
            {
                "name": self.name,
                "key": list(self.key),
                "lsn_column": self.lsn_column,
                "source_file_stems": list(self.source_file_stems),
                "schema": schema_to_jsonable(self.schema),
            },
            indent=2,
        )

    @classmethod
    def from_json(cls, text: str) -> "TableSpec":
        d = json.loads(text)
        return cls(
            name=d["name"],
            schema=schema_from_jsonable(d["schema"]),
            key=tuple(d["key"]),
            lsn_column=d["lsn_column"],
            source_file_stems=tuple(d["source_file_stems"]),
        )


#: default registry: the one north-rule table. Additional logical tables
#: (reference has 10) register here the same way.
REGISTRY: dict[str, TableSpec] = {
    "sequences": TableSpec(name="sequences", schema=PAYLOAD_SCHEMA),
}


# --------------------------------------------------------------------------
# schema (de)serialization — enough of the Arrow type algebra for our specs
# --------------------------------------------------------------------------

def _type_to_str(t: pa.DataType) -> str:
    if pa.types.is_list(t):
        return f"list<{_type_to_str(t.value_type)}>"
    if pa.types.is_large_list(t):
        return f"large_list<{_type_to_str(t.value_type)}>"
    return str(t)


def _type_from_str(s: str) -> pa.DataType:
    if s.startswith("list<") and s.endswith(">"):
        return pa.list_(_type_from_str(s[5:-1]))
    if s.startswith("large_list<") and s.endswith(">"):
        return pa.large_list(_type_from_str(s[11:-1]))
    atomic = {
        "bool": pa.bool_(),
        "int8": pa.int8(),
        "int16": pa.int16(),
        "int32": pa.int32(),
        "int64": pa.int64(),
        "uint8": pa.uint8(),
        "uint16": pa.uint16(),
        "uint32": pa.uint32(),
        "uint64": pa.uint64(),
        "float": pa.float32(),
        "float32": pa.float32(),
        "double": pa.float64(),
        "float64": pa.float64(),
        "string": pa.string(),
        "large_string": pa.large_string(),
        "binary": pa.binary(),
        "large_binary": pa.large_binary(),
        "date32": pa.date32(),
        "date32[day]": pa.date32(),
        "timestamp[us]": pa.timestamp("us"),
        "timestamp[ms]": pa.timestamp("ms"),
        "timestamp[ns]": pa.timestamp("ns"),
    }
    if s in atomic:
        return atomic[s]
    raise ValueError(f"unsupported type string: {s!r}")


def schema_to_jsonable(schema: pa.Schema) -> list[list[str]]:
    return [[f.name, _type_to_str(f.type)] for f in schema]


def schema_from_jsonable(cols: list[list[str]]) -> pa.Schema:
    return pa.schema([pa.field(n, _type_from_str(t)) for n, t in cols])


# --------------------------------------------------------------------------
# evolution rules
# --------------------------------------------------------------------------

#: widening whitelist: src type -> set of allowed wider types. Integer chain
#: int8 < int16 < int32 < int64; float32 < float64. Anything else — including
#: int->string, narrowing, signedness changes — is rejected.
_WIDEN: dict[str, tuple[str, ...]] = {
    "int8": ("int16", "int32", "int64"),
    "int16": ("int32", "int64"),
    "int32": ("int64",),
    "uint8": ("uint16", "uint32", "uint64", "int16", "int32", "int64"),
    "uint16": ("uint32", "uint64", "int32", "int64"),
    "uint32": ("uint64", "int64"),
    "float": ("double",),
    "string": ("large_string",),
}


def _can_widen(src: pa.DataType, dst: pa.DataType) -> bool:
    if src.equals(dst):
        return True
    if pa.types.is_list(src) and pa.types.is_list(dst):
        return _can_widen(src.value_type, dst.value_type)
    return str(dst) in _WIDEN.get(str(src), ())


def evolve_schema(current: pa.Schema, incoming: pa.Schema) -> pa.Schema:
    """Merge an incoming segment schema into the current table schema.

    Rules (north rule; FIXTURES.md F3):
      * column add — a field present only in ``incoming`` is appended
        (earlier rows read as null);
      * integer/float widen — a field present in both with a wider incoming
        type upgrades the table type; a *narrower* incoming type is fine
        (values are cast up on read);
      * anything else (type change, e.g. int32 -> string) raises
        :class:`SchemaEvolutionError`.

    Returns the evolved schema; equals ``current`` when nothing changed.
    """
    fields: list[pa.Field] = []
    incoming_by_name = {f.name: f for f in incoming}
    for f in current:
        inc = incoming_by_name.pop(f.name, None)
        if inc is None:
            fields.append(f)
        elif _can_widen(inc.type, f.type):
            fields.append(f)  # incoming narrower-or-equal: cast up on read
        elif _can_widen(f.type, inc.type):
            fields.append(pa.field(f.name, inc.type))  # widen table column
        else:
            raise SchemaEvolutionError(
                f"column {f.name!r}: cannot evolve {f.type} <-> {inc.type} "
                "(only column-add and integer/float widening are allowed)"
            )
    # column adds, in incoming order
    for f in incoming_by_name.values():
        fields.append(f)
    evolved = pa.schema(fields)
    return current if evolved.equals(current) else evolved


def conform_table(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Cast ``table`` to ``schema``: add missing columns as nulls, reorder,
    and widen-cast existing columns. Zero-copy when already conformant."""
    if table.schema.equals(schema):
        return table
    n = table.num_rows
    cols = []
    for f in schema:
        idx = table.schema.get_field_index(f.name)
        if idx == -1:
            cols.append(pa.nulls(n, f.type))
        else:
            col = table.column(idx)
            cols.append(col if col.type.equals(f.type) else col.cast(f.type))
    return pa.Table.from_arrays(cols, schema=schema)

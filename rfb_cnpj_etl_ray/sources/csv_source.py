"""Raw-format source parity: zipped, headerless, delimited CSV + routing.

The reference's only input format is zip archives of semicolon-delimited
latin-1 CSV with NO header, read member-by-member without extraction
(``utils/db_batch_producer.py:52-57``, README.md:69), routed to logical
tables by filename stem (``get_targets_from_zip_name``,
db_batch_producer.py:18-28) with columns bound positionally against the
declared schema. The engine keeps that capability for raw-format
ingestion while the CDC path reads Parquet change logs.
"""

from __future__ import annotations

import io
import re
import zipfile
from pathlib import Path

import pyarrow as pa
import pyarrow.csv as pacsv

import ray.data

from rfb_cnpj_etl_ray.spec import TableSpec


def route_targets(file_name: str, registry: dict[str, TableSpec]) -> list[str]:
    """S6: strip the extension and trailing digits from the stem, match
    case-insensitively against each spec's ``source_file_stems``. One
    file may feed SEVERAL tables (reference: ``Estabelecimentos*`` →
    estabelecimento + estabelecimento_cnae_sec)."""
    stem = Path(file_name).stem
    stem = re.sub(r"\d+$", "", stem).lower()
    return [
        name
        for name, spec in registry.items()
        if any(stem == s.lower() or stem.startswith(s.lower())
               for s in spec.source_file_stems)
    ]


def _parse_member(
    data: bytes,
    column_names: list[str],
    encoding: str = "latin-1",
    delimiter: str = ";",
) -> pa.Table:
    """Parse one CSV member: headerless, positional columns, every field
    read as string (the reference keeps all cells as str until the
    normalizers run — schema.py types are applied later)."""
    return pacsv.read_csv(
        io.BytesIO(data),
        read_options=pacsv.ReadOptions(
            column_names=column_names, encoding=encoding
        ),
        parse_options=pacsv.ParseOptions(delimiter=delimiter),
        convert_options=pacsv.ConvertOptions(
            column_types={c: pa.string() for c in column_names}
        ),
    )


def read_zip_csv(
    zip_paths: list[str],
    column_names: list[str],
    encoding: str = "latin-1",
    delimiter: str = ";",
) -> "ray.data.Dataset":
    """S5: stream CSV rows out of zip archives WITHOUT extracting to disk.

    Each zip is one binary blob task (``read_binary_files``); members are
    parsed in-memory with the pyarrow CSV reader (C++, vectorized). At
    100 TB the unit of parallelism is the archive — match the reference's
    thread-per-file producer (db_batch_producer.py:132-140) but elastic.
    """

    def parse_zip(batch: pa.Table) -> pa.Table:
        tables = []
        for blob in batch.column("bytes"):
            with zipfile.ZipFile(io.BytesIO(blob.as_py())) as zf:
                for member in zf.namelist():
                    tables.append(
                        _parse_member(zf.read(member), column_names,
                                      encoding, delimiter)
                    )
        if not tables:
            return pa.schema(
                [pa.field(c, pa.string()) for c in column_names]
            ).empty_table()
        return pa.concat_tables(tables)

    ds = ray.data.read_binary_files(zip_paths)
    return ds.map_batches(parse_zip, batch_format="pyarrow", batch_size=1)


def read_csv_files(
    paths: list[str],
    column_names: list[str],
    encoding: str = "latin-1",
    delimiter: str = ";",
) -> "ray.data.Dataset":
    """Plain (un-zipped) variant of the same reader."""

    def parse(batch: pa.Table) -> pa.Table:
        tables = [
            _parse_member(blob.as_py(), column_names, encoding, delimiter)
            for blob in batch.column("bytes")
        ]
        return pa.concat_tables(tables)

    ds = ray.data.read_binary_files(paths)
    return ds.map_batches(parse, batch_format="pyarrow", batch_size=1)

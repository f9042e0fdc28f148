"""The reference's 10-table CNPJ registry, instantiated end-to-end.

This module carries the complete ``SCHEMA`` dict of the reference
(``/root/reference/src/rfb_cnpj_etl/db/schema.py:11-193``) as engine
``TableSpec``s — every table, every column, the file→table routing stems
and the multi-target ``Estabelecimentos`` → estabelecimento +
estabelecimento_cnae_sec explode (``db_batch_producer.py:61-72``) — plus
the per-table transform chains of ``transform_batch``
(``db_transformers.py:99-126``): sanitize everywhere, BR-numeric on
``empresa.capital_social``, date normalization on the reference's exact
date-column lists.

The engine's lake is ``doc_id``-keyed (north rule), so each table's
primary key maps onto ``doc_id``:

* dimension tables → their code column;
* ``empresa``/``simples`` → ``cnpj_basico``;
* ``estabelecimento`` → the full 14-digit CNPJ (basico‖ordem‖dv) — note
  the skew analogy the north star names: establishments share one
  empresa root, exactly the hot-key family the merge combiner tames;
* ``socio`` → composite (reference declares no PK; loads are
  append-shaped, the composite makes re-loads idempotent);
* ``estabelecimento_cnae_sec`` → full CNPJ + '-' + cod_cnae.

Load = the reference's monthly full load (drop-and-reload,
``sqlite_builder.py:170-177``) re-expressed as an epoch-0 distributed
init: zip → in-memory CSV parse → vectorized chain → hash-partitioned
staged exchange → atomic commit. Incremental updates then flow through
the normal CDC ``ingest`` path against the same tables.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from rfb_cnpj_etl_ray.spec import TableSpec, conform_table
from rfb_cnpj_etl_ray.stages.sanitize import (
    TransformChain,
    explode_delimited,
    normalize_numeric_br,
    sanitize_cells,
)

# ---------------------------------------------------------------------------
# source columns (positional, per reference schema.py — CSVs are headerless)
# ---------------------------------------------------------------------------

SOURCE_COLUMNS: dict[str, list[str]] = {
    "cnae": ["cod_cnae", "nome_cnae"],
    "motivo": ["cod_motivo", "nome_motivo"],
    "municipio": ["cod_municipio", "nome_municipio"],
    "natureza_juridica": ["cod_natureza", "nome_natureza"],
    "pais": ["cod_pais", "nome_pais"],
    "qualificacao_socio": ["cod_qualificacao", "nome_qualificacao"],
    "empresa": [
        "cnpj_basico", "razao_social", "cod_natureza_juridica",
        "cod_qualificacao_responsavel", "capital_social", "cod_porte",
        "ente_federativo_responsavel",
    ],
    "estabelecimento": [
        "cnpj_basico", "cnpj_ordem", "cnpj_dv", "matriz_filial",
        "nome_fantasia", "cod_situacao_cadastral", "data_situacao_cadastral",
        "cod_motivo_situacao_cadastral", "nome_cidade_exterior", "cod_pais",
        "data_inicio_atividade", "cod_cnae_principal", "cod_cnae_secundario",
        "tipo_logradouro", "logradouro", "numero", "complemento", "bairro",
        "cep", "uf", "cod_municipio", "ddd_telefone_1", "telefone_1",
        "ddd_telefone_2", "telefone_2", "ddd_fax", "fax", "email",
        "situacao_especial", "data_situacao_especial",
    ],
    "simples": [
        "cnpj_basico", "opcao_simples", "data_opcao_simples",
        "data_exclusao_simples", "opcao_mei", "data_opcao_mei",
        "data_exclusao_mei",
    ],
    "socio": [
        "cnpj_basico", "identificador_socio", "nome_socio", "cnpj_cpf_socio",
        "cod_qualificacao_socio", "data_entrada_sociedade", "cod_pais",
        "cpf_representante_legal", "nome_representante_legal",
        "cod_qualificacao_representante_legal", "cod_faixa_etaria",
    ],
    # derived from the estabelecimento source file (multi-target route)
    "estabelecimento_cnae_sec": [
        "cnpj_basico", "cnpj_ordem", "cnpj_dv", "cod_cnae",
    ],
}

#: reference date-column lists (db_transformers.py:99-126 dispatch)
DATE_COLUMNS: dict[str, list[str]] = {
    "estabelecimento": ["data_situacao_cadastral", "data_inicio_atividade",
                        "data_situacao_especial"],
    "simples": ["data_opcao_simples", "data_exclusao_simples",
                "data_opcao_mei", "data_exclusao_mei"],
    "socio": ["data_entrada_sociedade"],
}

#: M5 per-table chains — the reference's transform_batch dispatch as data
CHAINS: dict[str, TransformChain] = {
    name: TransformChain(
        numeric_br=(["capital_social"] if name == "empresa" else []),
        date_columns=DATE_COLUMNS.get(name, []),
    )
    for name in SOURCE_COLUMNS
}

#: doc_id derivation per table: columns concatenated with the separator.
DOC_ID_COLUMNS: dict[str, tuple[list[str], str]] = {
    "cnae": (["cod_cnae"], ""),
    "motivo": (["cod_motivo"], ""),
    "municipio": (["cod_municipio"], ""),
    "natureza_juridica": (["cod_natureza"], ""),
    "pais": (["cod_pais"], ""),
    "qualificacao_socio": (["cod_qualificacao"], ""),
    "empresa": (["cnpj_basico"], ""),
    "estabelecimento": (["cnpj_basico", "cnpj_ordem", "cnpj_dv"], ""),
    "simples": (["cnpj_basico"], ""),
    "socio": (["cnpj_basico", "identificador_socio", "cnpj_cpf_socio",
               "cod_qualificacao_socio"], "|"),
    "estabelecimento_cnae_sec": (["cnpj_basico", "cnpj_ordem", "cnpj_dv",
                                  "cod_cnae"], "-"),
}


def _lake_schema(table: str) -> pa.Schema:
    """Lake payload schema: doc_id first, then the source columns typed —
    date columns land as date32 (normalize_dates output), capital_social
    as float64 (post-BR-normalize cast); everything else string, matching
    the reference's VARCHAR/TEXT declarations."""
    dates = set(DATE_COLUMNS.get(table, []))
    fields = [pa.field("doc_id", pa.string())]
    for col in SOURCE_COLUMNS[table]:
        if col in dates:
            fields.append(pa.field(col, pa.date32()))
        elif table == "empresa" and col == "capital_social":
            fields.append(pa.field(col, pa.float64()))
        else:
            fields.append(pa.field(col, pa.string()))
    return pa.schema(fields)


#: routing stems per reference schema.py source_file_stem entries
_STEMS: dict[str, tuple[str, ...]] = {
    "cnae": ("cnaes",),
    "motivo": ("motivos",),
    "municipio": ("municipios",),
    "natureza_juridica": ("naturezas",),
    "pais": ("paises",),
    "qualificacao_socio": ("qualificacoes",),
    "empresa": ("empresas",),
    "estabelecimento": ("estabelecimentos",),
    "simples": ("simples",),
    "socio": ("socios",),
    "estabelecimento_cnae_sec": ("estabelecimentos",),
}

#: which table's SOURCE_COLUMNS to parse the raw file with (cnae_sec is
#: carved out of the estabelecimento source rows)
SOURCE_TABLE: dict[str, str] = {
    name: ("estabelecimento" if name == "estabelecimento_cnae_sec" else name)
    for name in SOURCE_COLUMNS
}

CNPJ_REGISTRY: dict[str, TableSpec] = {
    name: TableSpec(
        name=name,
        schema=_lake_schema(name),
        key=("doc_id",),
        source_file_stems=_STEMS[name],
    )
    for name in SOURCE_COLUMNS
}


# ---------------------------------------------------------------------------
# per-table batch preparers (vectorized; run inside map_batches)
# ---------------------------------------------------------------------------

def _concat_cols(batch: pa.Table, cols: list[str], sep: str) -> pa.Array:
    arrs = [batch.column(c) for c in cols]
    if len(arrs) == 1:
        return arrs[0]
    return pc.binary_join_element_wise(
        *arrs, sep, null_handling="replace", null_replacement=""
    )


def prepare_batch(batch: pa.Table, table: str) -> pa.Table:
    """Raw parsed CSV rows (all-string, source column order) → lake rows:
    the reference transform chain, then doc_id derivation, then a conform
    cast to the lake schema. Pure Arrow kernels throughout."""
    spec = CNPJ_REGISTRY[table]
    if table == "estabelecimento_cnae_sec":
        batch = sanitize_cells(batch)
        batch = explode_delimited(
            batch,
            key_columns=["cnpj_basico", "cnpj_ordem", "cnpj_dv"],
            list_column="cod_cnae_secundario",
            out_column="cod_cnae",
        )
    else:
        batch = CHAINS[table](batch)
        if table == "empresa":
            # post-normalize "1234.56" strings → typed numeric column
            idx = batch.schema.get_field_index("capital_social")
            batch = batch.set_column(
                idx, pa.field("capital_social", pa.float64()),
                pc.cast(batch.column(idx), pa.float64()),
            )
    if table == "estabelecimento_cnae_sec":
        # full 14-digit CNPJ + '-' + cod_cnae
        full = _concat_cols(batch, ["cnpj_basico", "cnpj_ordem", "cnpj_dv"], "")
        doc_id = pc.binary_join_element_wise(full, batch.column("cod_cnae"), "-")
    else:
        cols, sep = DOC_ID_COLUMNS[table]
        doc_id = _concat_cols(batch, cols, sep)
    batch = batch.add_column(0, pa.field("doc_id", pa.string()), doc_id)
    return conform_table(batch, spec.schema)


def make_preparer(table: str):
    def prepare(batch: pa.Table) -> pa.Table:
        return prepare_batch(batch, table)

    prepare.__name__ = f"prepare_{table}"
    return prepare


# ---------------------------------------------------------------------------
# the load pipeline (reference orchestrator load phase, Ray-Data-first)
# ---------------------------------------------------------------------------

def load_cnpj_files(
    zip_paths: list[str],
    lake_dir,
    cfg=None,
    overwrite: bool = False,
) -> dict[str, dict]:
    """Full load of CNPJ zip archives into lake tables.

    Routes each archive by filename stem (S6, multi-target), parses the
    zipped headerless latin-1 CSVs in-memory (S5), applies the table's
    transform chain vectorized, and commits each target table as an
    epoch-0 distributed init. A file routed to several tables (the
    Estabelecimentos case) is parsed once per target — stateless re-read
    beats materializing a fork, and the OS page cache absorbs the second
    pass; at 100 TB the archives would be split across nodes and each
    target's pass streams independently.

    Returns {table: commit_record}.
    """
    import shutil
    from pathlib import Path

    from rfb_cnpj_etl_ray.config import EngineConfig
    from rfb_cnpj_etl_ray.pipelines.ingest import init_lake_from_dataset
    from rfb_cnpj_etl_ray.sources.csv_source import read_zip_csv, route_targets

    cfg = cfg or EngineConfig()
    by_table: dict[str, list[str]] = {}
    for p in zip_paths:
        for t in route_targets(Path(p).name, CNPJ_REGISTRY):
            by_table.setdefault(t, []).append(str(p))
    out = {}
    for table, paths in sorted(by_table.items()):
        if overwrite:
            shutil.rmtree(Path(lake_dir) / table, ignore_errors=True)
        raw = read_zip_csv(sorted(paths), SOURCE_COLUMNS[SOURCE_TABLE[table]])
        prepared = raw.map_batches(
            make_preparer(table), batch_format="pyarrow", zero_copy_batch=True
        )
        out[table] = init_lake_from_dataset(
            lake_dir, CNPJ_REGISTRY[table], prepared, cfg=cfg
        )
    return out


# ---------------------------------------------------------------------------
# deterministic fixture: CNPJ-shaped zip archives synthesized from the
# driver's parquet tables (so DuckDB can reproduce the load output in SQL)
# ---------------------------------------------------------------------------

def _br_money(values) -> "pd.Series":
    """Vectorized 1234.56 → '1.234,56' (the raw format Empresas CSVs
    carry; normalize_numeric_br inverts it exactly)."""
    import pandas as pd

    s = pd.Series(values).abs().map(lambda x: f"{x:,.2f}")
    return s.str.replace(",", "@").str.replace(".", ",").str.replace("@", ".")


def synth_cnpj_fixture(sf_dir: str, out_dir) -> list[str]:
    """Write Empresas0.zip / Estabelecimentos0.zip / Paises.zip shaped
    exactly like the reference's inputs (headerless latin-1 ';' CSV in a
    zip), derived deterministically from supplier / customer / nation so
    the lake contents are SQL-reproducible. Fixture generator — driver
    side on purpose (bounded by the dimension-scale source tables)."""
    import io
    import zipfile
    from pathlib import Path

    import pandas as pd
    import pyarrow.parquet as pq

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    def z(series, width):
        return series.astype(str).str.zfill(width)

    def write_zip(name: str, member: str, df: pd.DataFrame) -> str:
        buf = io.StringIO()
        df.to_csv(buf, sep=";", header=False, index=False, lineterminator="\n")
        path = out / name
        with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
            zf.writestr(member, buf.getvalue().encode("latin-1"))
        return str(path)

    paths = []

    # Empresas ← supplier
    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name", "s_acctbal"],
    ).to_pandas()
    k = sup["s_suppkey"]
    emp = pd.DataFrame({
        "cnpj_basico": z(k, 8),
        "razao_social": sup["s_name"],
        "cod_natureza_juridica": "2062",
        "cod_qualificacao_responsavel": "49",
        "capital_social": _br_money(sup["s_acctbal"]),
        "cod_porte": "05",
        "ente_federativo_responsavel": "",
    })
    paths.append(write_zip("Empresas0.zip", "EMPRECSV", emp))

    # Estabelecimentos ← customer (multi-target: estabelecimento + cnae_sec)
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey"],
    ).to_pandas()
    k = cust["c_custkey"]
    n = cust["c_nationkey"].astype("int64")
    a = z(k % 97, 7)
    b = z(k % 97 + 100, 7)
    sec = pd.Series("", index=k.index, dtype="object")
    sec = sec.mask((k % 3 != 0) & (k % 2 == 0), a)
    sec = sec.mask((k % 3 != 0) & (k % 2 != 0), a + ", " + b)
    est = pd.DataFrame({
        "cnpj_basico": z(k, 8),
        "cnpj_ordem": "0001",
        "cnpj_dv": z(k % 100, 2),
        "matriz_filial": "1",
        "nome_fantasia": " " + cust["c_name"] + "  ",  # M1 strips this
        "cod_situacao_cadastral": "02",
        "data_situacao_cadastral": pd.Series("20200115", index=k.index)
            .mask(k % 7 == 0, "00000000"),  # sentinel → NULL (M4)
        "cod_motivo_situacao_cadastral": "00",
        "nome_cidade_exterior": "",
        "cod_pais": z(n, 3),
        "data_inicio_atividade": "19990322",
        "cod_cnae_principal": z(n * 281 + 11, 7),
        "cod_cnae_secundario": sec,
        "tipo_logradouro": "RUA",
        "logradouro": "LOGRADOURO " + k.astype(str),
        "numero": (k % 1000).astype(str),
        "complemento": "",
        "bairro": "CENTRO",
        "cep": z(k, 8),
        "uf": "SP",
        "cod_municipio": z(n * 37 + 1, 4),
        "ddd_telefone_1": "", "telefone_1": "",
        "ddd_telefone_2": "", "telefone_2": "",
        "ddd_fax": "", "fax": "", "email": "",
        "situacao_especial": "",
        "data_situacao_especial": "00000000",  # sentinel → NULL
    })
    paths.append(write_zip("Estabelecimentos0.zip", "ESTABELE", est))

    # Paises ← nation (dimension load)
    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    pais = pd.DataFrame({
        "cod_pais": z(nat["n_nationkey"].astype("int64"), 3),
        "nome_pais": nat["n_name"],
    })
    paths.append(write_zip("Paises.zip", "PAISCSV", pais))
    return paths


def _ensure_cnpj_lake(sf_dir: str):
    """Build (once per sf_dir, cached) the fixture zips and run the full
    multi-table load; return the lake path."""
    import os
    import shutil
    from pathlib import Path

    from rfb_cnpj_etl_ray.config import EngineConfig

    root = (Path(os.environ.get("GRAFT_TMP", "/tmp")) / "rfb_cnpj_etl_ray"
            / f"cnpj_{Path(sf_dir).name}")
    marker = root / "_LOADED"
    want = ",".join(sorted(CNPJ_REGISTRY))  # stale caches rebuild
    if not marker.exists() or marker.read_text() != want:
        shutil.rmtree(root, ignore_errors=True)
        zips = synth_cnpj_fixture_full(sf_dir, root / "zips")
        load_cnpj_files(zips, root / "lake",
                        cfg=EngineConfig(num_partitions=8))
        marker.write_text(want)
    return root / "lake"


def _dates_to_iso(ds, columns: list[str]):
    """date32 → 'YYYY-MM-DD' strings for engine-neutral value compare."""
    def cast(batch: pa.Table) -> pa.Table:
        for c in columns:
            idx = batch.schema.get_field_index(c)
            iso = pc.strftime(pc.cast(batch.column(idx), pa.timestamp("s")),
                              "%Y-%m-%d")
            batch = batch.set_column(idx, pa.field(c, pa.string()), iso)
        return batch

    return ds.map_batches(cast, batch_format="pyarrow", zero_copy_batch=True)


def cnpj_empresa_load(sf_dir: str):
    """Empresas zip → empresa lake table (S5+S6+M1+M3: BR-numeric
    capital_social lands as float64)."""
    from rfb_cnpj_etl_ray.pipelines.ingest import read_lake

    return read_lake(_ensure_cnpj_lake(sf_dir), "empresa")


def cnpj_estabelecimento_load(sf_dir: str):
    """Estabelecimentos zip → estabelecimento lake table (M1 sanitize,
    M4 dates with sentinel → NULL); dates emitted ISO for the oracle."""
    from rfb_cnpj_etl_ray.pipelines.ingest import read_lake

    ds = read_lake(_ensure_cnpj_lake(sf_dir), "estabelecimento")
    return _dates_to_iso(ds, DATE_COLUMNS["estabelecimento"])


def cnpj_cnae_sec_explode(sf_dir: str):
    """Same source file, second routing target: the F1 delimited explode
    into estabelecimento_cnae_sec child rows."""
    from rfb_cnpj_etl_ray.pipelines.ingest import read_lake

    return read_lake(_ensure_cnpj_lake(sf_dir), "estabelecimento_cnae_sec")


def cnpj_pais_dim_load(sf_dir: str):
    """Paises zip → pais dimension table."""
    from rfb_cnpj_etl_ray.pipelines.ingest import read_lake

    return read_lake(_ensure_cnpj_lake(sf_dir), "pais")


CNPJ_EMPRESA_SQL = """
SELECT lpad(CAST(s_suppkey AS VARCHAR),8,'0') AS doc_id,
       lpad(CAST(s_suppkey AS VARCHAR),8,'0') AS cnpj_basico,
       s_name AS razao_social,
       '2062' AS cod_natureza_juridica,
       '49' AS cod_qualificacao_responsavel,
       ABS(s_acctbal) AS capital_social,
       '05' AS cod_porte,
       '' AS ente_federativo_responsavel
FROM supplier
"""

CNPJ_ESTABELECIMENTO_SQL = """
SELECT
 lpad(CAST(c_custkey AS VARCHAR),8,'0') || '0001'
   || lpad(CAST(c_custkey % 100 AS VARCHAR),2,'0') AS doc_id,
 lpad(CAST(c_custkey AS VARCHAR),8,'0') AS cnpj_basico,
 '0001' AS cnpj_ordem,
 lpad(CAST(c_custkey % 100 AS VARCHAR),2,'0') AS cnpj_dv,
 '1' AS matriz_filial,
 c_name AS nome_fantasia,
 '02' AS cod_situacao_cadastral,
 CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE '2020-01-15' END
   AS data_situacao_cadastral,
 '00' AS cod_motivo_situacao_cadastral,
 '' AS nome_cidade_exterior,
 lpad(CAST(c_nationkey AS VARCHAR),3,'0') AS cod_pais,
 '1999-03-22' AS data_inicio_atividade,
 lpad(CAST(c_nationkey * 281 + 11 AS VARCHAR),7,'0') AS cod_cnae_principal,
 CASE WHEN c_custkey % 3 = 0 THEN ''
      WHEN c_custkey % 2 = 0 THEN lpad(CAST(c_custkey % 97 AS VARCHAR),7,'0')
      ELSE lpad(CAST(c_custkey % 97 AS VARCHAR),7,'0') || ', '
           || lpad(CAST(c_custkey % 97 + 100 AS VARCHAR),7,'0')
 END AS cod_cnae_secundario,
 'RUA' AS tipo_logradouro,
 'LOGRADOURO ' || CAST(c_custkey AS VARCHAR) AS logradouro,
 CAST(c_custkey % 1000 AS VARCHAR) AS numero,
 '' AS complemento,
 'CENTRO' AS bairro,
 lpad(CAST(c_custkey AS VARCHAR),8,'0') AS cep,
 'SP' AS uf,
 lpad(CAST(c_nationkey * 37 + 1 AS VARCHAR),4,'0') AS cod_municipio,
 '' AS ddd_telefone_1, '' AS telefone_1,
 '' AS ddd_telefone_2, '' AS telefone_2,
 '' AS ddd_fax, '' AS fax, '' AS email,
 '' AS situacao_especial,
 CAST(NULL AS VARCHAR) AS data_situacao_especial
FROM customer
"""

CNPJ_CNAE_SEC_SQL = """
WITH src AS (
  SELECT lpad(CAST(c_custkey AS VARCHAR),8,'0') AS b,
         '0001' AS o,
         lpad(CAST(c_custkey % 100 AS VARCHAR),2,'0') AS d,
         CASE WHEN c_custkey % 3 = 0 THEN ''
              WHEN c_custkey % 2 = 0
                THEN lpad(CAST(c_custkey % 97 AS VARCHAR),7,'0')
              ELSE lpad(CAST(c_custkey % 97 AS VARCHAR),7,'0') || ','
                   || lpad(CAST(c_custkey % 97 + 100 AS VARCHAR),7,'0')
         END AS sec
  FROM customer
), ex AS (
  SELECT b, o, d, trim(unnest(string_split(sec, ','))) AS cod_cnae FROM src
)
SELECT b || o || d || '-' || cod_cnae AS doc_id,
       b AS cnpj_basico, o AS cnpj_ordem, d AS cnpj_dv, cod_cnae
FROM ex WHERE cod_cnae <> ''
"""

CNPJ_PAIS_SQL = """
SELECT lpad(CAST(n_nationkey AS VARCHAR),3,'0') AS doc_id,
       lpad(CAST(n_nationkey AS VARCHAR),3,'0') AS cod_pais,
       n_name AS nome_pais
FROM nation
"""


# ---------------------------------------------------------------------------
# full-registry fixture: the remaining 7 tables (simples, socio + 5 dims)
# ---------------------------------------------------------------------------

def synth_cnpj_fixture_full(sf_dir: str, out_dir) -> list[str]:
    """All 11 registry tables: the three archives of
    :func:`synth_cnpj_fixture` plus Simples (← orders: real calendar
    dates through M4, all three NULL sentinels exercised), Socios (←
    customer: composite doc_id key) and the five remaining dimension
    archives (← part/region/nation)."""
    import io
    import zipfile
    from pathlib import Path

    import pandas as pd
    import pyarrow.parquet as pq

    out = Path(out_dir)
    paths = synth_cnpj_fixture(sf_dir, out)

    def z(series, width):
        return series.astype(str).str.zfill(width)

    def write_zip(name: str, member: str, df: pd.DataFrame) -> str:
        buf = io.StringIO()
        df.to_csv(buf, sep=";", header=False, index=False, lineterminator="\n")
        path = out / name
        with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
            zf.writestr(member, buf.getvalue().encode("latin-1"))
        return str(path)

    # Simples ← orders (one row per order; real dates through M4)
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).to_pandas()
    k = orders["o_orderkey"]
    simples = pd.DataFrame({
        "cnpj_basico": z(k, 8),
        "opcao_simples": pd.Series("N", index=k.index).mask(k % 2 == 1, "S"),
        "data_opcao_simples": orders["o_orderdate"].dt.strftime("%Y%m%d"),
        "data_exclusao_simples": pd.Series("20230401", index=k.index)
            .mask(k % 5 == 0, "00000000"),   # sentinel → NULL
        "opcao_mei": "N",
        "data_opcao_mei": "0",               # '0' sentinel → NULL
        "data_exclusao_mei": "",             # '' sentinel → NULL
    })
    paths.append(write_zip("Simples.zip", "SIMPLES", simples))

    # Socios ← customer (composite doc_id: basico|ident|cpf|qualif)
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey"],
    ).to_pandas()
    k = cust["c_custkey"]
    n = cust["c_nationkey"].astype("int64")
    socio = pd.DataFrame({
        "cnpj_basico": z(k, 8),
        "identificador_socio": (k % 3 + 1).astype(str),
        "nome_socio": "SOCIO " + cust["c_name"],
        "cnpj_cpf_socio": z(k, 11),
        "cod_qualificacao_socio": z(k % 49 + 1, 2),
        "data_entrada_sociedade": "20100705",
        "cod_pais": z(n, 3),
        "cpf_representante_legal": z(k % 1000, 11),
        "nome_representante_legal": "",
        "cod_qualificacao_representante_legal": "00",
        "cod_faixa_etaria": (k % 9 + 1).astype(str),
    })
    paths.append(write_zip("Socios0.zip", "SOCIOCSV", socio))

    # remaining dimensions
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"]).to_pandas()
    paths.append(write_zip("Cnaes.zip", "CNAECSV", pd.DataFrame({
        "cod_cnae": z(part["p_partkey"], 7),
        "nome_cnae": part["p_type"],
    })))
    region = pq.read_table(f"{sf_dir}/region.parquet",
                           columns=["r_regionkey", "r_name"]).to_pandas()
    paths.append(write_zip("Motivos.zip", "MOTICSV", pd.DataFrame({
        "cod_motivo": z(region["r_regionkey"], 2),
        "nome_motivo": region["r_name"],
    })))
    paths.append(write_zip("Naturezas.zip", "NATJUCSV", pd.DataFrame({
        "cod_natureza": z(region["r_regionkey"], 4),
        "nome_natureza": "NATUREZA " + region["r_name"],
    })))
    paths.append(write_zip("Qualificacoes.zip", "QUALSCSV", pd.DataFrame({
        "cod_qualificacao": z(region["r_regionkey"], 2),
        "nome_qualificacao": "QUALIF " + region["r_name"],
    })))
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"]).to_pandas()
    paths.append(write_zip("Municipios.zip", "MUNICCSV", pd.DataFrame({
        "cod_municipio": z(nation["n_nationkey"].astype("int64"), 4),
        "nome_municipio": "CIDADE " + nation["n_name"],
    })))
    return paths


def _cnpj_table_query(table: str):
    """Query factory: committed lake table contents (dates ISO-strung
    for the engine-neutral value compare)."""
    def q(sf_dir: str):
        from rfb_cnpj_etl_ray.pipelines.ingest import read_lake

        ds = read_lake(_ensure_cnpj_lake(sf_dir), table)
        dates = DATE_COLUMNS.get(table)
        return _dates_to_iso(ds, dates) if dates else ds

    q.__name__ = f"cnpj_{table}_load"
    return q


cnpj_simples_load = _cnpj_table_query("simples")
cnpj_socio_load = _cnpj_table_query("socio")
cnpj_cnae_dim_load = _cnpj_table_query("cnae")
cnpj_motivo_dim_load = _cnpj_table_query("motivo")
cnpj_municipio_dim_load = _cnpj_table_query("municipio")
cnpj_natureza_dim_load = _cnpj_table_query("natureza_juridica")
cnpj_qualificacao_dim_load = _cnpj_table_query("qualificacao_socio")


CNPJ_SIMPLES_SQL = """
SELECT lpad(CAST(o_orderkey AS VARCHAR),8,'0') AS doc_id,
       lpad(CAST(o_orderkey AS VARCHAR),8,'0') AS cnpj_basico,
       CASE WHEN o_orderkey % 2 = 1 THEN 'S' ELSE 'N' END AS opcao_simples,
       strftime(o_orderdate, '%Y-%m-%d') AS data_opcao_simples,
       CASE WHEN o_orderkey % 5 = 0 THEN NULL
            ELSE '2023-04-01' END AS data_exclusao_simples,
       'N' AS opcao_mei,
       CAST(NULL AS VARCHAR) AS data_opcao_mei,
       CAST(NULL AS VARCHAR) AS data_exclusao_mei
FROM orders
"""

CNPJ_SOCIO_SQL = """
SELECT lpad(CAST(c_custkey AS VARCHAR),8,'0') || '|'
         || CAST(c_custkey % 3 + 1 AS VARCHAR) || '|'
         || lpad(CAST(c_custkey AS VARCHAR),11,'0') || '|'
         || lpad(CAST(c_custkey % 49 + 1 AS VARCHAR),2,'0') AS doc_id,
       lpad(CAST(c_custkey AS VARCHAR),8,'0') AS cnpj_basico,
       CAST(c_custkey % 3 + 1 AS VARCHAR) AS identificador_socio,
       'SOCIO ' || c_name AS nome_socio,
       lpad(CAST(c_custkey AS VARCHAR),11,'0') AS cnpj_cpf_socio,
       lpad(CAST(c_custkey % 49 + 1 AS VARCHAR),2,'0')
         AS cod_qualificacao_socio,
       '2010-07-05' AS data_entrada_sociedade,
       lpad(CAST(c_nationkey AS VARCHAR),3,'0') AS cod_pais,
       lpad(CAST(c_custkey % 1000 AS VARCHAR),11,'0')
         AS cpf_representante_legal,
       '' AS nome_representante_legal,
       '00' AS cod_qualificacao_representante_legal,
       CAST(c_custkey % 9 + 1 AS VARCHAR) AS cod_faixa_etaria
FROM customer
"""

CNPJ_CNAE_SQL = """
SELECT lpad(CAST(p_partkey AS VARCHAR),7,'0') AS doc_id,
       lpad(CAST(p_partkey AS VARCHAR),7,'0') AS cod_cnae,
       p_type AS nome_cnae
FROM part
"""

CNPJ_MOTIVO_SQL = """
SELECT lpad(CAST(r_regionkey AS VARCHAR),2,'0') AS doc_id,
       lpad(CAST(r_regionkey AS VARCHAR),2,'0') AS cod_motivo,
       r_name AS nome_motivo
FROM region
"""

CNPJ_NATUREZA_SQL = """
SELECT lpad(CAST(r_regionkey AS VARCHAR),4,'0') AS doc_id,
       lpad(CAST(r_regionkey AS VARCHAR),4,'0') AS cod_natureza,
       'NATUREZA ' || r_name AS nome_natureza
FROM region
"""

CNPJ_QUALIFICACAO_SQL = """
SELECT lpad(CAST(r_regionkey AS VARCHAR),2,'0') AS doc_id,
       lpad(CAST(r_regionkey AS VARCHAR),2,'0') AS cod_qualificacao,
       'QUALIF ' || r_name AS nome_qualificacao
FROM region
"""

CNPJ_MUNICIPIO_SQL = """
SELECT lpad(CAST(n_nationkey AS VARCHAR),4,'0') AS doc_id,
       lpad(CAST(n_nationkey AS VARCHAR),4,'0') AS cod_municipio,
       'CIDADE ' || n_name AS nome_municipio
FROM nation
"""

"""The 10-table CNPJ registry end-to-end: fixture zips → routed
multi-target load → lake tables matching the DuckDB oracle exactly
(the driver's comparison, run locally at sf0.001)."""

import pyarrow as pa
import pytest

from rfb_cnpj_etl_ray import cnpj as C
from rfb_cnpj_etl_ray.config import EngineConfig
from rfb_cnpj_etl_ray.sources.csv_source import route_targets
from tests.util_compare import assert_query_matches

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True, scope="module")
def _isolated_cache(tmp_path_factory):
    # _ensure_cnpj_lake caches under GRAFT_TMP; one shared lake for the
    # whole module (the load runs once, every oracle check reuses it)
    import os

    prev = os.environ.get("GRAFT_TMP")
    os.environ["GRAFT_TMP"] = str(tmp_path_factory.mktemp("cnpj_cache"))
    yield
    if prev is None:
        os.environ.pop("GRAFT_TMP", None)
    else:
        os.environ["GRAFT_TMP"] = prev


def test_registry_covers_all_reference_tables():
    assert set(C.CNPJ_REGISTRY) == {
        "cnae", "motivo", "municipio", "natureza_juridica", "pais",
        "qualificacao_socio", "empresa", "estabelecimento", "simples",
        "socio", "estabelecimento_cnae_sec",
    }
    # multi-target routing: one Estabelecimentos zip feeds two tables
    assert sorted(route_targets("Estabelecimentos3.zip", C.CNPJ_REGISTRY)) == \
        ["estabelecimento", "estabelecimento_cnae_sec"]
    assert route_targets("Empresas0.zip", C.CNPJ_REGISTRY) == ["empresa"]
    # per-reference chains: empresa numeric, estabelecimento 3 dates
    assert C.CHAINS["empresa"].numeric_br == ["capital_social"]
    assert len(C.CHAINS["estabelecimento"].date_columns) == 3
    assert len(C.CHAINS["simples"].date_columns) == 4


def test_cnpj_empresa_matches_oracle(ray_session):
    assert_query_matches(C.cnpj_empresa_load, C.CNPJ_EMPRESA_SQL, SF_DIR)


def test_cnpj_estabelecimento_matches_oracle(ray_session):
    assert_query_matches(
        C.cnpj_estabelecimento_load, C.CNPJ_ESTABELECIMENTO_SQL, SF_DIR
    )


def test_cnpj_cnae_sec_matches_oracle(ray_session):
    assert_query_matches(C.cnpj_cnae_sec_explode, C.CNPJ_CNAE_SEC_SQL, SF_DIR)


def test_cnpj_pais_matches_oracle(ray_session):
    assert_query_matches(C.cnpj_pais_dim_load, C.CNPJ_PAIS_SQL, SF_DIR)


def test_cnpj_incremental_update_after_load(ray_session, tmp_path,
                                            monkeypatch):
    """The loaded empresa table is a normal CDC table: a change segment
    (capital update + delete) applies through the standard ingest path.
    (Own cache dir: this test mutates the lake.)"""
    import json

    import pyarrow.parquet as pq

    from rfb_cnpj_etl_ray.pipelines.ingest import ingest, read_lake_table

    monkeypatch.setenv("GRAFT_TMP", str(tmp_path))
    lake = C._ensure_cnpj_lake(SF_DIR)
    before = read_lake_table(lake, "empresa")
    assert before.num_rows > 0
    doc0 = before.column("doc_id")[0].as_py()
    doc1 = before.column("doc_id")[1].as_py()
    spec = C.CNPJ_REGISTRY["empresa"]
    events = pa.Table.from_pylist(
        [
            {"lsn": 1, "op": "U", "doc_id": doc0, "cnpj_basico": doc0,
             "razao_social": "NOVA RAZAO LTDA", "capital_social": 999.5},
            {"lsn": 2, "op": "D", "doc_id": doc1},
        ],
        schema=spec.change_schema(),
    )
    log_dir = tmp_path / "emp_log"
    log_dir.mkdir()
    pq.write_table(events, log_dir / "seg-0.parquet")
    (log_dir / "manifest.json").write_text(json.dumps({
        "segments": [{"name": "seg-0.parquet", "rows": 2,
                      "min_lsn": 1, "max_lsn": 2,
                      "bytes": (log_dir / "seg-0.parquet").stat().st_size}],
    }))
    ingest(lake, log_dir, table="empresa",
           cfg=EngineConfig(num_partitions=8))
    after = read_lake_table(lake, "empresa")
    assert after.num_rows == before.num_rows - 1
    row = after.filter(
        pa.compute.equal(after["doc_id"], doc0)).to_pylist()[0]
    assert row["razao_social"] == "NOVA RAZAO LTDA"
    assert row["capital_social"] == 999.5
    assert doc1 not in set(after["doc_id"].to_pylist())


def test_load_refuses_overwrite_without_flag(ray_session, tmp_path):
    zips = C.synth_cnpj_fixture(SF_DIR, tmp_path / "zips")
    pais_zip = [z for z in zips if "Paises" in z]
    C.load_cnpj_files(pais_zip, tmp_path / "lake",
                      cfg=EngineConfig(num_partitions=2))
    with pytest.raises(RuntimeError, match="already initialized"):
        C.load_cnpj_files(pais_zip, tmp_path / "lake",
                          cfg=EngineConfig(num_partitions=2))
    # explicit full reload (the reference's monthly drop-and-reload)
    C.load_cnpj_files(pais_zip, tmp_path / "lake",
                      cfg=EngineConfig(num_partitions=2), overwrite=True)


@pytest.mark.parametrize("table,sql", [
    ("simples", "CNPJ_SIMPLES_SQL"),
    ("socio", "CNPJ_SOCIO_SQL"),
    ("cnae", "CNPJ_CNAE_SQL"),
    ("motivo", "CNPJ_MOTIVO_SQL"),
    ("municipio", "CNPJ_MUNICIPIO_SQL"),
    ("natureza_juridica", "CNPJ_NATUREZA_SQL"),
    ("qualificacao_socio", "CNPJ_QUALIFICACAO_SQL"),
])
def test_cnpj_full_registry_matches_oracle(ray_session, table, sql):
    """The remaining 7 registry tables, loaded from their own fixture
    archives through the same routed pipeline, each against its oracle
    (simples additionally exercises all three date NULL sentinels and
    real calendar dates through M4)."""
    assert_query_matches(C._cnpj_table_query(table), getattr(C, sql), SF_DIR)


def test_cnpj_estabelecimento_report_matches_oracle(ray_session):
    """The reference flagship analytical query (query_sqlite.md:11-79):
    est⋈empresa + LEFT JOINs + two GROUP_CONCATs + CASE/COALESCE +
    predicates + ORDER BY/LIMIT, vs the composed DuckDB oracle."""
    assert_query_matches(
        C.cnpj_estabelecimento_report, C.CNPJ_REPORT_SQL, SF_DIR
    )


def test_cnpj_report_nonempty(ray_session):
    t = C.cnpj_estabelecimento_report(SF_DIR)
    assert t.num_rows >= 1
    assert "Razão Social" in t.schema.names


def test_cli_complete_fetch_load_validate(ray_session, tmp_path):
    """The reference's `complete` command analog: resumable fetch (File
    transport) + full multi-table load + per-table validation, one CLI
    call; re-run short-circuits on both fetch and load."""
    import json as _json

    from rfb_cnpj_etl_ray.cli import main as cli_main

    zips_dir = tmp_path / "remote"
    C.synth_cnpj_fixture(SF_DIR, zips_dir)
    lake = tmp_path / "lake"
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(["complete", str(zips_dir), str(lake)])
    assert rc in (0, None)
    out = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert set(out["fetched"]) == {"Empresas0.zip", "Estabelecimentos0.zip",
                                   "Paises.zip"}
    assert out["tables"]["empresa"] > 0
    assert out["tables"]["estabelecimento"] > 0
    assert all(out["validated"].values())

    # reference flag parity (main.py:71-83): --clean re-downloads,
    # --workers caps fetch concurrency, --low-memory shrinks batches,
    # --skip-validation drops the gate, --skip-index is accepted
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main([
            "complete", str(zips_dir), str(tmp_path / "lake2"),
            "--clean", "--workers", "2", "--low-memory",
            "--skip-validation", "--skip-index",
        ])
    assert rc in (0, None)
    out2 = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out2["tables"] == out["tables"]
    assert "validated" not in out2

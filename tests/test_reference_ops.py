"""F4 `cnpj_mini` fixtures: reference-shaped dirty tables exercising the
M1-M5 sanitizers and P1-P6/P8 patch operators with the exact anomalies
documented in db_transformers.py / db_patch.py / docs/normalizacao.md."""

import datetime

import pyarrow as pa
import pytest

from rfb_cnpj_etl_ray.stages.patch import (
    anti_join_delete,
    dedup_best_record,
    default_fill,
    null_out_value,
    referential_violations,
    upsert_if_absent,
    zero_pad,
)
from rfb_cnpj_etl_ray.stages.sanitize import (
    TransformChain,
    explode_delimited,
    normalize_dates,
    normalize_numeric_br,
    sanitize_cells,
)


@pytest.fixture()
def empresa():
    return pa.table(
        {
            "cnpj_basico": ["111", "111", "222", "333", "444"],
            # duplicate key 111: one empty razao_social -> dedup keeps the
            # non-empty one (db_patch.py:60-87); NUL + padding dirt (M1)
            "razao_social": ["", "ACME\x00 LTDA ", " Beta SA", "", "Gamma"],
            "capital_social": ["1.234,56", "1.234,56", "1000", "0,50", "x,y"],
            "cod_porte": ["", "03", "05", "", "01"],
        }
    )


@pytest.fixture()
def estabelecimento():
    return pa.table(
        {
            "cnpj_basico": ["111", "222", "333"],
            "cnpj_ordem": ["0001", "0001", "0002"],
            "data_situacao_cadastral": ["20230115", "00000000", "20231301"],
            "data_inicio_atividade": ["19991231", "0", " "],
            "cod_pais": ["0", "32", "105"],
            "cod_cnae_secundario": ["4721102,4729699", "", " 111 ,, 222,"],
        }
    )


def test_m1_sanitize_cells(empresa):
    out = sanitize_cells(empresa)
    assert out.column("razao_social").to_pylist()[1] == "ACME LTDA"
    assert out.column("razao_social").to_pylist()[2] == "Beta SA"


def test_m3_numeric_br(empresa):
    out = normalize_numeric_br(empresa, ["capital_social"])
    vals = out.column("capital_social").to_pylist()
    assert vals[0] == "1234.56"      # converted
    assert vals[2] == "1000"         # no comma -> untouched
    assert vals[3] == "0.50"         # converted
    assert vals[4] == "x,y"          # non-digits -> untouched (ref guard)


def test_m4_dates(estabelecimento):
    out = normalize_dates(estabelecimento)
    sit = out.column("data_situacao_cadastral").to_pylist()
    assert sit[0] == datetime.date(2023, 1, 15)
    assert sit[1] is None            # "00000000" sentinel
    assert sit[2] is None            # month 13 -> unparseable -> null
    ini = out.column("data_inicio_atividade").to_pylist()
    assert ini == [datetime.date(1999, 12, 31), None, None]
    assert out.schema.field("data_situacao_cadastral").type == pa.date32()


def test_m5_chain(empresa):
    chain = TransformChain(numeric_br=["capital_social"])
    out = chain(empresa)
    assert out.column("capital_social").to_pylist()[0] == "1234.56"
    assert out.column("razao_social").to_pylist()[1] == "ACME LTDA"


def test_f1_explode(estabelecimento):
    child = explode_delimited(
        estabelecimento, ["cnpj_basico", "cnpj_ordem"],
        "cod_cnae_secundario", ",", out_column="cod_cnae",
    )
    rows = list(zip(child.column("cnpj_basico").to_pylist(),
                    child.column("cod_cnae").to_pylist()))
    # empties and blank items dropped, values stripped
    assert rows == [("111", "4721102"), ("111", "4729699"),
                    ("333", "111"), ("333", "222")]


def test_p1_upsert_if_absent():
    dim = pa.table({"code": ["1", "2"], "name": ["a", "b"]})
    add = pa.table({"code": ["2", "3", "3"], "name": ["B", "c", "c2"]})
    out = upsert_if_absent(dim, add, "code")
    assert out.column("code").to_pylist() == ["1", "2", "3"]
    assert out.column("name").to_pylist() == ["a", "b", "c"]  # first wins


def test_p2_dedup_best_record(empresa):
    clean = sanitize_cells(empresa)
    out = dedup_best_record(clean, "cnpj_basico", "razao_social")
    by = dict(zip(out.column("cnpj_basico").to_pylist(),
                  out.column("razao_social").to_pylist()))
    assert by["111"] == "ACME LTDA"  # non-empty beats empty
    assert len(by) == 4
    # tie on quality (both empty / both non-empty) -> first physical row
    t = pa.table({"k": ["x", "x"], "q": ["", ""], "v": [1, 2]})
    assert dedup_best_record(t, "k", "q").column("v").to_pylist() == [1]


def test_p3_p4_p5(estabelecimento, empresa):
    out = null_out_value(estabelecimento, "cod_pais", "0")
    assert out.column("cod_pais").to_pylist() == [None, "32", "105"]
    out = zero_pad(out, "cod_pais", 3)
    assert out.column("cod_pais").to_pylist() == [None, "032", "105"]
    out2 = default_fill(empresa, "cod_porte", "00")
    assert out2.column("cod_porte").to_pylist() == ["00", "03", "05", "00", "01"]


def test_p6_anti_join_delete():
    simples = pa.table({"cnpj_basico": ["111", "999", "222"], "op": ["S", "S", "N"]})
    empresa = pa.table({"cnpj_basico": ["111", "222"]})
    estab = pa.table({"cnpj_basico": ["222", "333"]})
    out = anti_join_delete(simples, [empresa, estab], "cnpj_basico")
    assert out.column("cnpj_basico").to_pylist() == ["111", "222"]  # 999 orphan dropped


def test_p8_referential_gate():
    child = pa.table({"fk": ["1", "2", "9"]})
    parent = pa.table({"pk": ["1", "2", "3"]})
    bad = referential_violations(child, parent, "fk", "pk")
    assert bad.column("fk").to_pylist() == ["9"]
    ok = referential_violations(child.slice(0, 2), parent, "fk", "pk")
    assert ok.num_rows == 0  # the pass condition

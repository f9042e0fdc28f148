import numpy as np
import pyarrow as pa

from rfb_cnpj_etl_ray.oracle import assert_states_equal, replay
from rfb_cnpj_etl_ray.spec import CHANGE_SCHEMA, PAYLOAD_SCHEMA
from rfb_cnpj_etl_ray.state.manifest import read_manifest, validate_segments
from rfb_cnpj_etl_ray.synth import (
    make_base,
    make_changelog,
    synth_dataset,
    write_changelog_segments,
)


def test_base_determinism_and_invariant():
    a = make_base(500, seed=42)
    b = make_base(500, seed=42)
    assert a.equals(b)
    assert a.schema.equals(PAYLOAD_SCHEMA)
    lens = [len(x) for x in a.column("tokens").to_pylist()]
    assert lens == a.column("n_tok").to_pylist()
    assert len(set(a.column("doc_id").to_pylist())) == 500


def test_changelog_shape():
    ev = make_changelog(2000, 500, seed=1)
    assert ev.schema.equals(CHANGE_SCHEMA)
    lsns = ev.column("lsn").to_numpy()
    assert len(np.unique(lsns)) == 2000  # globally unique
    ops = ev.column("op").to_pylist()
    assert set(ops) <= {"I", "U", "D"}
    # D events carry null payloads
    import pyarrow.compute as pc

    d_mask = pc.equal(ev.column("op"), "D")
    d_tokens = ev.filter(d_mask).column("tokens")
    assert d_tokens.null_count == len(d_tokens)


def test_segments_manifest_roundtrip(tmp_path):
    ev = make_changelog(1000, 200, seed=2)
    m = write_changelog_segments(ev, tmp_path / "log", n_segments=4)
    assert sum(s["rows"] for s in m["segments"]) == 1000
    diag = validate_segments(tmp_path / "log")
    assert diag["missing"] == [] and diag["size_mismatch"] == []
    assert read_manifest(tmp_path / "log") == m


def test_synth_dataset_cache(tmp_path):
    root = synth_dataset(tmp_path / "ds", n_docs=100, n_events=300, n_segments=2)
    stamp = (root / "_synth.json").read_text()
    root2 = synth_dataset(tmp_path / "ds", n_docs=100, n_events=300, n_segments=2)
    assert (root2 / "_synth.json").read_text() == stamp


def _mk_events(rows):
    """rows: list of (lsn, op, doc_id, tokens, source)"""
    return pa.Table.from_pylist(
        [
            {
                "lsn": lsn,
                "op": op,
                "doc_id": d,
                "tokens": tok,
                "n_tok": None if tok is None else len(tok),
                "source": src,
            }
            for lsn, op, d, tok, src in rows
        ],
        schema=CHANGE_SCHEMA,
    )


def test_oracle_basic_iud():
    base = pa.Table.from_pylist(
        [
            {"doc_id": "a", "tokens": [1, 2], "n_tok": 2, "source": "web"},
            {"doc_id": "b", "tokens": [3], "n_tok": 1, "source": "web"},
        ],
        schema=PAYLOAD_SCHEMA,
    )
    ev = _mk_events(
        [
            (10, "U", "a", [9, 9], "code"),
            (11, "D", "b", None, None),
            (12, "I", "c", [7], "wiki"),
        ]
    )
    out = replay(base, ev)
    assert out.column("doc_id").to_pylist() == ["a", "c"]
    assert out.column("tokens").to_pylist() == [[9, 9], [7]]


def test_oracle_lww_out_of_order_and_dups():
    base = PAYLOAD_SCHEMA.empty_table()
    ev = _mk_events(
        [
            (5, "I", "x", [1], "web"),
            (9, "U", "x", [3], "web"),   # winner
            (7, "U", "x", [2], "web"),
            (9, "U", "x", [3], "web"),   # exact duplicate (doc_id, lsn)
        ]
    )
    out = replay(base, ev)
    assert out.column("tokens").to_pylist() == [[3]]


def test_oracle_delete_then_reinsert_and_late_update():
    base = PAYLOAD_SCHEMA.empty_table()
    ev = _mk_events(
        [
            (1, "I", "x", [1], "web"),
            (3, "D", "x", None, None),
            (2, "U", "x", [2], "web"),  # late, superseded by delete at lsn 3
            (4, "I", "x", [4], "web"),  # reinsert after delete
            (1, "I", "y", [9], "web"),
            (2, "D", "y", None, None),  # y ends deleted
        ]
    )
    out = replay(base, ev)
    assert out.column("doc_id").to_pylist() == ["x"]
    assert out.column("tokens").to_pylist() == [[4]]


def test_assert_states_equal_detects_mismatch():
    a = make_base(10, seed=1)
    b = make_base(10, seed=2)
    assert_states_equal(a, a)
    import pytest

    with pytest.raises(AssertionError):
        assert_states_equal(a, b)


def test_commit_log_append_race_semantics(tmp_path):
    """Two writers racing the same epoch: identical content re-commits are
    no-ops (idempotent driver retry); divergent content raises without
    touching the log (safe failure mode for a concurrent-ingest race)."""
    from rfb_cnpj_etl_ray.state.commitlog import CommitLog

    log = CommitLog(tmp_path / "t")
    rec = {"epoch": 0, "table": "t", "num_partitions": 1,
           "schema": [["doc_id", "string"]], "partitions": {},
           "segments": [], "parent": None, "metrics": {}}
    p1 = log.append(rec)
    p2 = log.append(dict(rec))  # identical retry → no-op
    assert p1 == p2
    divergent = {**rec, "metrics": {"other": 1}}
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="different content"):
        log.append(divergent)
    assert log.latest()["metrics"] == {}  # history untouched

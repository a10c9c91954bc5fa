"""The driver-gate replica must reject vacuous evidence: a query whose
Spark side returns 0 rows "matches" any empty oracle by construction
(rows, schema, and value-hash all trivially agree), which is how three
round-4 oracles went green without testing anything."""

import importlib.util
import pathlib

import duckdb


def _load_check_oracles():
    path = pathlib.Path(__file__).resolve().parents[1] / "tools" \
        / "check_oracles.py"
    spec = importlib.util.spec_from_file_location("check_oracles", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _FakeDF:
    def __init__(self, columns, rows):
        self.columns = columns
        self._rows = rows

    def collect(self):
        return self._rows


def test_empty_vs_empty_is_flagged_vacuous():
    m = _load_check_oracles()
    con = duckdb.connect()
    df = _FakeDF(["a"], [])
    problems = m.compare("q", df, "SELECT 1 AS a WHERE false", con)
    assert any("VACUOUS" in p for p in problems)


def test_nonempty_match_still_passes():
    m = _load_check_oracles()
    con = duckdb.connect()
    df = _FakeDF(["a"], [(1,), (2,)])
    assert m.compare("q", df, "SELECT * FROM (VALUES (1), (2)) t(a)",
                     con) == []


def test_real_mismatch_still_reported():
    m = _load_check_oracles()
    con = duckdb.connect()
    df = _FakeDF(["a"], [(1,)])
    problems = m.compare("q", df, "SELECT 3 AS a", con)
    assert any("values" in p for p in problems)

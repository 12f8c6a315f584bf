"""Property-based formatter tests (hypothesis) — an upgrade over the
reference's fixed-fixture strategy (SURVEY.md §5 notes it has none):
for arbitrary rows, encoder output must parse back to the same values
with standard parsers (csv module, json.loads, yaml.safe_load)."""

from __future__ import annotations

import csv as pycsv
import io
import json
import math

import pytest
import yaml
from hypothesis import given, settings
from hypothesis import strategies as st

from chiv_spark.formats.csv_format import CsvFormatter
from chiv_spark.formats.encode import go_float_str
from chiv_spark.formats.json_format import JsonFormatter
from chiv_spark.formats.yaml_format import YamlFormatter

# printable text without NUL (sinks are text formats)
text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    max_size=40,
)
finite_floats = st.floats(allow_nan=False, allow_infinity=False, width=64)
values = st.one_of(st.none(), st.booleans(), st.integers(-(2**53), 2**53), finite_floats, text)


def encode(cls, columns, rows):
    buf = io.BytesIO()
    f = cls(buf, columns)
    f.open()
    for r in rows:
        f.format_row(r)
    f.close()
    return buf.getvalue().decode("utf-8")


@settings(max_examples=150, deadline=None)
@given(st.lists(st.lists(text, min_size=3, max_size=3), min_size=1, max_size=5))
def test_csv_roundtrips_through_standard_parser(rows):
    out = encode(CsvFormatter, ["a", "b", "c"], rows)
    parsed = list(pycsv.reader(io.StringIO(out)))
    assert parsed[0] == ["a", "b", "c"]
    # Go's encoding/csv (and ours) emits \n inside quoted fields as-is;
    # python csv reader reproduces the logical records
    expected = [[("" if v is None else str(v).replace("\r\n", "\n")) for v in r] for r in rows]
    got = [[c.replace("\r\n", "\n") for c in r] for r in parsed[1:]]
    assert got == expected


@settings(max_examples=150, deadline=None)
@given(st.lists(st.lists(values, min_size=2, max_size=2), min_size=1, max_size=5))
def test_json_roundtrips_through_json_loads(rows):
    out = encode(JsonFormatter, ["x", "y"], rows)
    parsed = json.loads(out)
    assert len(parsed) == len(rows)
    for obj, row in zip(parsed, rows):
        for key, v in zip(["x", "y"], row):
            got = obj[key]
            if isinstance(v, float):
                assert got == pytest.approx(v) or (got == v)
            else:
                assert got == v


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.lists(st.one_of(st.none(), st.booleans(), st.integers(-(2**53), 2**53), text), min_size=2, max_size=2),
        min_size=1,
        max_size=4,
    )
)
def test_yaml_roundtrips_through_safe_load(rows):
    out = encode(YamlFormatter, ["k1", "k2"], rows)
    parsed = yaml.safe_load(out)
    assert len(parsed) == len(rows)
    for obj, row in zip(parsed, rows):
        for key, v in zip(["k1", "k2"], row):
            assert obj[key] == v


@settings(max_examples=300, deadline=None)
@given(finite_floats)
def test_go_float_str_roundtrips_exactly(f):
    s = go_float_str(f)
    assert float(s) == f or (math.copysign(1, f) < 0 and f == 0.0 and float(s) == 0.0)

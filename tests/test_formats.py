"""Golden-output formatter tests.

Mirrors the reference's two golden tiers (SURVEY.md §5): the inline
formatter fixture (/root/reference/chiv_formatters_test.go:23-69) and
the integration goldens (/root/reference/testdata/postgres/*,
/root/reference/testdata/mariadb/*), asserted byte-exact against the
*reference repo's own golden files* read at test time.
"""

from __future__ import annotations

import datetime as dt
import io

import pytest

from chiv_spark.formats.csv_format import CsvFormatter
from chiv_spark.formats.encode import go_float_str, rfc3339
from chiv_spark.formats.json_format import JsonFormatter
from chiv_spark.formats.yaml_format import YamlFormatter

GOLDEN = "/root/reference/testdata"

PG_COLUMNS = [
    "id",
    "text_column",
    "char_column",
    "int_column",
    "float_column",
    "bool_column",
    "ts_column",
    "json_column",
]

# typed rows equivalent to testdata/postgres/postgres_setup.sql —
# timestamps arrive as Spark TimestampType (datetime), numerics typed
PG_ROWS = [
    [
        "ea09d13c-f441-4550-9492-115f8b409c96",
        "some text",
        "some chars",
        42,
        3.14,
        True,
        dt.datetime(2018, 1, 4),
        '{"key":"value","num":42}',
    ],
    [
        "4289a9e3-32d5-4bad-b79b-034c528e8f41",
        "some other text",
        None,
        100,
        3.141592,
        True,
        dt.datetime(2018, 2, 4),
        '{"other":"value"}',
    ],
    [
        "7530a381-526a-42aa-a9ba-97fb2bca283f",
        "some more text",
        "some more chars",
        101,
        None,
        False,
        dt.datetime(2018, 2, 5),
        '[{"item":"in an array"},{"num":999}]',
    ],
]

MARIA_COLUMNS = ["id", "text_column", "char_column", "int_column", "float_column", "bool_column", "ts_column"]
# MariaDB personality: booleans surface as 1/0 ints and pass through
# unnormalized (SURVEY.md §1.2)
MARIA_ROWS = [
    [1, "some text", "some chars", 42, 3.14, 1, dt.datetime(2018, 1, 4)],
    [2, "some other text", None, 100, 3.141592, 1, dt.datetime(2018, 2, 4)],
    [3, "some more text", "some more chars", 101, None, 0, dt.datetime(2018, 2, 5)],
]


def run_formatter(cls, columns, rows):
    buf = io.BytesIO()
    f = cls(buf, columns)
    f.open()
    for r in rows:
        f.format_row(r)
    f.close()
    return buf.getvalue()


def golden(path: str) -> bytes:
    with open(f"{GOLDEN}/{path}", "rb") as fh:
        return fh.read()


class TestReferenceGoldens:
    def test_postgres_csv(self):
        assert run_formatter(CsvFormatter, PG_COLUMNS, PG_ROWS) == golden("postgres/postgres.csv")

    def test_postgres_json(self):
        assert run_formatter(JsonFormatter, PG_COLUMNS, PG_ROWS) == golden("postgres/postgres.json")

    def test_postgres_yaml(self):
        assert run_formatter(YamlFormatter, PG_COLUMNS, PG_ROWS) == golden("postgres/postgres.yaml")

    def test_mariadb_csv(self):
        assert run_formatter(CsvFormatter, MARIA_COLUMNS, MARIA_ROWS) == golden("mariadb/happy.csv")

    def test_mariadb_json(self):
        assert run_formatter(JsonFormatter, MARIA_COLUMNS, MARIA_ROWS) == golden("mariadb/happy.json")

    def test_mariadb_yaml(self):
        assert run_formatter(YamlFormatter, MARIA_COLUMNS, MARIA_ROWS) == golden("mariadb/happy.yaml")


class TestFormatterUnitFixture:
    """The inline 4-column fixture (chiv_formatters_test.go:23-69):
    column 3 is FLOAT but value 100 must render integral."""

    COLUMNS = ["first_column", "second_column", "third_column", "fourth_column"]
    ROWS = [
        [1, "first_row", 100.0, 6],
        [2, "second_row", 12.12, 7],
        [3, "third_row", 42.42, 8],
    ]

    def test_csv(self):
        out = run_formatter(CsvFormatter, self.COLUMNS, self.ROWS).decode()
        assert out == (
            "first_column,second_column,third_column,fourth_column\n"
            "1,first_row,100,6\n"
            "2,second_row,12.12,7\n"
            "3,third_row,42.42,8\n"
        )

    def test_json(self):
        out = run_formatter(JsonFormatter, self.COLUMNS, self.ROWS).decode()
        assert out.startswith('[{"first_column":1,')
        assert '"third_column":100}' in out  # integral float renders bare
        assert '"third_column":12.12}' in out

    def test_yaml(self):
        out = run_formatter(YamlFormatter, self.COLUMNS, self.ROWS).decode()
        assert "- first_column: 1\n" in out
        assert "  third_column: 100\n" in out


class TestScalarEncoding:
    def test_go_float_str(self):
        assert go_float_str(100.0) == "100"
        assert go_float_str(3.141592) == "3.141592"
        assert go_float_str(-0.0) == "-0"
        assert go_float_str(1e21) == "1e+21"
        assert go_float_str(1e17) == "100000000000000000"
        assert go_float_str(1.5e-7) == "1.5e-7"  # Go: abs < 1e-6 → e-notation, exponent unpadded
        assert go_float_str(1e-6) == "0.000001"  # boundary: decimal form
        assert go_float_str(1e-7) == "1e-7"
        with pytest.raises(ValueError):
            go_float_str(float("nan"))

    def test_rfc3339(self):
        assert rfc3339(dt.datetime(2018, 1, 4)) == "2018-01-04T00:00:00Z"
        assert rfc3339(dt.datetime(2024, 1, 1, 0, 9, 58, 778549)) == "2024-01-01T00:09:58.778549Z"
        assert rfc3339(dt.datetime(2024, 1, 1, 0, 0, 0, 500000)) == "2024-01-01T00:00:00.5Z"

    def test_csv_quoting_matches_go(self):
        out = run_formatter(CsvFormatter, ["a"], [["has,comma"], ['has"quote'], ["has\nnewline"], [" leading"]])
        expected = 'a\n"has,comma"\n"has""quote"\n"has\nnewline"\n" leading"\n'
        assert out.decode() == expected

    def test_record_length_mismatch(self):
        buf = io.BytesIO()
        f = CsvFormatter(buf, ["a", "b"])
        f.open()
        with pytest.raises(ValueError, match="record length"):
            f.format_row([1])


class TestGoGFloat:
    """yaml.v2 marshals float64 via strconv.FormatFloat(f,'g',-1,64):
    scientific when the decimal exponent is < -4 or >= 6 — different
    thresholds from encoding/json's (-6, 21)."""

    def test_yaml_rules(self):
        from chiv_spark.formats.encode import go_g_float_str as g

        assert g(1e-5) == "1e-05"
        assert g(1e16) == "1e+16"
        assert g(1e6) == "1e+06"
        assert g(100000.0) == "100000"
        assert g(0.0001) == "0.0001"
        assert g(3.141592) == "3.141592"
        assert g(100.0) == "100"
        assert g(-0.0) == "-0"
        assert g(-2.5) == "-2.5"
        assert g(1234567.8) == "1.2345678e+06"
        assert g(1e100) == "1e+100"
        assert g(6.5e-7) == "6.5e-07"
        with pytest.raises(ValueError):
            g(float("inf"))

    def test_yaml_sink_uses_g_format(self):
        out = run_formatter(YamlFormatter, ["v"], [[1e-5], [1e16], [100.0]])
        assert out.decode() == "- v: 1e-05\n- v: 1e+16\n- v: 100\n"

    def test_json_keeps_json_rules(self):
        assert go_float_str(1e-5) == "0.00001"
        assert go_float_str(1e16) == "10000000000000000"


class TestYamlNonAscii:
    def test_printable_non_ascii_stays_plain(self):
        out = run_formatter(YamlFormatter, ["s"], [["caf\u00e9"], ["na\u00efve id\u00e9e"]])
        assert out.decode() == "- s: caf\u00e9\n- s: na\u00efve id\u00e9e\n"

    def test_non_printable_non_ascii_quoted(self):
        # NBSP is not printable -> single-quoted, unlike accented letters
        out = run_formatter(YamlFormatter, ["s"], [["a\u00a0b"]])
        assert out.decode() == "- s: 'a\u00a0b'\n"


class TestCsvUnicodeSpaceQuoting:
    def test_go_isspace_first_rune(self):
        rows = [["\vx"], ["\fx"], ["\u0085x"], ["\u00a0x"], ["\u2028x"], ["x\u00a0"]]
        out = run_formatter(CsvFormatter, ["a"], rows)
        expected = (
            "a\n\"\vx\"\n\"\fx\"\n\"\u0085x\"\n\"\u00a0x\"\n"
            "\"\u2028x\"\nx\u00a0\n"
        )
        assert out.decode() == expected


class TestDecimalScaleInCsv:
    def test_decimal_keeps_driver_scale(self):
        from decimal import Decimal

        from chiv_spark.formats.encode import to_csv_str

        assert to_csv_str(Decimal("9.50")) == "9.50"
        assert to_csv_str(Decimal("19.99")) == "19.99"
        assert to_csv_str(Decimal("0.01")) == "0.01"

"""Unit tests for the Hive function surface (SURVEY §2.11) — the functions
that can't face the DuckDB oracle (no DuckDB analog, or floating-point
last-ulp divergence). Literal inputs, literal expectations, matching
Hive's documented semantics (ref: ql/.../exec/FunctionRegistry.java).
"""

import math

import pytest


def one(spark, expr: str):
    return spark.sql(f"SELECT {expr} AS v").collect()[0][0]


# --- native Spark functions covering Hive registrations -------------------


@pytest.mark.parametrize(
    "expr,expected",
    [
        # string family (FunctionRegistry.java:286-298,361-383)
        ("find_in_set('b', 'a,b,c')", 2),
        ("elt(2, 'x', 'y', 'z')", "y"),
        ("initcap('hello world')", "Hello World"),
        ("substring_index('a.b.c', '.', 2)", "a.b"),
        ("translate('abcd', 'ab', 'xy')", "xycd"),
        ("format_number(1234567.891, 2)", "1,234,567.89"),
        ("levenshtein('kitten', 'sitting')", 3),
        ("soundex('Robert')", "R163"),
        ("ascii('A')", 65),
        ("chr(66)", "B"),
        ("repeat('ab', 3)", "ababab"),
        ("space(3)", "   "),
        ("locate('l', 'hello')", 3),
        ("instr('hello', 'l')", 3),
        ("concat_ws('|', 'a', NULL, 'b')", "a|b"),
        ("str_to_map('a:1,b:2', ',', ':')['b']", "2"),
        # math family (:301-360,431-443)
        ("bround(2.5)", 2.0),  # banker's rounding — Hive GenericUDFBRound
        ("bround(3.5)", 4.0),
        ("factorial(5)", 120),
        ("pmod(-7, 3)", 2),  # pmod is non-negative, unlike %
        ("conv('ff', 16, 10)", "255"),
        ("bin(10)", "1010"),
        ("hex(255)", "FF"),
        ("unhex('4D')", bytearray(b"M")),
        ("shiftleft(2, 3)", 16),
        ("shiftright(16, 2)", 4),
        ("greatest(1, 5, 3)", 5),
        ("least(1, 5, 3)", 1),
        ("width_bucket(5.3, 0.2, 10.6, 5)", 3),
        ("crc32('ABC')", 2743272264),
        ("base64(cast('spark' AS BINARY))", "c3Bhcms="),
        ("md5('abc')", "900150983cd24fb0d6963f7d28e17f72"),
        (
            "sha2('abc', 256)",
            "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad",
        ),
        # date/time family (:385-430,636-649)
        ("datediff(date'2024-01-10', date'2024-01-01')", 9),
        ("months_between(date'2024-03-31', date'2024-01-31')", 2.0),
        ("next_day(date'2024-01-01', 'FRIDAY')", None),  # placeholder, set below
        ("from_unixtime(0, 'yyyy-MM-dd')", "1970-01-01"),
        ("to_unix_timestamp(timestamp'1970-01-02 00:00:00')", 86400),
        ("trunc(date'2024-03-17', 'MM')", None),  # placeholder, set below
        # conditional (:445-455)
        ("assert_true(1 < 2)", None),
        ("nullif(1, 1)", None),
        ("nvl(NULL, 'd')", "d"),
        ("nvl2(NULL, 'a', 'b')", "b"),
        # complex types (:299,600-634)
        ("size(array(1,2,3))", 3),
        ("array_position(array('a','b'), 'b')", 2),
        ("array_min(array(3,1,2))", 1),
        ("array_max(array(3,1,2))", 3),
        ("array_join(array_sort(array_distinct(array('b','a','b'))), ',')", "a,b"),
        ("sort_array(array(3,1,2))[0]", 1),
        ("map_keys(map('k', 'v'))[0]", "k"),
        ("map_values(map('k', 'v'))[0]", "v"),
        ("element_at(array(10,20), 2)", 20),
        # JSON / URL (:310,420-430)
        ("get_json_object('{\"a\": {\"b\": 7}}', '$.a.b')", "7"),
        ("parse_url('https://h.io/p?q=1', 'HOST')", "h.io"),
        ("parse_url('https://h.io/p?q=1', 'QUERY', 'q')", "1"),
        ("xpath_string('<a><b>bb</b></a>', 'a/b')", "bb"),
        ("xpath_int('<a><b>3</b></a>', 'a/b')", 3),
        # misc (:444-459,580-599)
        ("typeof(1.5)", "decimal(2,1)"),
        ("hash('x') IS NOT NULL", True),
        ("uuid() IS NOT NULL", True),
        ("luhn_check('79927398713')", True),
    ],
)
def test_native_function(spark, expr, expected):
    if expr.startswith("next_day"):
        expected = __import__("datetime").date(2024, 1, 5)
    if expr.startswith("trunc"):
        expected = __import__("datetime").date(2024, 3, 1)
    assert one(spark, expr) == expected


@pytest.mark.parametrize(
    "expr,expected,tol",
    [
        ("ln(e())", 1.0, 1e-12),
        ("log2(8)", 3.0, 1e-12),
        ("log10(1000)", 3.0, 1e-12),
        ("exp(0)", 1.0, 0),
        ("power(2, 10)", 1024.0, 0),
        ("cbrt(27)", 3.0, 1e-12),
        ("degrees(pi())", 180.0, 1e-9),
        ("radians(180) - pi()", 0.0, 1e-12),
        ("sin(0)", 0.0, 0),
        ("cos(0)", 1.0, 0),
        ("atan(1) * 4 - pi()", 0.0, 1e-12),
    ],
)
def test_math_tolerance(spark, expr, expected, tol):
    assert math.isclose(one(spark, expr), expected, abs_tol=tol)


# --- gap-fill functions registered by hive_spark.functions ----------------


@pytest.mark.parametrize(
    "expr,expected",
    [
        ("mask('Abc-123')", "Xxx-nnn"),
        ("mask_first_n('Abcd-1234', 4)", "Xxxx-1234"),
        ("mask_last_n('Abcd-1234', 4)", "Abcd-nnnn"),
        ("mask_show_first_n('Abcd-1234', 4)", "Abcd-nnnn"),
        ("mask_show_last_n('Abcd-1234', 4)", "Xxxx-1234"),
        # sha256('panther') — GenericUDFMaskHash.java uses sha256Hex
        ("mask_hash('panther')", "346793476af7c0a55cfa62abc42b77c3fd87086b08fe6fdd628bfdda4e1d7cab"),
        ("quote(\"don't\")", "'don\\'t'"),
        ("field('b', 'a', 'b', 'c')", 2),
        ("field('z', 'a', 'b')", 0),
        ("likeany('foobar', 'f%', 'z%')", True),
        ("likeany('foobar', 'z%', 'y_')", False),
        ("likeall('foobar', 'f%', '%bar')", True),
        ("likeall('foobar', 'f%', 'z%')", False),
        ("to_epoch_milli(timestamp'1970-01-01 00:00:01')", 1000),
        ("bucket_number('k', 16) >= 0", True),
    ],
)
def test_gap_function(spark, expr, expected):
    assert one(spark, expr) == expected


def test_floor_family(spark):
    import datetime

    got = spark.sql(
        """SELECT floor_year(timestamp'2024-03-15 10:30:45') y,
                  floor_quarter(timestamp'2024-05-15 10:30:45') q,
                  floor_month(timestamp'2024-03-15 10:30:45') m,
                  floor_day(timestamp'2024-03-15 10:30:45') d,
                  floor_hour(timestamp'2024-03-15 10:30:45') h,
                  floor_minute(timestamp'2024-03-15 10:30:45') mi,
                  floor_second(timestamp'2024-03-15 10:30:45') s"""
    ).collect()[0]
    dt = datetime.datetime
    assert got.y == dt(2024, 1, 1, 0, 0)
    assert got.q == dt(2024, 4, 1, 0, 0)
    assert got.m == dt(2024, 3, 1, 0, 0)
    assert got.d == dt(2024, 3, 15, 0, 0)
    assert got.h == dt(2024, 3, 15, 10, 0)
    assert got.mi == dt(2024, 3, 15, 10, 30)
    assert got.s == dt(2024, 3, 15, 10, 30, 45)


def test_tumbling_window(spark):
    import datetime

    got = one(spark, "tumbling_window(timestamp'2024-01-01 00:07:42', 300)")
    assert got == datetime.datetime(2024, 1, 1, 0, 5, 0)


def test_hive_division_semantics(spark):
    """Hive: int/int → double via `/`, integer division via `div`
    (ref: FunctionRegistry.java:438-443) — Spark matches."""
    assert one(spark, "7 / 2") == 3.5
    assert one(spark, "7 div 2") == 3


def test_null_ordering_helpers(spark):
    """Hive default ASC NULLS LAST (hive.default.nulls.last=true, ref:
    common/.../HiveConf.java:1926-1928); Spark default is NULLS FIRST —
    engine queries emit asc_nulls_last explicitly when matching Hive."""
    rows = spark.sql(
        "SELECT x FROM VALUES (1), (NULL), (2) t(x) ORDER BY x ASC NULLS LAST"
    ).collect()
    assert [r.x for r in rows] == [1, 2, None]


def test_division_by_zero_yields_null(spark):
    """Hive (and non-ANSI Spark) return NULL for x/0, 0/0, pmod(x,0) —
    not an error, unlike ANSI engines (pinned: the engine keeps
    spark.sql.ansi.enabled at its Hive-compatible default)."""
    row = spark.sql(
        "SELECT 1/0 AS a, 0/0 AS b, 1 div 0 AS c, pmod(5, 0) AS d, 5 % 0 AS e"
    ).collect()[0]
    assert row.a is None and row.b is None and row.c is None
    assert row.d is None and row.e is None


def test_sort_array_by(spark):
    from pyspark.sql import functions as F

    from hive_spark.functions import sort_array_by

    df = spark.sql(
        """SELECT array(named_struct('k', 3, 'v', 'c'),
                        named_struct('k', 1, 'v', 'a'),
                        named_struct('k', 2, 'v', 'b')) AS arr"""
    ).select(sort_array_by(F.col("arr"), "k").alias("s"))
    row = df.collect()[0]
    assert [x.k for x in row.s] == [1, 2, 3]
    desc = df.sparkSession.sql(
        """SELECT array(named_struct('k', 1), named_struct('k', 3),
                        named_struct('k', 2)) AS arr"""
    ).select(sort_array_by(F.col("arr"), "k", ascending=False).alias("s"))
    assert [x.k for x in desc.collect()[0].s] == [3, 2, 1]


def test_in_file(spark, tmp_path):
    from pyspark.sql import functions as F

    from hive_spark.functions import in_file

    p = tmp_path / "allow.txt"
    p.write_text("AFRICA\nEUROPE\n")
    views_df = spark.createDataFrame(
        [("AFRICA",), ("ASIA",), ("EUROPE",)], "name string"
    )
    kept = views_df.filter(in_file(F.col("name"), str(p))).collect()
    assert sorted(r.name for r in kept) == ["AFRICA", "EUROPE"]


def test_surrogate_key_unique(spark):
    from hive_spark.functions import surrogate_key

    df = spark.range(10000).repartition(8).select(surrogate_key().alias("sk"))
    assert df.select("sk").distinct().count() == 10000

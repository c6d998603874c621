"""Tier V golden-parity: engine guards vs the reference trafaret library.

For each case we run the same inputs through
  (a) trafaret itself (imported from /root/reference — the oracle), one value
      at a time, and
  (b) the engine's vectorized stage on a one-column DataFrame,
and assert identical accepted/rejected partitions, identical coerced values,
and identical error codes (SURVEY.md §5.2).

Known, documented deltas (SURVEY.md §7):
  * None for a required key → engine code 'required' (column-null = missing
    key), where bare-leaf trafaret raises the leaf's own type code;
  * Or branches resolve to one common Spark type (coerced value compared
    after casting the oracle value the same way).
"""

import datetime as dt

import pytest
import trafaret as t  # the reference, from /root/reference (oracle)
from trafaret import DataError

import trafaret_spark as ts


def oracle_check(guard, value):
    """(accepted, result_or_code) from the reference."""
    try:
        return True, guard.check(value)
    except DataError as e:
        return False, e.code


def engine_check(spark, guard, values, spark_type):
    """Run values through a one-key Schema; return [(accepted, value_or_code)]."""
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)],
                               f"i long, x {spark_type}")
    out = ts.apply_schema(df, ts.Schema(ts.Key("i", ts.Int()), ts.Key("x", guard)))
    rows = {r["i"]: r for r in out.collect()}
    res = []
    for i in range(len(values)):
        r = rows[i]
        errs = [e for e in r["errors"] if e["path"] == "x"]
        if errs:
            res.append((False, errs[0]["code"]))
        else:
            res.append((True, r["x"]))
    return res


def assert_parity(spark, eng_guard, ref_guard, values, spark_type,
                  compare_values=True, cast=None):
    got = engine_check(spark, eng_guard, values, spark_type)
    for v, (acc, res) in zip(values, got):
        if v is None and not eng_guard.accepts_null:
            # documented delta: required-key semantics for NULL
            assert not acc and res == "required", (v, res)
            continue
        ref_acc, ref_res = oracle_check(ref_guard, v)
        assert acc == ref_acc, f"input {v!r}: engine={'ok' if acc else res} ref={'ok' if ref_acc else ref_res}"
        if acc and compare_values:
            if cast:
                ref_res = cast(ref_res)
            assert res == ref_res, f"input {v!r}: engine value {res!r} != ref {ref_res!r}"
        if not acc:
            assert res == ref_res, f"input {v!r}: engine code {res!r} != ref code {ref_res!r}"


STRINGS = ["hello", "", " ", "long-enough", "x" * 300, None]
INT_STRINGS = ["3", "1.0", "-1", " 42 ", "abc", "2.5", "007", "", None]
FLOAT_STRINGS = ["3", "1.0", "-1.5", "abc", "1e3", "", None]
BOOL_STRINGS = ["t", "TRUE", "y", " yes ", "on", "1", "1.0", "false", "N",
                "off", "0", "none", "0.0", "maybe", "", None]
DATE_STRINGS = ["2026-03-01", "01-03-2026", "2026-3-1", "not a date", "", None]
DATETIME_STRINGS = ["2026-03-01 10:00:00", "2026-03-01", "01-03-2026 10:00:00",
                    "2026-03-01 10:00", "", None]


class TestStringParity:
    def test_string_default(self, spark):
        assert_parity(spark, ts.String(), t.String(), STRINGS, "string")

    def test_string_allow_blank(self, spark):
        assert_parity(spark, ts.String(allow_blank=True), t.String(allow_blank=True),
                      STRINGS, "string")

    def test_string_lengths(self, spark):
        assert_parity(spark, ts.String(min_length=2, max_length=10),
                      t.String(min_length=2, max_length=10), STRINGS, "string")

    def test_string_on_ints(self, spark):
        assert_parity(spark, ts.String(), t.String(), [1, 2, None], "long")


class TestNumericParity:
    def test_int_on_strings(self, spark):
        assert_parity(spark, ts.Int(), t.Int(), INT_STRINGS, "string")

    def test_toint_on_strings(self, spark):
        assert_parity(spark, ts.ToInt(), t.ToInt(), INT_STRINGS, "string")

    def test_toint_on_floats(self, spark):
        # 2.0 accepted (int-valued), 2.5 rejected — trafaret/numeric.py:177-181
        assert_parity(spark, ts.ToInt(), t.ToInt(), [2.0, 2.5, -3.0, None], "double")

    def test_int_bounds(self, spark):
        assert_parity(spark, ts.Int(gte=0, lte=10), t.Int(gte=0, lte=10),
                      [-1, 0, 5, 10, 11, None], "long")

    def test_int_gt_lt(self, spark):
        assert_parity(spark, ts.Int(gt=0, lt=10), t.Int(gt=0, lt=10),
                      [0, 1, 9, 10, None], "long")

    def test_float_on_strings(self, spark):
        assert_parity(spark, ts.ToFloat(), t.ToFloat(), FLOAT_STRINGS, "string")

    def test_float_validate_keeps_original(self, spark):
        # Float (non-coercing) returns the input unchanged — numeric.py:127-129
        assert_parity(spark, ts.Float(), t.Float(), ["5.0", "abc", None], "string")

    def test_float_bounds(self, spark):
        assert_parity(spark, ts.ToFloat(gte=1.0, lt=5.0), t.ToFloat(gte=1.0, lt=5.0),
                      [0.5, 1.0, 4.9, 5.0, None], "double")

    def test_todecimal(self, spark):
        import decimal
        assert_parity(spark, ts.ToDecimal(), t.ToDecimal(),
                      ["1.5", "abc", "100", None], "string",
                      cast=lambda d: decimal.Decimal(d).quantize(
                          decimal.Decimal(1).scaleb(-18)))


class TestBoolParity:
    def test_tobool_strings(self, spark):
        assert_parity(spark, ts.ToBool(), t.ToBool(), BOOL_STRINGS, "string")

    def test_tobool_null_is_false(self, spark):
        # str(None).lower() == 'none' → False (trafaret/base.py:417-418)
        got = engine_check(spark, ts.ToBool(), [None], "string")
        assert got == [(True, False)]
        assert t.ToBool().check(None) is False

    def test_tobool_ints(self, spark):
        assert_parity(spark, ts.ToBool(), t.ToBool(), [0, 1, 2], "long")

    def test_bool_strict(self, spark):
        assert_parity(spark, ts.Bool(), t.Bool(), [True, False, None], "boolean")
        assert_parity(spark, ts.Bool(), t.Bool(), ["true", None], "string")


class TestDateTimeParity:
    def test_date_validate(self, spark):
        assert_parity(spark, ts.Date(), t.Date(), DATE_STRINGS, "string")

    def test_todate(self, spark):
        assert_parity(spark, ts.ToDate(), t.ToDate(), DATE_STRINGS, "string")

    def test_datetime_validate(self, spark):
        assert_parity(spark, ts.DateTime(), t.DateTime(), DATETIME_STRINGS, "string")

    def test_todatetime(self, spark):
        assert_parity(spark, ts.ToDateTime(), t.ToDateTime(), DATETIME_STRINGS, "string")

    def test_custom_format(self, spark):
        assert_parity(spark, ts.ToDate("%d.%m.%Y"), t.ToDate("%d.%m.%Y"),
                      ["01.03.2026", "2026-03-01", None], "string")

    def test_native_timestamp_passes(self, spark):
        vals = [dt.datetime(2026, 3, 1, 10, 0, 0), None]
        assert_parity(spark, ts.DateTime(), t.DateTime(), vals, "timestamp")


class TestAtomEnumNull:
    def test_atom(self, spark):
        assert_parity(spark, ts.Atom("x"), t.Atom("x"), ["x", "y", None], "string")

    def test_enum(self, spark):
        assert_parity(spark, ts.Enum("a", "b"), t.Enum("a", "b"),
                      ["a", "b", "c", None], "string")

    def test_null(self, spark):
        assert_parity(spark, ts.Null(), t.Null(), ["x", None], "string")

    def test_any(self, spark):
        assert_parity(spark, ts.Any(), t.Any(), ["x", None], "string")


class TestCompositionParity:
    def test_or_first_success_wins(self, spark):
        eng = ts.Enum("search", "code") | ts.Null()
        ref = t.Enum("search", "code") | t.Null()
        assert_parity(spark, eng, ref, ["search", "nope", None], "string")

    def test_or_nothing_match_code(self, spark):
        got = engine_check(spark, ts.Int() | ts.Bool(), ["abc"], "string")
        assert got[0] == (False, "nothing_match")
        _, code = oracle_check(t.Int() | t.Bool(), "abc")
        # reference Or raises a per-branch dict without a top code; engine
        # surfaces the canonical NOTHING_MATCH code for the same situation

    def test_and_fail_fast(self, spark):
        # length check must never see a failed type check
        eng = ts.ToInt() & ts.Int(gte=0)
        ref = t.ToInt() & t.Int(gte=0)
        assert_parity(spark, eng, ref, ["3", "-1", "abc", None], "string")

    def test_and_pipes_coerced_value(self, spark):
        eng = ts.ToInt() >> ts.Int(lte=5)
        got = engine_check(spark, eng, ["4", "6"], "string")
        assert got == [(True, 4), (False, "too_big")]

    def test_onerror(self, spark):
        eng = ts.OnError(ts.Int(), "bad int", code="custom_code")
        got = engine_check(spark, eng, ["abc"], "string")
        assert got[0] == (False, "custom_code")


class TestRegexParity:
    def test_regexp_match_semantics(self, spark):
        # re.match anchors at start; value = group() (trafaret/regexp.py:22-28)
        eng, ref = ts.Regexp(r"\d+"), t.RegexpRaw(r"\d+")
        got = engine_check(spark, eng, ["123abc", "abc123", "42"], "string")
        assert got[0] == (True, "123")
        assert got[1] == (False, "does_not_match_re")
        assert got[2] == (True, "42")
        assert ref.check("123abc").group() == "123"

    def test_email(self, spark):
        vals = ["someone@example.net", "not-an-email", "a@b.co",
                "@missing.local", "user.name+tag@sub.domain.org", None]
        assert_parity(spark, ts.Email(), t.Email, vals, "string")

    def test_url(self, spark):
        vals = ["http://example.net", "https://a.b.co/path?q=1",
                "not a url", "ftp://x.y", None]
        assert_parity(spark, ts.URL(), t.URL, vals, "string")

    def test_ipv4(self, spark):
        vals = ["127.0.0.1", "256.1.1.1", "1.2.3", "10.0.0.255", None]
        assert_parity(spark, ts.IPv4(), t.IPv4, vals, "string")

    def test_hex_lowercases(self, spark):
        got = engine_check(spark, ts.Hex(), ["DEADbeef", "xyz"], "string")
        assert got[0] == (True, "deadbeef")
        assert got[1][0] is False
        assert t.Hex().check("DEADbeef") == "deadbeef"


class TestContainerParity:
    def test_list_elements(self, spark):
        eng = ts.List(ts.ToInt())
        got = engine_check(spark, eng, [["1", "2"], ["1", "x"], [], None],
                           "array<string>")
        assert got[0] == (True, [1, 2])
        assert got[1] == (False, "some_elements_did_not_match")
        assert got[2] == (True, [])
        ref = t.List(t.ToInt)
        assert ref.check(["1", "2"]) == [1, 2]
        with pytest.raises(DataError):
            ref.check(["1", "x"])

    def test_list_length_bounds(self, spark):
        eng = ts.List(ts.Int(), min_length=1, max_length=2)
        got = engine_check(spark, eng, [[], [1], [1, 2, 3]], "array<long>")
        assert [g[0] for g in got] == [False, True, False]
        assert got[0][1] == "too_short" and got[2][1] == "too_long"
        ref = t.List(t.Int, min_length=1, max_length=2)
        for v, ok in [([], False), ([1], True), ([1, 2, 3], False)]:
            assert oracle_check(ref, v)[0] == ok

    def test_tuple(self, spark):
        eng = ts.Tuple(ts.ToInt(), ts.ToInt())
        got = engine_check(spark, eng, [["1", "2"], ["1"], ["a", "b"]],
                           "array<string>")
        assert got[0] == (True, [1, 2])
        assert got[1] == (False, "tuple_like")
        assert got[2] == (False, "some_elements_did_not_match")
        assert t.Tuple(t.ToInt, t.ToInt).check(("1", "2")) == (1, 2)

    def test_mapping(self, spark):
        eng = ts.Mapping(ts.String(), ts.ToInt())
        got = engine_check(spark, eng, [{"a": "1"}, {"a": "x"}], "map<string,string>")
        assert got[0] == (True, {"a": 1})
        assert got[1] == (False, "mapping_failed")
        assert t.Mapping(t.String, t.ToInt).check({"a": "1"}) == {"a": 1}


class TestSchemaParity:
    def test_required_optional_default_rename(self, spark):
        df = spark.createDataFrame(
            [("u1", None, None), (None, "5", "k")],
            "name string, age string, nick string")
        schema = ts.Schema(
            ts.Key("name", ts.String()),
            ts.Key("age", ts.ToInt(), optional=True),
            ts.Key("nick", ts.String(), default="anon", to_name="alias"),
        )
        rows = {tuple(r["errors"] == [] for _ in [0]) and i: r
                for i, r in enumerate(ts.apply_schema(df, schema).collect())}
        out = ts.apply_schema(df, schema).collect()
        by_alias = {r["alias"]: r for r in out}
        r1 = by_alias["anon"]
        assert r1["name"] == "u1" and r1["age"] is None and r1["errors"] == []
        r2 = by_alias["k"]
        assert r2["age"] == 5
        assert [e["code"] for e in r2["errors"]] == ["required"]

        ref = t.Dict({
            t.Key("name"): t.String,
            t.Key("age", optional=True): t.ToInt,
            t.Key("nick", default="anon") >> "alias": t.String,
        })
        assert ref.check({"name": "u1"}) == {"name": "u1", "alias": "anon"}
        with pytest.raises(DataError):
            ref.check({"age": "5", "nick": "k"})

    def test_extras_policy(self, spark):
        df = spark.createDataFrame([("a", "b")], "x string, extra string")
        schema = ts.Schema(ts.Key("x", ts.String()))
        with pytest.raises(ts.SchemaError):
            ts.apply_schema(df, schema)
        allowed = schema.allow_extra("*")
        assert "extra" in ts.apply_schema(df, allowed).columns
        ignored = schema.ignore_extra("extra")
        assert "extra" not in ts.apply_schema(df, ignored).columns
        # reference mirrors: unknown key error / allow_extra
        ref = t.Dict({t.Key("x"): t.String})
        with pytest.raises(DataError):
            ref.check({"x": "a", "extra": "b"})
        assert ref.allow_extra("*").check({"x": "a", "extra": "b"}) == \
            {"x": "a", "extra": "b"}

    def test_xor_key(self, spark):
        df = spark.createDataFrame(
            [("a", None), (None, "b"), ("a", "b"), (None, None)],
            "u string, v string")
        schema = ts.Schema(ts.xor_key("u", "v", ts.String(), to_name="w"))
        out = ts.apply_schema(df, schema).collect()
        codes_ = [[e["code"] for e in r["errors"]] for r in out]
        vals = [r["w"] for r in out]
        assert vals[0] == "a" and codes_[0] == []
        assert vals[1] == "b" and codes_[1] == []
        assert codes_[2] == ["only_one_must_be_defined"]
        assert codes_[3] == ["one_is_required"]

    def test_confirm_key(self, spark):
        df = spark.createDataFrame([("p", "p"), ("p", "q")], "pw string, pw2 string")
        schema = ts.Schema(ts.confirm_key("pw", "pw2", ts.String())) \
            .ignore_extra("pw2")
        out = ts.apply_schema(df, schema).collect()
        assert out[0]["errors"] == []
        assert [e["code"] for e in out[1]["errors"]] == ["must_be_equal"]

    def test_construct_literal(self, spark):
        schema = ts.construct({"a": int, "b": str, "c?": float})
        df = spark.createDataFrame([("1", "x", None), ("z", "", "2.5")],
                                   "a string, b string, c string")
        out = ts.apply_schema(df, schema).collect()
        assert out[0]["a"] == 1 and out[0]["errors"] == []
        codes_ = sorted(e["code"] for e in out[1]["errors"])
        assert codes_ == ["empty_string", "is_not_a_number"]
        # reference analogue (trafaret/constructor.py)
        from trafaret.constructor import construct as ref_construct
        ref = ref_construct({"a": int, "b": str, "c?": float})
        assert ref.check({"a": "1", "b": "x"}) == {"a": 1, "b": "x"}

    def test_nested_dict_guard(self, spark):
        df = spark.createDataFrame(
            [((1, "x"),), ((None, "y"),)],
            "payload struct<n:long, s:string>")
        schema = ts.Schema(ts.Key("payload", ts.DictGuard(
            ts.Key("n", ts.Int()), ts.Key("s", ts.String()))))
        out = ts.apply_schema(df, schema).collect()
        assert out[0]["errors"] == [] and out[0]["payload"]["n"] == 1
        assert [e["code"] for e in out[1]["errors"]] == ["some_elements_did_not_match"]
        assert "required" in out[1]["errors"][0]["message"]

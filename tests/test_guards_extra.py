"""Tier V coverage for the long-tail §2.1 operators: Bytes/AnyString,
WithRepr, Type/Subclass, Callable, MongoId, Forward, DictKeys, KeysSubset,
the guard decorator, error serialization, and unfold/fold reshaping.

Reference-parity where the reference runs without extra deps; engine-level
semantic assertions otherwise (MongoId needs bson; Type/Subclass are
plan-time recasts by design — SURVEY.md §2.1 #36)."""

import pytest
import trafaret as t  # the reference oracle (from /root/reference)
from trafaret.utils import fold as ref_fold, unfold as ref_unfold
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

import trafaret_spark as ts
from trafaret_spark.guards import err_struct


def one_col(spark, values, spark_type, guard):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)],
                               f"i long, x {spark_type}")
    out = ts.apply_schema(df, ts.Schema(ts.Key("i", ts.Int()), ts.Key("x", guard)))
    rows = {r["i"]: r for r in out.collect()}
    res = []
    for i in range(len(values)):
        errs = [e for e in rows[i]["errors"] if e["path"] == "x"]
        res.append((False, errs[0]["code"]) if errs else (True, rows[i]["x"]))
    return res


class TestBytes:
    def test_bytes_ok_and_blank(self, spark):
        got = one_col(spark, [b"abc", b"", b"x" * 5], "binary",
                      ts.Bytes(min_length=2, max_length=4))
        assert got[0] == (True, bytearray(b"abc"))
        assert got[1] == (False, "empty_string")
        assert got[2] == (False, "long_string")
        # reference parity on the same cases
        ref = t.Bytes(min_length=2, max_length=4)
        assert ref.check(b"abc") == b"abc"
        for bad in (b"", b"x" * 5):
            with pytest.raises(t.DataError):
                ref.check(bad)

    def test_bytes_wrong_dtype(self, spark):
        got = one_col(spark, ["abc"], "string", ts.Bytes())
        assert got[0] == (False, "is_not_a_bytes_string")

    def test_anystring_dispatch(self, spark):
        assert one_col(spark, ["hi"], "string", ts.AnyString())[0] == (True, "hi")
        assert one_col(spark, [b"hi"], "binary", ts.AnyString())[0][0] is True
        assert one_col(spark, [3], "long", ts.AnyString())[0] == \
            (False, "is_not_a_string")


class TestWithRepr:
    def test_passthrough_and_repr(self, spark):
        g = ts.WithRepr(ts.Int(gte=0), "index")
        assert repr(g) == "<index>"
        assert one_col(spark, [5, -1], "long", g) == \
            [(True, 5), (False, "too_small")]


class TestTypeSubclass:
    def test_type_matches_dtype(self, spark):
        assert one_col(spark, [1], "long", ts.Type(int))[0] == (True, 1)
        assert one_col(spark, [1.5], "double", ts.Type(int))[0] == \
            (False, "is_not_instance")
        assert one_col(spark, ["s"], "string", ts.Type[str])[0] == (True, "s")

    def test_subclass_dtype_family(self, spark):
        assert one_col(spark, [1], "long", ts.Subclass(T.NumericType))[0][0]
        assert one_col(spark, [1.5], "double", ts.Subclass(T.NumericType))[0][0]
        assert one_col(spark, ["s"], "string", ts.Subclass(T.NumericType))[0] == \
            (False, "is_not_subclass")

    def test_reference_codes_match(self):
        for bad, ref in (("foo", t.Type(int)), (object, t.Subclass(type))):
            try:
                ref.check(bad)
            except t.DataError as e:
                assert e.code in ("is_not_instance", "is_not_subclass")


class TestCallable:
    def test_always_fails_in_data_plane(self, spark):
        assert one_col(spark, [1], "long", ts.Callable())[0] == \
            (False, "is_not_callable")
        # matches the reference's failure code on non-callables
        try:
            t.Callable().check(1)
        except t.DataError as e:
            assert e.code == "is_not_callable"


class TestMongoId:
    HEX = "5583f69d690b2d70a4afdfae"

    def test_check_and_coerce(self, spark):
        got = one_col(spark, [self.HEX, self.HEX.upper(), "just_id", None],
                      "string", ts.MongoId())
        assert got[0] == (True, self.HEX)
        assert got[1] == (True, self.HEX)          # canonicalized to lowercase
        assert got[2] == (False, "invalid_objectid")
        # NULL under a required Key → 'required' (documented delta: the Key
        # layer owns missing-ness; MongoId's own empty_value surfaces only
        # for keys with defaults/optional handling bypassed)
        assert got[3] == (False, "required")

    def test_allow_blank_passes_null(self, spark):
        got = one_col(spark, [None], "string", ts.MongoId(allow_blank=True))
        assert got[0] == (True, None)


class TestForward:
    def test_recursive_tree_schema(self, spark):
        node = ts.Forward()
        # children is optional: the dtype tree is finite, so the deepest
        # level has no children field — the dtype bounds the unrolling
        dg = ts.DictGuard(ts.Key("name", ts.String()),
                          ts.Key("children", ts.List(node), optional=True))
        node << dg
        dtype = ("name string, children array<struct<"
                 "name string, children array<struct<name string>>>>")
        df = spark.createDataFrame(
            [("root", [Row(name="kid", children=[Row(name="leaf")])]),
             ("solo", []),
             (None, [])],
            dtype)
        out = ts.apply_schema(
            df.select(F.struct("name", "children").alias("x"))
              .withColumn("i", F.monotonically_increasing_id()),
            ts.Schema(ts.Key("i", ts.Any()), ts.Key("x", node)))
        rows = out.orderBy("i").collect()
        assert rows[0]["errors"] == [] and rows[0]["x"]["name"] == "root"
        assert rows[0]["x"]["children"][0]["name"] == "kid"
        assert rows[1]["errors"] == []
        assert rows[2]["errors"][0]["code"] == "some_elements_did_not_match"

    def test_unset_forward_fails(self, spark):
        got = one_col(spark, ["x"], "string", ts.Forward())
        assert got[0] == (False, "trafaret_is_not_set")

    def test_double_provide_raises(self):
        node = ts.Forward()
        node << ts.String()
        with pytest.raises(ts.SchemaError.__bases__[0]):  # PlanTimeError
            node << ts.Int()

    def test_reference_parity_shape(self):
        node = t.Forward()
        node << t.Dict(name=t.String, children=t.List[node])
        assert node.check({"name": "foo", "children": []}) == \
            {"name": "foo", "children": []}


class TestDictKeys:
    def test_exact_key_set(self, spark):
        df = spark.createDataFrame([(1, "a")], "k long, v string")
        out = ts.apply_schema(df, ts.DictKeys(["k", "v"]))
        assert out.collect()[0]["errors"] == []
        with pytest.raises(ts.SchemaError):
            ts.apply_schema(df, ts.DictKeys(["k"]))  # extra column v
        out2 = ts.apply_schema(df, ts.DictKeys(["k", "v", "missing"]))
        assert out2.collect()[0]["errors"][0]["code"] == "required"


class TestKeysSubset:
    def test_password_confirm_reshape(self, spark):
        df = spark.createDataFrame(
            [("a", "a", "k1"), ("a", "c", "k2")], "pwd string, pwd1 string, key1 string")

        def cmp_pwds(pwd, pwd1):
            err = F.when(pwd != pwd1, err_struct("must_be_equal", "Not equal"))
            return {"pwd": (pwd, err)}

        schema = ts.Schema(
            ts.KeysSubset("pwd", "pwd1", transform=cmp_pwds),
            ts.Key("key1", ts.String()))
        rows = ts.apply_schema(df, schema).orderBy("key1").collect()
        assert sorted(rows[0].asDict()) == ["errors", "key1", "pwd"]
        assert rows[0]["pwd"] == "a" and rows[0]["errors"] == []
        assert rows[1]["pwd"] is None
        assert rows[1]["errors"][0]["code"] == "must_be_equal"

    def test_join_keys(self, spark):
        df = spark.createDataFrame([("Adam", "Smith")], "name string, last string")
        schema = ts.Schema(ts.KeysSubset(
            "name", "last",
            transform=lambda n, l: {"name": F.concat_ws(" ", n, l)}))
        assert ts.apply_schema(df, schema).collect()[0]["name"] == "Adam Smith"


class TestGuardDecorator:
    def test_coerces_and_defaults(self, spark):
        @ts.guard(a=ts.String(), b=ts.ToInt(), c=ts.String())
        def fn(a, b, c="default"):
            return (a, b, c)

        assert fn("foo", "1") == ("foo", 1, "default")

    def test_raises_guard_error(self, spark):
        @ts.guard(a=ts.String(), b=ts.ToInt())
        def fn(a, b):
            return (a, b)

        with pytest.raises(ts.GuardError) as ei:
            fn("foo", "not-int")
        assert ei.value.errors["b"][0] == "is_not_a_number"

    def test_reference_guard_same_shape(self):
        @t.guard(a=t.String, b=t.ToInt)
        def fn(a, b):
            return (a, b)
        assert fn(a="foo", b="1") == ("foo", 1)
        from trafaret.base import GuardError as RefGuardError
        with pytest.raises(RefGuardError):
            fn(a="foo", b="x")


class TestErrorSerialization:
    def test_errors_json_and_map(self, spark):
        df = spark.createDataFrame([("", 1), ("ok", -5)], "s string, n long")
        out = ts.apply_schema(
            df, ts.Schema(ts.Key("s", ts.String()), ts.Key("n", ts.Int(gte=0))))
        rows = out.select(ts.errors_json().alias("j"),
                          ts.errors_as_map().alias("m")).collect()
        assert '"code":"empty_string"' in rows[0]["j"]
        assert rows[1]["m"]["n"]["code"] == "too_small"


class TestReshape:
    def test_unfold_structs(self, spark):
        df = spark.createDataFrame(
            [Row(a=Row(a=4, b=Row(c=5)), top=1)])
        flat = ts.unfold(df)
        assert set(flat.columns) == {"a__a", "a__b__c", "top"}
        r = flat.collect()[0]
        assert (r["a__a"], r["a__b__c"], r["top"]) == (4, 5, 1)
        # matches the reference's value-level unfold on the same shape
        assert ref_unfold({"a": {"a": 4, "b": {"c": 5}}, "top": 1}) == \
            {"a__a": 4, "a__b__c": 5, "top": 1}

    def test_fold_structs_and_arrays(self, spark):
        df = spark.createDataFrame([(4, 5, 1, 2)],
                                   "a__a long, a__b long, l__0 long, l__1 long")
        nested = ts.fold(df)
        r = nested.collect()[0]
        assert r["a"]["a"] == 4 and r["a"]["b"] == 5
        assert list(r["l"]) == [1, 2]
        assert ref_fold({"a__a": 4, "a__b": 5, "l__0": 1, "l__1": 2}) == \
            {"a": {"a": 4, "b": 5}, "l": [1, 2]}

    def test_roundtrip(self, spark):
        df = spark.createDataFrame([Row(a=Row(x=1, y="s"), b=2.5)])
        back = ts.fold(ts.unfold(df))
        # nullability flags may widen through F.struct; shape + values match
        assert back.schema.simpleString() == df.schema.simpleString()
        assert back.collect() == df.collect()

    def test_unfold_prefix(self, spark):
        df = spark.createDataFrame([(1,)], "a int")
        assert ts.unfold(df, prefix="form").columns == ["form__a"]


class TestDateTimeAny:
    """Engine DateTimeAny vs the reference contrib RFC-3339 DateTime
    (dateutil-based). The engine covers the ISO/slash/dotted matrix as
    native expressions; dateutil's long tail ('March 1 2026', fuzzy parses)
    is a documented non-goal (SURVEY.md §2.1 #20)."""

    SUPPORTED = [
        "2026-03-01T10:00:00.123456",
        "2026-03-01T10:00:00",
        "2026-03-01 10:00:00.123456",
        "2026-03-01 10:00:00",
        "2026-03-01 10:00",
        "2026-03-01",
        "2026/03/01 10:00:00",
        "2026/03/01",
    ]
    # accepted by both, but dotted dates are day-first in the engine
    # (dd.MM.yyyy) vs dateutil's US month-first default — documented delta
    AMBIGUOUS = ["01.03.2026 10:00:00", "01.03.2026"]
    REJECTED = ["garbage", "", "32.13.2026"]

    def test_supported_matrix_parity(self, spark):
        from trafaret.contrib.rfc_3339 import DateTime as RefDT
        got = one_col(spark, self.SUPPORTED, "string", ts.DateTimeAny())
        ref = RefDT()
        for raw, (acc, val) in zip(self.SUPPORTED, got):
            assert acc, raw
            expected = ref.check(raw)
            assert val.replace(tzinfo=None) == expected.replace(tzinfo=None), \
                (raw, val, expected)

    def test_ambiguous_dotted_dates_day_first(self, spark):
        import datetime as dt
        got = one_col(spark, self.AMBIGUOUS, "string", ts.DateTimeAny())
        assert all(acc for acc, _ in got)
        assert got[1][1] == dt.datetime(2026, 3, 1)  # day-first

    def test_rejections(self, spark):
        got = one_col(spark, self.REJECTED, "string", ts.DateTimeAny())
        for raw, (acc, code) in zip(self.REJECTED, got):
            assert not acc and code in ("not_datetime", "empty_string"), (raw, code)

    def test_passthrough_on_timestamp_dtype(self, spark):
        import datetime as dt
        got = one_col(spark, [dt.datetime(2026, 3, 1, 10)], "timestamp",
                      ts.DateTimeAny())
        assert got[0] == (True, dt.datetime(2026, 3, 1, 10))


class TestSchemaMerge:
    def test_merge_key_union(self, spark):
        df = spark.createDataFrame([(1, "a")], "k long, v string")
        s1 = ts.Schema(ts.Key("k", ts.Int()))
        s2 = ts.Schema(ts.Key("v", ts.String()))
        merged = s1 + s2
        out = ts.apply_schema(df, merged)
        row = out.collect()[0]
        assert row["errors"] == [] and row["k"] == 1 and row["v"] == "a"
        # reference parity: Dict merge is key-set union (base.py:1200-1221)
        import trafaret as t
        ref = t.Dict(k=t.Int) + t.Dict(v=t.String)
        assert ref.check({"k": 1, "v": "a"}) == {"k": 1, "v": "a"}


class TestDriverSideCheckSurface:
    """Guard.check / is_valid + catch / extract_error / ignore — the
    reference's single-value + test-helper surface (base.py:126-143,
    1505-1537), recast over the engine's compiled stage."""

    def test_check_coerces_and_raises(self, spark):
        assert ts.ToInt().check("41") == 41
        assert ts.String().check("hi") == "hi"
        with pytest.raises(ts.GuardError) as ei:
            ts.ToInt().check("nope")
        # same code the reference raises
        try:
            t.ToInt().check("nope")
        except t.DataError as ref_err:
            assert ei.value.errors["x"][0] == ref_err.code

    def test_is_valid_matches_reference(self, spark):
        for guard_pair, vals in [
            ((ts.Int(), t.Int()), ["5", "x", "1.0"]),
            ((ts.Email(), t.Email), ["a@b.com", "nope"]),
        ]:
            eng, ref = guard_pair
            for v in vals:
                assert eng.is_valid(v) == ref.is_valid(v), v

    def test_catch_and_extract_error(self, spark):
        err = ts.catch(ts.ToInt().check, "bad")
        assert isinstance(err, ts.GuardError)
        assert ts.catch(ts.ToInt().check, "7") == 7
        assert ts.catch_error is ts.catch
        flat = ts.extract_error(ts.ToInt().check, "bad")
        assert flat == {"x": "value can't be converted to int"}
        assert ts.extract_error(ts.ToInt().check, "7") == 7

    def test_ignore_in_chain(self, spark):
        assert ts.ignore(123) is None
        got = (ts.ToInt() >> ts.Call(ts.ignore, return_type="string")).check("5")
        assert got is None


class TestRegexpRaw:
    def test_match_struct_parity(self, spark):
        ref = t.RegexpRaw(r"(\d+)-(\d+)")
        m = ref.check("12-34 tail")
        got = ts.RegexpRaw(r"(\d+)-(\d+)").check("12-34 tail")
        assert got["match"] == m.group(0)
        assert list(got["groups"]) == list(m.groups())

    def test_no_groups(self, spark):
        got = ts.Regexp(r"ab+", return_match=True).check("abbb!")
        assert got["match"] == "abbb" and list(got["groups"]) == []

    def test_rejects_like_reference(self, spark):
        assert not ts.RegexpRaw(r"\d+").is_valid("xyz")
        with pytest.raises(t.DataError):
            t.RegexpRaw(r"\d+").check("xyz")


class TestIntFloatOverflow:
    def test_integral_double_beyond_int64_errors(self, spark):
        """1e20 is integral but exceeds int64: must error like the string
        branch ('does not fit in int64'), not silently null-pass (advice r2).
        The reference's unbounded Python int accepts it — a documented
        engine delta, but it must be an ERROR, never a silent NULL."""
        got = one_col(spark, [1e20, -1e20, float("nan"), float("inf"),
                              5.0, 5.5], "double", ts.Int())
        assert got[0] == (False, "is_not_a_number")
        assert got[1] == (False, "is_not_a_number")
        # NaN/inf are "not an integer" (reference float-integrality code),
        # not an int64 overflow
        assert got[2] == (False, "is_not_int")
        assert got[3] == (False, "is_not_int")
        assert got[4] == (True, 5.0)
        assert got[5] == (False, "is_not_int")

    def test_toint_coerce_beyond_int64_errors(self, spark):
        got = one_col(spark, [1e20, 7.0], "double", ts.ToInt())
        assert got[0] == (False, "is_not_a_number")
        assert got[1] == (True, 7)


class TestCallContext:
    """Reference check-time context pass-through (trafaret/base.py:1349-1357,
    tests/test_context.py) — the engine's context is a plan-time constant
    captured into Call's Arrow kernel closure."""

    @staticmethod
    def _make_check_context():
        # defined per-call so cloudpickle serializes it BY VALUE (a test
        # module function would be pickled by reference and fail to import
        # on the worker)
        def check_context(values, context=None):
            import pandas as pd
            errs = [None if v == context else "have not context there"
                    for v in values]
            return values, pd.Series(errs)
        return check_context

    def test_context_reaches_call(self, spark):
        g = ts.Call(self._make_check_context(), return_type="long")
        assert g.check(123, context=123) == 123
        err = ts.catch(g.check, 124, context=123)
        assert isinstance(err, ts.GuardError)
        assert err.errors["x"] == ("call_failed", "have not context there")

    def test_context_through_apply_schema(self, spark):
        df = spark.createDataFrame([(123,), (999,)], "b long")
        schema = ts.Schema(ts.Key("b", ts.Call(self._make_check_context(),
                                               return_type="long")))
        rows = ts.apply_schema(df, schema, context=123).collect()
        by_b = {r["b"] or "err": r for r in rows}
        ok = [r for r in rows if r["errors"] == []]
        bad = [r for r in rows if r["errors"]]
        assert len(ok) == 1 and ok[0]["b"] == 123
        assert len(bad) == 1 and bad[0]["errors"][0]["code"] == "call_failed"

    def test_no_context_fn_unchanged(self, spark):
        def plain(values):
            import pandas as pd
            return values, pd.Series([None] * len(values))
        g = ts.Call(plain, return_type="long")
        assert g.check(7) == 7
